"""Cell gate math vs independent numpy oracles."""

import numpy as np
import jax.numpy as jnp

from ser_tpu.ops.cells import (
    gru_step,
    lsthm_gates,
    lsthm_mf_gates,
    lstm_step,
    torch_lstm_gates,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_lsthm_gates_oracle():
    rng = np.random.default_rng(0)
    B, H = 5, 16
    sums = rng.standard_normal((B, 4 * H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)

    # reference order: f, i, o, c-hat (model/lsthm_onlysp.py:37-43)
    f = sigmoid(sums[:, :H])
    i = sigmoid(sums[:, H : 2 * H])
    o = sigmoid(sums[:, 2 * H : 3 * H])
    ch = np.tanh(sums[:, 3 * H :])
    c_exp = f * c + i * ch
    h_exp = np.tanh(c_exp) * o

    c_t, h_t = lsthm_gates(jnp.asarray(sums), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(c_t), c_exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), h_exp, rtol=1e-5, atol=1e-6)


def test_lsthm_mf_gates_oracle():
    rng = np.random.default_rng(1)
    B, H = 4, 8
    sums = rng.standard_normal((B, 4 * H)).astype(np.float32)
    zg = rng.standard_normal((B, H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)

    f = sigmoid(sums[:, :H])
    i = sigmoid(sums[:, H : 2 * H])
    o = sigmoid(sums[:, 2 * H : 3 * H])
    ch = np.tanh(sums[:, 3 * H :])
    c_exp = f * c + i * ch + sigmoid(zg) * c
    h_exp = np.tanh(c_exp) * o

    c_t, h_t = lsthm_mf_gates(jnp.asarray(sums), jnp.asarray(zg), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(c_t), c_exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), h_exp, rtol=1e-5, atol=1e-6)


def test_torch_lstm_gates_oracle():
    rng = np.random.default_rng(2)
    B, H = 3, 8
    sums = rng.standard_normal((B, 4 * H)).astype(np.float32)
    c = rng.standard_normal((B, H)).astype(np.float32)

    # torch LSTMCell order: i, f, g, o
    i = sigmoid(sums[:, :H])
    f = sigmoid(sums[:, H : 2 * H])
    g = np.tanh(sums[:, 2 * H : 3 * H])
    o = sigmoid(sums[:, 3 * H :])
    c_exp = f * c + i * g
    h_exp = o * np.tanh(c_exp)

    c_t, h_t = torch_lstm_gates(jnp.asarray(sums), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(c_t), c_exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_t), h_exp, rtol=1e-5, atol=1e-6)


def test_gru_step_matches_torch():
    import torch

    torch.manual_seed(0)
    B, D, H = 4, 12, 8
    cell = torch.nn.GRUCell(D, H)
    x = torch.randn(B, D)
    h = torch.randn(B, H)
    with torch.no_grad():
        h_next = cell(x, h).numpy()

    w_ih = cell.weight_ih.detach().numpy()  # [3H, D]
    b_ih = cell.bias_ih.detach().numpy()
    w_hh = cell.weight_hh.detach().numpy()  # [3H, H]
    b_hh = cell.bias_hh.detach().numpy()

    x_proj = x.numpy() @ w_ih.T + b_ih
    out = gru_step(
        jnp.asarray(x_proj),
        jnp.asarray(h.numpy()),
        jnp.asarray(w_hh.T),
        jnp.asarray(b_hh),
    )
    np.testing.assert_allclose(np.asarray(out), h_next, rtol=1e-5, atol=1e-5)


def test_lstm_step_matches_torch():
    import torch

    torch.manual_seed(1)
    B, D, H = 4, 10, 8
    cell = torch.nn.LSTMCell(D, H)
    x = torch.randn(B, D)
    h = torch.randn(B, H)
    c = torch.randn(B, H)
    with torch.no_grad():
        h_next, c_next = cell(x, (h, c))

    x_proj = x.numpy() @ cell.weight_ih.detach().numpy().T + \
        cell.bias_ih.detach().numpy()
    h_t, c_t = lstm_step(
        jnp.asarray(x_proj),
        jnp.asarray(h.numpy()),
        jnp.asarray(c.numpy()),
        jnp.asarray(cell.weight_hh.detach().numpy().T),
        jnp.asarray(cell.bias_hh.detach().numpy()),
    )
    np.testing.assert_allclose(np.asarray(h_t), h_next.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_t), c_next.numpy(), rtol=1e-5, atol=1e-5)
