"""MARN family (ref ``/root/reference/model/HybridRNN*.py``).

- ``MARN`` (HybridRNN.py:40-168): the live path degenerated to a BiLSTM
  fallback — the true recurrence is commented out in the reference; we
  reproduce the live (BiLSTM) behavior and materialize the dormant LSTHM /
  attention / reduce parameters for parameter-count parity.
- ``MARN_AT`` (HybridRNN_AT.py): bimodal 7-class Multi-Attention Recurrent
  Network with per-step multi-attention fusion into a shared z.
- ``MARN_ATV`` (HybridRNN_ATV.py): trimodal 6-class version
  (dims l/a/v = 100/100/512, dh 128/16/64).

AT/ATV emit Softmax probabilities with rows TIME-major ([T*B, C] — the
reference cats per-step outputs over time, ``HybridRNN_ATV.py:153``); the
registry marks them ``logp_layout='tb'`` so loss/metrics align. Neither is
reachable through the reference's trainer factory as shipped (unpack
mismatches); they are registered here so the variants are usable.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops.cells import declare_linear, lsthm_gates
from ser_tpu.ops.encoder import EncoderLayer
from ser_tpu.ops.layers import Dropout, TorchLinear
from ser_tpu.ops.rnn import TorchBiLSTM


class MARN(nn.Module):
    """Degenerate MARN == BiLSTM fallback (ref ``HybridRNN.py:87-168``)."""

    n_classes: int = 6

    @nn.compact
    def __call__(self, x, qmask=None, umask=None, deterministic: bool = True):
        d_l, d_a = 100, 100
        dh_l, dh_a = 128, 16
        total_h = dh_l + dh_a  # 144
        reduce = 16 + 128

        x_l = jnp.swapaxes(x[:, :, :d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, d_l : d_l + d_a], 0, 1)
        x_l = jnp.swapaxes(x_l, 0, 1)  # ref permutes there and back (no enc)
        x_a = jnp.swapaxes(x_a, 0, 1)

        y_l = TorchBiLSTM(dh_l, name="lstm_l")(x_l)
        y_a = TorchBiLSTM(dh_a, name="lstm_a")(x_a)
        all_hs = jnp.swapaxes(jnp.concatenate([y_l, y_a], axis=2), 0, 1)
        all_hs = all_hs.reshape(-1, all_hs.shape[-1])  # [B*L, 288]

        out = TorchLinear(32, name="nn_out_0")(all_hs)
        out = nn.relu(out)
        out = Dropout(0.0, name="nn_out_drop")(out, deterministic)
        out = TorchLinear(self.n_classes, name="nn_out_3")(out)
        out = nn.softmax(out, axis=-1)

        # Dormant parameters of the commented-out true MARN recurrence
        # (HybridRNN.py:56-80) — materialized for param-count parity.
        declare_linear(self, "lsthm_l_W", d_l, 4 * dh_l)
        declare_linear(self, "lsthm_l_U", dh_l, 4 * dh_l)
        declare_linear(self, "lsthm_l_V", total_h, 4 * dh_l)
        declare_linear(self, "lsthm_a_W", d_a, 4 * dh_a)
        declare_linear(self, "lsthm_a_U", dh_a, 4 * dh_a)
        declare_linear(self, "lsthm_a_V", total_h, 4 * dh_a)
        declare_linear(self, "att_0", total_h, 4 * total_h)
        declare_linear(self, "reduce_dim_nn_l_0", 4 * dh_l, 16)
        declare_linear(self, "reduce_dim_nn_a_0", 4 * dh_a, 128)
        declare_linear(self, "fc_0", reduce, 64)
        declare_linear(self, "fc_3", 64, total_h)
        _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_l")(
            jnp.zeros((1, 1, 100)), deterministic=True)
        _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_a")(
            jnp.zeros((1, 1, 100)), deterministic=True)

        return out


class MARNAttention(nn.Module):
    """Full MARN recurrence shared by AT (bimodal) and ATV (trimodal)."""

    n_classes: int
    trimodal: bool
    num_atts: int = 4

    @nn.compact
    def __call__(self, x, qmask=None, umask=None, deterministic: bool = True):
        K = self.num_atts
        if self.trimodal:
            dims = [(100, 128, 16), (100, 16, 128), (512, 64, 100)]
        else:
            dims = [(100, 128, 16), (100, 16, 128)]
        d_in = [d for d, _, _ in dims]
        dh = [h for _, h, _ in dims]
        red = [r for _, _, r in dims]
        total_h = sum(dh)
        total_red = sum(red)

        # split + encode each modality (encoders used here, d_inner=50)
        offs = [0, d_in[0], d_in[0] + d_in[1]]
        names = ["l", "a", "v"]
        xs = []
        for i in range(len(dims)):
            xi = jnp.swapaxes(x[:, :, offs[i] : offs[i] + d_in[i]], 0, 1)
            xi, _ = EncoderLayer(d_in[i], 50, 8, 40, 40,
                                 name=f"encoder_{names[i]}")(
                xi, deterministic=deterministic)
            xs.append(jnp.swapaxes(xi, 0, 1))  # [L, B, d]

        # LSTHM (3-term) params per modality; fuse U|V state side
        Ws, Ks, bs, xprojs = [], [], [], []
        for i in range(len(dims)):
            W, bW = declare_linear(self, f"lsthm_{names[i]}_W", d_in[i],
                                   4 * dh[i])
            U, bU = declare_linear(self, f"lsthm_{names[i]}_U", dh[i],
                                   4 * dh[i])
            V, bV = declare_linear(self, f"lsthm_{names[i]}_V", total_h,
                                   4 * dh[i])
            Ks.append(jnp.concatenate([U, V], axis=0))
            bs.append(bU + bV)
            xprojs.append(jnp.matmul(xs[i], W) + bW)

        attW, attb = declare_linear(self, "att_0", total_h, K * total_h)
        redWs = []
        for i in range(len(dims)):
            rW, rb = declare_linear(self, f"reduce_dim_nn_{names[i]}_0",
                                    K * dh[i], red[i])
            redWs.append((rW, rb))
        fc1W, fc1b = declare_linear(self, "fc_0", total_red, 64)
        fc2W, fc2b = declare_linear(self, "fc_3", 64, total_h)

        L, B = xs[0].shape[0], xs[0].shape[1]
        training = not deterministic
        if training:
            keys = jax.random.split(self.make_rng("dropout"), L)
        else:
            keys = jnp.zeros((L, 1), jnp.float32)

        from ser_tpu.ops.layers import dropout as fdrop

        def step(carry, inp):
            hs, cs, z = carry
            xps = inp[: len(dims)]
            key = inp[-1]

            new_hs, new_cs = [], []
            for i in range(len(dims)):
                sums = xps[i] + jnp.matmul(
                    jnp.concatenate([hs[i], z], axis=-1), Ks[i]) + bs[i]
                c_i, h_i = lsthm_gates(sums, cs[i])
                new_hs.append(h_i)
                new_cs.append(c_i)

            new_cs_cat = jnp.concatenate(new_cs, axis=1)  # [B, total_h]
            heads = (jnp.matmul(new_cs_cat, attW) + attb).reshape(
                B, K, total_h)
            attn = jax.nn.softmax(heads, axis=-1)
            attended = attn * new_cs_cat[:, None, :]  # [B, K, total_h]

            reduces = []
            lo = 0
            for i in range(len(dims)):
                block = attended[:, :, lo : lo + dh[i]]  # [B, K, dh_i]
                lo += dh[i]
                flat = block.reshape(B, K * dh[i])
                reduces.append(jnp.matmul(flat, redWs[i][0]) + redWs[i][1])

            zin = jnp.concatenate(reduces, axis=1)
            zh = nn.relu(jnp.matmul(zin, fc1W) + fc1b)
            zh = fdrop(zh, 0.3, deterministic, None if deterministic else key)
            z = jnp.matmul(zh, fc2W) + fc2b

            y = jnp.concatenate(new_hs + [z], axis=-1)  # [B, 2*total_h]
            return (tuple(new_hs), tuple(new_cs), z), y

        init = (
            tuple(jnp.zeros((B, h), x.dtype) for h in dh),
            tuple(jnp.zeros((B, h), x.dtype) for h in dh),
            jnp.zeros((B, total_h), x.dtype),
        )
        _, ys = jax.lax.scan(step, init, tuple(xprojs) + (keys,))

        # per-step nn_out hoisted; output rows TIME-major (torch.cat over
        # time, HybridRNN_ATV.py:153)
        out = TorchLinear(32, name="nn_out_0")(ys)
        out = nn.relu(out)
        out = Dropout(0.0, name="nn_out_drop")(out, deterministic)
        out = TorchLinear(self.n_classes, name="nn_out_3")(out)
        out = nn.softmax(out, axis=-1)
        return out.reshape(-1, self.n_classes)


def register_hybrid_rnn(register, ModelSpec, trimodal_inputs, marn1_inputs):
    register(ModelSpec(
        name="MARN",
        build=lambda n_classes, dataset: MARN(n_classes=n_classes),
        make_inputs=marn1_inputs))
    register(ModelSpec(
        name="MARN_AT",
        build=lambda n_classes, dataset: MARNAttention(
            n_classes=7, trimodal=False),
        make_inputs=marn1_inputs,
        logp_layout="tb"))
    register(ModelSpec(
        name="MARN_ATV",
        build=lambda n_classes, dataset: MARNAttention(
            n_classes=6, trimodal=True),
        make_inputs=trimodal_inputs,
        logp_layout="tb"))
