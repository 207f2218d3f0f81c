"""Multi-party (P=9, MELD-shaped) logit parity vs the torch reference.

Every other parity test runs P=2 IEMOCAP shapes; this closes the one
reference-visible behavior axis without an equivalence proof (VERDICT r4
missing #1). The reference's MELD path emits a 9-party one-hot qmask
(``/root/reference/dataloader.py:82``) and the party machinery is written
for arbitrary P (``model/DialogueRNN.py:138-150``: every expand/select uses
``qmask.size()[1]``). Our models take ``P = qmask.shape[2]`` generically —
these tests pin that the P-generic paths (DialogueRNN's party
select/scatter, MARN1_nsps's ``(1-idx) mod P`` listener wrap, MARN1_sp's
q0-broadcast scatter) agree per utterance at P=9. MARN1_sps is excluded by
reference semantics: its party machinery is two-party by construction
(``lsthm_sps.py:238-259`` buckets speaker 0/1 only and crashes at P=9).

Skipped when /root/reference is not mounted.
"""

import os

import numpy as np
import pytest

import test_logit_parity as tlp

REFERENCE = tlp.REFERENCE

pytestmark = [
    pytest.mark.medium,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REFERENCE, "model")),
        reason="reference checkout not available",
    ),
]


def _make_inputs_p(L=14, B=4, P=9, seed=0, d=1124):
    """MELD-shaped random inputs: 9-party one-hot qmask, variable lengths."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((L, B, d)).astype(np.float32)
    lengths = rng.integers(L // 2, L + 1, size=B)
    lengths[0] = L
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    sp = rng.integers(0, P, size=(L, B))
    qmask = np.zeros((L, B, P), dtype=np.float32)
    qmask[np.arange(L)[:, None], np.arange(B)[None, :], sp] = 1.0
    qmask *= umask.T[:, :, None]
    return x, qmask, umask


def test_dialogue_rnn_p9_parity():
    tlp._shim_reference()
    import torch

    from models.DialogueRNN import BiModel as TBiModel

    torch.manual_seed(40)
    ref = TBiModel(712, 500, 500, 300, 300, n_classes=7, listener_state=True,
                   context_attention="general", dropout_rec=0.1, dropout=0.1)
    ref.eval()
    params = tlp._convert("DialogueRNN", ref.state_dict())

    x, qmask, umask = _make_inputs_p(seed=40)
    U = x[:, :, :712]
    with torch.no_grad():
        ref_logp, _, _, _ = ref(
            torch.tensor(U), torch.tensor(qmask), torch.tensor(umask),
            att2=True)
    ref_flat = tlp._t(ref_logp).transpose(1, 0, 2).reshape(-1, 7)

    import jax.numpy as jnp

    from ser_tpu.models.dialogue_rnn import BiModel

    model = BiModel(D_m=712, D_g=500, D_p=500, D_e=300, D_h=300, n_classes=7,
                    listener_state=True, context_attention="general",
                    dropout_rec=0.1, dropout=0.1)

    def extract(out):
        return jnp.swapaxes(out[0], 0, 1).reshape(-1, 7)

    mask_rows = umask.reshape(-1) > 0
    tlp._check(model, params,
               (jnp.asarray(U), jnp.asarray(qmask), jnp.asarray(umask)),
               ref_flat, extract=extract, valid_mask=mask_rows)


def test_nsps_p9_parity():
    """The reference's MELD-capable recurrence at P=9, including the
    negative-index listener wrap: torch's ``j[1 - idx]``
    (``model/lsthm_nsps.py:232-238``) selects party ``(1 - idx) mod P`` for
    speakers >= 2, which our one-hot select must reproduce explicitly.

    (MARN1_sps is deliberately NOT covered here: its per-party machinery is
    two-party by reference construction — ``lsthm_sps.py:238-259`` buckets
    rows into speaker 0/1 only and CRASHES on a 9-party qmask, verified
    in-place. Two parties is that model's contract; see PARITY.md.)"""
    tlp._shim_reference()
    import torch

    from models.lsthm_nsps import MARN1_nsps

    torch.manual_seed(41)
    ref = MARN1_nsps(7, "MELD")
    ref.eval()
    params = tlp._convert("MARN1_nsps", ref.state_dict())

    x, qmask, umask = _make_inputs_p(seed=41)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x), torch.tensor(qmask), torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1NSPS

    mask_rows = umask.reshape(-1) > 0
    tlp._check(MARN1NSPS(n_classes=7, use_text_encoder=True), params,
               (jnp.asarray(x), jnp.asarray(qmask), jnp.asarray(umask)),
               tlp._t(ref_out), valid_mask=mask_rows)


def test_sp_p9_parity():
    """q0-broadcast scatter family at P=9."""
    tlp._shim_reference()
    import torch

    from models.lsthm_sp import MARN1_sp

    torch.manual_seed(42)
    ref = MARN1_sp(7)
    ref.eval()
    params = tlp._convert("MARN1_sp", ref.state_dict())

    x, qmask, umask = _make_inputs_p(seed=42)
    with torch.no_grad():
        ref_out, _, _ = ref(
            torch.tensor(x[:, :, :200]), torch.tensor(qmask),
            torch.tensor(umask))

    import jax.numpy as jnp

    from ser_tpu.models.marn_variants import MARN1SP

    mask_rows = umask.reshape(-1) > 0
    tlp._check(MARN1SP(n_classes=7), params,
               (jnp.asarray(x[:, :, :200]), jnp.asarray(qmask),
                jnp.asarray(umask)),
               tlp._t(ref_out), valid_mask=mask_rows)
