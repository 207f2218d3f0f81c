"""MARN1_newz — unidirectional MARN-style multi-attention z update.

Rebuild of ``/root/reference/model/lsthm_newz.py:9-146`` (which imports its
LSTHM1 + general_attention from ``model/lsthm_h.py``): 4-term LSTHM1 per
modality with a 512-d speaker memory updated by a plain Linear S, and a
fusion state z updated per step by a softmax-EMA blend (learnable 2-way
softmax weights w) of a MARN multi-attention reduce over the concatenated
cell states. Emits RAW logits (no log_softmax — ``lsthm_newz.py:113``),
rows time-batch flattened batch-major.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops import init as tinit
from ser_tpu.ops.cells import declare_linear, lsthm_gates
from ser_tpu.ops.encoder import EncoderLayer
from ser_tpu.ops.layers import Dropout, TorchLinear, dropout
from ser_tpu.ops.masking import select_parties


class MARN1NewZ(nn.Module):
    n_classes: int = 6
    d_l: int = 100
    d_a: int = 100
    dh: int = 128
    num_atts: int = 4
    # causal_encoder=True restricts the sequence encoders to a causal
    # (lower-triangular) attention mask. NOT a reference mode — it is the
    # exact batch-mode specification of the streaming serving path
    # (ser_tpu/streaming.py): utterance t's encoder output attends over
    # utterances 0..t only, so appending an utterance never changes history.
    # Parameters are identical either way; default (False) is the parity path.
    causal_encoder: bool = False

    @nn.compact
    def __call__(self, x, qmask, umask=None, deterministic: bool = True):
        H = self.dh
        D = 2 * H  # total_h_dim = 256
        reduce_dim = 16 + 128  # l_reduce + a_reduce = 144
        speaker = 4 * H  # 512
        K = self.num_atts

        x_l = jnp.swapaxes(x[:, :, : self.d_l], 0, 1)
        x_a = jnp.swapaxes(x[:, :, self.d_l : self.d_l + self.d_a], 0, 1)
        causal_mask = None
        if self.causal_encoder:
            Lq = x_l.shape[1]
            causal_mask = jnp.tril(jnp.ones((1, Lq, Lq), jnp.float32))
        x_l, _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_l")(
            x_l, slf_attn_mask=causal_mask, deterministic=deterministic)
        x_a, _ = EncoderLayer(100, 50, 8, 40, 40, name="encoder_a")(
            x_a, slf_attn_mask=causal_mask, deterministic=deterministic)
        # encoder_v declared-unused (lsthm_newz.py:52) — parity.
        _ = EncoderLayer(512, 50, 8, 40, 40, name="encoder_v")(
            jnp.zeros((1, 1, 512)), deterministic=True)
        x_l = jnp.swapaxes(x_l, 0, 1)
        x_a = jnp.swapaxes(x_a, 0, 1)

        L, B, P = x_l.shape[0], x_l.shape[1], qmask.shape[2]

        # LSTHM1 (4-term, from lsthm_h): V hybrid=256, S speaker=512
        Wl, bWl = declare_linear(self, "lsthm_l_W", self.d_l, 4 * H)
        Ul, bUl = declare_linear(self, "lsthm_l_U", H, 4 * H)
        Vl, bVl = declare_linear(self, "lsthm_l_V", D, 4 * H)
        Sl, bSl = declare_linear(self, "lsthm_l_S", speaker, 4 * H)
        Wa, bWa = declare_linear(self, "lsthm_a_W", self.d_a, 4 * H)
        Ua, bUa = declare_linear(self, "lsthm_a_U", H, 4 * H)
        Va, bVa = declare_linear(self, "lsthm_a_V", D, 4 * H)
        Sa, bSa = declare_linear(self, "lsthm_a_S", speaker, 4 * H)
        # speaker memory Linear S: 512 -> 512 (lsthm_newz.py:54)
        Sq, bSq = declare_linear(self, "S", speaker, 4 * H)

        # multi-attention ops
        attW, attb = declare_linear(self, "att_0", D, K * D)
        attlW, attlb = declare_linear(self, "att_l_0", H, K * H)
        attaW, attab = declare_linear(self, "att_a_0", H, K * H)
        cmW, cmb = declare_linear(self, "att_cross_modal_0", D, reduce_dim)
        fzW, fzb = declare_linear(self, "fc_z_0", K * (D + reduce_dim), D)

        w = self.param("w", tinit.ones, (2,))
        ws = jax.nn.softmax(w)

        # declared-unused for parity: fc head (lsthm_newz.py:42) and
        # g_attention.trans (lsthm_newz.py:45, general_attention from lsthm_h)
        declare_linear(self, "fc_0", reduce_dim, 64)
        declare_linear(self, "fc_3", 64, D)
        declare_linear(self, "g_attention_trans_0", reduce_dim, 64)
        declare_linear(self, "g_attention_trans_3", 64, D)

        xl_proj = jnp.matmul(x_l, Wl) + bWl
        xa_proj = jnp.matmul(x_a, Wa) + bWa

        training = not deterministic
        if training:
            keys = jax.random.split(self.make_rng("dropout"), (L, 3))
        else:
            keys = jnp.zeros((L, 3), jnp.float32)

        def multi_att(proj, cs, kdim):
            """F.softmax(cat(chunk(Linear(cs), K, dim=1), dim=0)) * cs.repeat
            -> head-major [K, B, kdim] (ref lsthm_newz.py:89-95)."""
            heads = proj.reshape(proj.shape[0], K, kdim)  # [B, K, d]
            attn = jax.nn.softmax(heads, axis=-1)
            return attn * cs[:, None, :]  # [B, K, d]

        from ser_tpu import config

        stacked = config.stack_modalities("newz")
        if stacked:
            # modality-stacked step (config.STACK_MODALITIES): the l/a
            # LSTHM1 chains read only carried state + this step's q_affine,
            # so they ride a leading modality axis — their 3 state-side
            # matmuls each fuse into ONE [2,B,896]x[2,896,512] einsum, and
            # the per-modality attention projections into one batched
            # einsum. Same math (tests/test_stack_modalities.py); the
            # attention dropout draws once over the stacked block.
            K_la = jnp.stack([jnp.concatenate([Ul, Vl, Sl], axis=0),
                              jnp.concatenate([Ua, Va, Sa], axis=0)])
            b_la = jnp.stack([bUl + bVl + bSl,
                              bUa + bVa + bSa])[:, None, :]
            attlaW = jnp.stack([attlW, attaW])   # [2, H, K*H]
            attlab = jnp.stack([attlb, attab])[:, None, :]
            xp = jnp.stack([xl_proj, xa_proj], axis=1)  # [L, 2, B, 4H]

        def step(carry, xs):
            h_l, c_l, h_a, c_a, z, q = carry
            xlp, xap, qm, key = xs
            ks = None if deterministic else key

            q0_sel = select_parties(q, qm)
            q_affine = jnp.matmul(q0_sel, Sq) + bSq
            m = qm[:, :, None]
            q = q0_sel[:, None, :] * (1.0 - m) + q_affine[:, None, :] * m

            sums_l = xlp + jnp.matmul(h_l, Ul) + bUl + \
                jnp.matmul(z, Vl) + bVl + jnp.matmul(q_affine, Sl) + bSl
            c_l_n, h_l_n = lsthm_gates(sums_l, c_l)
            sums_a = xap + jnp.matmul(h_a, Ua) + bUa + \
                jnp.matmul(z, Va) + bVa + jnp.matmul(q_affine, Sa) + bSa
            c_a_n, h_a_n = lsthm_gates(sums_a, c_a)

            new_cs = jnp.concatenate([c_l_n, c_a_n], axis=1)  # [B, 256]
            attended = multi_att(jnp.matmul(new_cs, attW) + attb, new_cs, D)
            al = jnp.matmul(c_l_n, attlW) + attlb
            al = nn.relu(al)
            al = dropout(al, 0.3, deterministic,
                         None if deterministic else ks[0])
            attended_l = multi_att(al, c_l_n, H)
            aa = jnp.matmul(c_a_n, attaW) + attab
            aa = nn.relu(aa)
            aa = dropout(aa, 0.3, deterministic,
                         None if deterministic else ks[1])
            attended_a = multi_att(aa, c_a_n, H)

            cm_in = jnp.concatenate([attended_l, attended_a], axis=-1)
            cross_modal = jnp.matmul(cm_in, cmW) + cmb  # [B, K, 144]
            cross_modal = nn.relu(cross_modal)
            cross_modal = dropout(cross_modal, 0.3, deterministic,
                                  None if deterministic else ks[2])
            z_temp = jnp.concatenate([cross_modal, attended], axis=-1)
            z_flat = z_temp.reshape(z_temp.shape[0], K * (D + reduce_dim))
            z_new = nn.relu(jnp.matmul(z_flat, fzW) + fzb)
            z = ws[0] * z_new + ws[1] * z

            y = jnp.concatenate([h_l_n, h_a_n, z], axis=-1)
            return (h_l_n, c_l_n, h_a_n, c_a_n, z, q), y

        def step_stacked(carry, xs):
            h_la, c_la, z, q = carry  # h_la/c_la: [2, B, H]
            xpt, qm, key = xs
            ks = None if deterministic else key

            q0_sel = select_parties(q, qm)
            q_affine = jnp.matmul(q0_sel, Sq) + bSq
            m = qm[:, :, None]
            q = q0_sel[:, None, :] * (1.0 - m) + q_affine[:, None, :] * m

            shared = jnp.concatenate([z, q_affine], axis=-1)  # [B, D+4H]
            state = jnp.concatenate(
                [h_la, jnp.broadcast_to(shared[None], (2,) + shared.shape)],
                axis=-1)
            sums = xpt + jnp.einsum("mbi,mio->mbo", state, K_la) + b_la
            c_la_n, h_la_n = lsthm_gates(sums, c_la)

            new_cs = jnp.concatenate([c_la_n[0], c_la_n[1]], axis=1)
            attended = multi_att(jnp.matmul(new_cs, attW) + attb, new_cs, D)
            ala = jnp.einsum("mbh,mhk->mbk", c_la_n, attlaW) + attlab
            ala = nn.relu(ala)
            ala = dropout(ala, 0.3, deterministic,
                          None if deterministic else ks[0])
            heads = ala.reshape(2, ala.shape[1], K, H)
            att_la = jax.nn.softmax(heads, axis=-1) * c_la_n[:, :, None, :]

            cm_in = jnp.concatenate([att_la[0], att_la[1]], axis=-1)
            cross_modal = jnp.matmul(cm_in, cmW) + cmb  # [B, K, 144]
            cross_modal = nn.relu(cross_modal)
            cross_modal = dropout(cross_modal, 0.3, deterministic,
                                  None if deterministic else ks[2])
            z_temp = jnp.concatenate([cross_modal, attended], axis=-1)
            z_flat = z_temp.reshape(z_temp.shape[0], K * (D + reduce_dim))
            z_new = nn.relu(jnp.matmul(z_flat, fzW) + fzb)
            z = ws[0] * z_new + ws[1] * z

            y = jnp.concatenate([h_la_n[0], h_la_n[1], z], axis=-1)
            return (h_la_n, c_la_n, z, q), y

        z0h = jnp.zeros((B, H), x_l.dtype)
        if stacked:
            init = (jnp.zeros((2, B, H), x_l.dtype),
                    jnp.zeros((2, B, H), x_l.dtype),
                    jnp.zeros((B, D), x_l.dtype),
                    jnp.zeros((B, P, speaker), x_l.dtype))
            _, ys = jax.lax.scan(step_stacked, init, (xp, qmask, keys))
        else:
            init = (z0h, z0h, z0h, z0h, jnp.zeros((B, D), x_l.dtype),
                    jnp.zeros((B, P, speaker), x_l.dtype))
            _, ys = jax.lax.scan(step, init, (xl_proj, xa_proj, qmask, keys))

        # per-step nn_out hoisted out of the scan (identical math);
        # RAW logits, no log_softmax (lsthm_newz.py:113).
        out = TorchLinear(32, name="nn_out_0")(ys)
        out = nn.relu(out)
        out = Dropout(0.5, name="nn_out_drop")(out, deterministic)
        out = TorchLinear(self.n_classes, name="nn_out_3")(out)
        out = jnp.swapaxes(out, 0, 1).reshape(-1, self.n_classes)
        return out, x_a, x_l
