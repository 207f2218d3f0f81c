"""Plug-in attention ops library.

The reference vendors 38 plug-and-play attention modules in its
``attention:`` directory (the public External-Attention-pytorch collection;
SURVEY §C19). Exactly one — ExternalAttention — is ever imported by model
code (``model/lsthm_sps.py:8``) and even it is never instantiated, so this
library is an optional ops collection, not core surface. We provide
TPU-native implementations of the most-used members, matching the vendored
math (including their std=0.001 normal linear init); the rest of the
catalog can be added on demand.

Sequence ops take [B, N, D]; channel ops take NCHW [B, C, H, W] like the
torch originals.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _normal001(key, shape, dtype=jnp.float32):
    return 0.001 * jax.random.normal(key, shape, dtype)


def _zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


class ExternalAttention(nn.Module):
    """Two-linear external memory attention
    (ref ``attention:/ExternalAttention.py:8-38``)."""

    d_model: int
    S: int = 64

    @nn.compact
    def __call__(self, queries):
        mk = self.param("mk", _normal001, (self.d_model, self.S))
        mv = self.param("mv", _normal001, (self.S, self.d_model))
        attn = queries @ mk  # [B, N, S]
        attn = jax.nn.softmax(attn, axis=1)  # over N (dim=1, as vendored)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        return attn @ mv


class ScaledDotProductAttention(nn.Module):
    """Projected multi-head attention (ref ``attention:/SelfAttention.py``)."""

    d_model: int
    d_k: int
    d_v: int
    h: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, keys, values, attention_mask=None,
                 deterministic: bool = True):
        B, nq = queries.shape[:2]
        nk = keys.shape[1]

        def lin(name, din, dout):
            k = self.param(f"{name}_kernel", _normal001, (din, dout))
            b = self.param(f"{name}_bias", _zeros, (dout,))
            return k, b

        qk, qb = lin("fc_q", self.d_model, self.h * self.d_k)
        kk, kb = lin("fc_k", self.d_model, self.h * self.d_k)
        vk, vb = lin("fc_v", self.d_model, self.h * self.d_v)
        ok, ob = lin("fc_o", self.h * self.d_v, self.d_model)

        q = (queries @ qk + qb).reshape(B, nq, self.h, self.d_k)
        k = (keys @ kk + kb).reshape(B, nk, self.h, self.d_k)
        v = (values @ vk + vb).reshape(B, nk, self.h, self.d_v)

        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (self.d_k ** 0.5)
        if attention_mask is not None:
            att = jnp.where(attention_mask, -jnp.inf, att)
        att = jax.nn.softmax(att, axis=-1)
        if not deterministic and self.dropout > 0:
            from ser_tpu.ops.layers import dropout as fdrop

            att = fdrop(att, self.dropout, False, self.make_rng("dropout"))
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(
            B, nq, self.h * self.d_v)
        return out @ ok + ob


class SimplifiedScaledDotProductAttention(nn.Module):
    """Projection-free multi-head attention
    (ref ``attention:/SimplifiedSelfAttention.py``)."""

    h: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, keys, values, attention_mask=None,
                 deterministic: bool = True):
        B, nq, d_model = queries.shape
        nk = keys.shape[1]
        d_k = d_model // self.h
        d_v = d_model // self.h

        q = queries.reshape(B, nq, self.h, d_k)
        k = keys.reshape(B, nk, self.h, d_k)
        v = values.reshape(B, nk, self.h, d_v)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d_k ** 0.5)
        if attention_mask is not None:
            att = jnp.where(attention_mask, -jnp.inf, att)
        att = jax.nn.softmax(att, axis=-1)
        if not deterministic and self.dropout > 0:
            from ser_tpu.ops.layers import dropout as fdrop

            att = fdrop(att, self.dropout, False, self.make_rng("dropout"))
        return jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, nq, d_model)


class SEAttention(nn.Module):
    """Squeeze-and-excitation channel gate (ref ``attention:/SEAttention.py``).
    NCHW in/out."""

    channel: int = 512
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        w1 = self.param("fc1", _normal001, (self.channel,
                                            self.channel // self.reduction))
        w2 = self.param("fc2", _normal001, (self.channel // self.reduction,
                                            self.channel))
        y = jnp.mean(x, axis=(2, 3))  # [B, C]
        y = jax.nn.relu(y @ w1)
        y = jax.nn.sigmoid(y @ w2)
        return x * y[:, :, None, None]


class ECAAttention(nn.Module):
    """Efficient channel attention via 1-D conv over channel descriptors
    (ref ``attention:/ECAAttention.py``). NCHW in/out."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # torch Conv1d(1, 1, k) default init: U(+-1/sqrt(k))
        bound = 1.0 / (k ** 0.5)
        w = self.param(
            "conv_kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (k,))
        b = self.param(
            "conv_bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (1,))
        y = jnp.mean(x, axis=(2, 3))  # [B, C]
        pad = (k - 1) // 2
        yp = jnp.pad(y, ((0, 0), (pad, pad)))
        conv = sum(w[i] * yp[:, i : i + y.shape[1]] for i in range(k)) + b
        gate = jax.nn.sigmoid(conv)
        return x * gate[:, :, None, None]


class AFTFull(nn.Module):
    """Attention-free transformer, full positional variant
    (ref ``attention:/AFT.py``). Sequence op on [B, n, D]."""

    d_model: int
    n: int = 49
    simple: bool = False

    @nn.compact
    def __call__(self, x):
        B, n, D = x.shape

        def lin(name):
            k = self.param(f"{name}_kernel", _normal001, (D, D))
            b = self.param(f"{name}_bias", _zeros, (D,))
            return k, b

        qk, qb = lin("fc_q")
        kk, kb = lin("fc_k")
        vk, vb = lin("fc_v")
        if self.simple:
            pos = jnp.zeros((self.n, self.n))
        else:
            pos = self.param(
                "position_biases",
                lambda key, shape: jnp.ones(shape), (self.n, self.n))

        q = x @ qk + qb
        k = x @ kk + kb
        v = x @ vk + vb
        # w[t, j] = exp(k[b, j, :] + pos[t, j]); out[b, t] = sum_j w*v / sum_j w
        ek = jnp.exp(k[:, None, :, :] + pos[None, :, :, None])  # [B, n, n, D]
        num = jnp.sum(ek * v[:, None, :, :], axis=2)
        den = jnp.sum(ek, axis=2)
        return jax.nn.sigmoid(q) * (num / den)


class MobileViTv2Attention(nn.Module):
    """Separable self-attention (ref ``attention:/MobileViTv2Attention.py``)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        D = self.d_model

        def lin(name, dout):
            k = self.param(f"{name}_kernel", _normal001, (D, dout))
            b = self.param(f"{name}_bias", _zeros, (dout,))
            return k, b

        ik, ib = lin("fc_i", 1)
        kk, kb = lin("fc_k", D)
        vk, vb = lin("fc_v", D)
        ok, ob = lin("fc_o", D)

        i = x @ ik + ib  # [B, n, 1]
        weight_i = jax.nn.softmax(i, axis=1)
        context = jnp.sum(weight_i * (x @ kk + kb), axis=1, keepdims=True)
        v = (x @ vk + vb) * context
        return v @ ok + ob


class UFOAttention(nn.Module):
    """UFO (softmax-free) attention (ref ``attention:/UFOAttention.py``)."""

    d_model: int
    d_k: int
    d_v: int
    h: int

    @nn.compact
    def __call__(self, queries, keys, values):
        B, nq = queries.shape[:2]
        nk = keys.shape[1]

        def lin(name, din, dout):
            k = self.param(f"{name}_kernel", _normal001, (din, dout))
            b = self.param(f"{name}_bias", _zeros, (dout,))
            return k, b

        qk, qb = lin("fc_q", self.d_model, self.h * self.d_k)
        kk, kb = lin("fc_k", self.d_model, self.h * self.d_k)
        vk, vb = lin("fc_v", self.d_model, self.h * self.d_v)
        ok, ob = lin("fc_o", self.h * self.d_v, self.d_model)
        gamma = self.param(
            "gamma", lambda key, shape: jax.random.normal(key, shape),
            (1, self.h, 1, 1))

        def xnorm(t):
            return t * gamma / jnp.linalg.norm(t, axis=-1, keepdims=True)

        q = (queries @ qk + qb).reshape(B, nq, self.h, self.d_k)
        q = jnp.swapaxes(q, 1, 2)  # [B, h, nq, d_k]
        k = (keys @ kk + kb).reshape(B, nk, self.h, self.d_k)
        v = (values @ vk + vb).reshape(B, nk, self.h, self.d_v)
        kv = jnp.einsum("bkhd,bkhe->bhde", k, v)  # [B, h, d_k, d_v]
        out = jnp.matmul(xnorm(q), xnorm(kv))  # [B, h, nq, d_v]
        out = jnp.swapaxes(out, 1, 2).reshape(B, nq, self.h * self.d_v)
        return out @ ok + ob


class DoubleAttention(nn.Module):
    """A^2 double attention (ref ``attention:/A2Atttention.py``). NCHW."""

    in_channels: int
    c_m: int
    c_n: int
    reconstruct: bool = True

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape

        def conv1x1(name, cout):
            bound = 1.0 / (C ** 0.5)
            k = self.param(
                f"{name}_kernel",
                lambda key, shape, b=bound: jax.random.uniform(
                    key, shape, jnp.float32, -b, b), (C, cout))
            b = self.param(
                f"{name}_bias",
                lambda key, shape, bb=bound: jax.random.uniform(
                    key, shape, jnp.float32, -bb, bb), (cout,))
            return k, b

        flat = x.reshape(B, C, H * W)  # [B, C, N]
        ak, ab = conv1x1("convA", self.c_m)
        bk, bb = conv1x1("convB", self.c_n)
        vk, vb = conv1x1("convV", self.c_n)
        A = jnp.einsum("bcn,cm->bmn", flat, ak) + ab[None, :, None]
        Bm = jnp.einsum("bcn,cm->bmn", flat, bk) + bb[None, :, None]
        V = jnp.einsum("bcn,cm->bmn", flat, vk) + vb[None, :, None]
        # torch F.softmax default dim on 3-D input is dim=1 here (legacy call)
        attn_maps = jax.nn.softmax(Bm, axis=1)
        attn_vecs = jax.nn.softmax(V, axis=1)
        gd = jnp.einsum("bmn,bcn->bmc", A, attn_maps)  # [B, c_m, c_n]
        z = jnp.einsum("bmc,bcn->bmn", gd, attn_vecs)  # [B, c_m, N]
        z = z.reshape(B, self.c_m, H, W)
        if self.reconstruct:
            bound = 1.0 / (self.c_m ** 0.5)
            rk = self.param(
                "conv_reconstruct_kernel",
                lambda key, shape, b=bound: jax.random.uniform(
                    key, shape, jnp.float32, -b, b),
                (self.c_m, self.in_channels))
            rb = self.param(
                "conv_reconstruct_bias",
                lambda key, shape, b=bound: jax.random.uniform(
                    key, shape, jnp.float32, -b, b),
                (self.in_channels,))
            z = jnp.einsum("bmhw,mc->bchw", z, rk) + rb[None, :, None, None]
        return z


class SpatialGroupEnhance(nn.Module):
    """SGE (ref ``attention:/SGE.py``). NCHW."""

    groups: int = 8

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        g = self.groups
        weight = self.param("weight", _zeros, (1, g, 1, 1))
        bias = self.param("bias", _zeros, (1, g, 1, 1))

        xg = x.reshape(B * g, C // g, H, W)
        xn = xg * jnp.mean(xg, axis=(2, 3), keepdims=True)
        xn = jnp.sum(xn, axis=1, keepdims=True)  # [B*g, 1, H, W]
        t = xn.reshape(B * g, -1)
        t = t - jnp.mean(t, axis=1, keepdims=True)
        std = jnp.std(t, axis=1, keepdims=True, ddof=1) + 1e-5
        t = (t / std).reshape(B, g, H, W)
        t = t * weight + bias
        t = t.reshape(B * g, 1, H, W)
        out = xg * jax.nn.sigmoid(t)
        return out.reshape(B, C, H, W)


class CBAMSpatialGate(nn.Module):
    """CBAM spatial attention half (ref ``attention:/CBAM.py``): channel
    max+mean maps -> KxK conv -> sigmoid gate. NCHW."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        bound = 1.0 / (2 * K * K) ** 0.5
        kern = self.param(
            "conv_kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (K, K, 2, 1))
        cbias = self.param(
            "conv_bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (1,))
        mx = jnp.max(x, axis=1, keepdims=True)
        avg = jnp.mean(x, axis=1, keepdims=True)
        stacked = jnp.concatenate([mx, avg], axis=1)  # [B, 2, H, W]
        conv = jax.lax.conv_general_dilated(
            stacked, kern, window_strides=(1, 1),
            padding=[(K // 2, K // 2)] * 2,
            dimension_numbers=("NCHW", "HWIO", "NCHW")) + cbias[None, :,
                                                                None, None]
        return jax.nn.sigmoid(conv)


class CBAMBlock(nn.Module):
    """Full CBAM: channel gate -> spatial gate -> residual add
    (ref ``attention:/CBAM.py:46-60``). NCHW."""

    channel: int = 512
    reduction: int = 16
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        residual = x
        out = x * _cbam_channel_gate(self, x, self.channel, self.reduction)
        out = out * CBAMSpatialGate(self.kernel_size, name="sa")(out)
        return out + residual


def _cbam_channel_gate(module, x, channel, reduction):
    """CBAM channel attention: shared 1x1-conv MLP on max+avg pooled
    descriptors, sigmoid(max_out + avg_out)."""
    w1 = module.param("se1", _normal001, (channel, channel // reduction))
    w2 = module.param("se2", _normal001, (channel // reduction, channel))

    def se(v):  # [B, C]
        return jax.nn.relu(v @ w1) @ w2

    mx = se(jnp.max(x, axis=(2, 3)))
    avg = se(jnp.mean(x, axis=(2, 3)))
    return jax.nn.sigmoid(mx + avg)[:, :, None, None]


class CBAMChannelGate(nn.Module):
    """CBAM channel attention half (ref ``attention:/CBAM.py``): shared MLP
    over max- and avg-pooled descriptors. NCHW in/out."""

    channel: int = 512
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        w1 = self.param("mlp1", _normal001, (self.channel,
                                             self.channel // self.reduction))
        w2 = self.param("mlp2", _normal001, (self.channel // self.reduction,
                                             self.channel))

        def mlp(v):
            return jax.nn.relu(v @ w1) @ w2

        avg = mlp(jnp.mean(x, axis=(2, 3)))
        mx = mlp(jnp.max(x, axis=(2, 3)))
        gate = jax.nn.sigmoid(avg + mx)
        return x * gate[:, :, None, None]
