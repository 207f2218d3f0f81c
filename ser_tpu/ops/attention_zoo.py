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
