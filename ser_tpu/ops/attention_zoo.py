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


def _ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


def _uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _conv2d(x, kernel, bias=None, stride=1, padding=0, dilation=1, groups=1):
    """NCHW conv with an HWIO kernel (I = Cin // groups)."""
    out = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(padding, padding)] * 2,
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def _declare_conv(module, name, cin, cout, k, groups=1, use_bias=True):
    """torch Conv2d-default-initialized conv params (HWIO kernel)."""
    fan_in = (cin // groups) * k * k
    init = _uniform(1.0 / fan_in ** 0.5)
    kernel = module.param(f"{name}_kernel", init, (k, k, cin // groups, cout))
    bias = module.param(f"{name}_bias", init, (cout,)) if use_bias else None
    return kernel, bias


def _declare_bn(module, name, c):
    """Eval-mode BatchNorm: normalizes by stored running stats (params so
    they load from checkpoints; fresh init = identity-normalize)."""
    scale = module.param(f"{name}_scale", _ones, (c,))
    bias = module.param(f"{name}_bias", _zeros, (c,))
    mean = module.param(f"{name}_mean", _zeros, (c,))
    var = module.param(f"{name}_var", _ones, (c,))

    def apply(x, axis=1, eps=1e-5):
        shape = [1] * x.ndim
        shape[axis] = -1
        inv = jax.lax.rsqrt(var.reshape(shape) + eps)
        return (x - mean.reshape(shape)) * inv * scale.reshape(shape) \
            + bias.reshape(shape)

    return apply


def _declare_linear_torch(module, name, din, dout, use_bias=True):
    init = _uniform(1.0 / din ** 0.5)
    kernel = module.param(f"{name}_kernel", init, (din, dout))
    bias = module.param(f"{name}_bias", init, (dout,)) if use_bias else None
    return kernel, bias


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
    """Q/K/V-projection-free multi-head attention with an output projection
    (ref ``attention:/SimplifiedSelfAttention.py:8-75`` — the vendored module
    keeps ``fc_o``, std-0.001 init)."""

    h: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, keys, values, attention_mask=None,
                 deterministic: bool = True):
        B, nq, d_model = queries.shape
        nk = keys.shape[1]
        d_k = d_model // self.h
        d_v = d_model // self.h
        ok = self.param("fc_o_kernel", _normal001, (self.h * d_v, d_model))
        ob = self.param("fc_o_bias", _zeros, (d_model,))

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
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, nq, d_model)
        return out @ ok + ob


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


class SKAttention(nn.Module):
    """Selective-kernel attention (ref ``attention:/SKAttention.py:9-56``):
    K parallel convs, channel descriptors -> per-branch softmax gates. NCHW."""

    channel: int = 512
    kernels: tuple = (1, 3, 5, 7)
    reduction: int = 16
    group: int = 1
    L: int = 32

    @nn.compact
    def __call__(self, x):
        C = self.channel
        d = max(self.L, C // self.reduction)

        feats = []
        for k in self.kernels:
            kern, bias = _declare_conv(self, f"conv{k}", C, C, k,
                                       groups=self.group)
            bn = _declare_bn(self, f"bn{k}", C)
            feats.append(jax.nn.relu(bn(_conv2d(x, kern, bias,
                                                padding=k // 2))))
        feats = jnp.stack(feats, axis=0)  # [K, B, C, H, W]
        U = jnp.sum(feats, axis=0)
        S = jnp.mean(U, axis=(2, 3))  # [B, C]
        fk, fb = _declare_linear_torch(self, "fc", C, d)
        Z = S @ fk + fb
        weights = []
        for i in range(len(self.kernels)):
            wk, wb = _declare_linear_torch(self, f"fcs{i}", d, C)
            weights.append(Z @ wk + wb)
        w = jax.nn.softmax(jnp.stack(weights, axis=0), axis=0)  # [K, B, C]
        return jnp.sum(w[:, :, :, None, None] * feats, axis=0)


class BAMBlock(nn.Module):
    """Bottleneck attention module (ref ``attention:/BAM.py:56-84``):
    (1 + sigmoid(channel_attn + spatial_attn)) * x. Spatial branch uses
    dilated 3x3 convs with padding 1, which shrinks the map to 1x1 at the
    vendored 7x7 input — reproduced faithfully. NCHW."""

    channel: int = 512
    reduction: int = 16
    num_layers: int = 3
    dia_val: int = 2

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        cr = C // self.reduction

        # channel branch: avgpool -> [Linear + BN1d + ReLU] x num_layers
        # -> Linear (gate_channels = [C] + [cr]*num_layers + [C])
        y = jnp.mean(x, axis=(2, 3))  # [B, C]
        dims = [C] + [cr] * self.num_layers + [C]
        for i in range(len(dims) - 2):
            k, b = _declare_linear_torch(self, f"ca_fc{i}", dims[i],
                                         dims[i + 1])
            bn = _declare_bn(self, f"ca_bn{i}", dims[i + 1])
            y = jax.nn.relu(bn(y @ k + b, axis=1))
        lk, lb = _declare_linear_torch(self, "ca_last_fc", dims[-2], dims[-1])
        ca = (y @ lk + lb)[:, :, None, None]  # [B, C, 1, 1]

        # spatial branch: 1x1 reduce -> 3x (dilated 3x3) -> 1x1 to one map
        rk, rb = _declare_conv(self, "sa_reduce", C, cr, 1)
        rbn = _declare_bn(self, "sa_reduce_bn", cr)
        s = jax.nn.relu(rbn(_conv2d(x, rk, rb)))
        for i in range(self.num_layers):
            ck, cb = _declare_conv(self, f"sa_conv{i}", cr, cr, 3)
            cbn = _declare_bn(self, f"sa_bn{i}", cr)
            s = jax.nn.relu(cbn(_conv2d(s, ck, cb, padding=1,
                                        dilation=self.dia_val)))
        fk, fb = _declare_conv(self, "sa_last_conv", cr, 1, 1)
        sa = _conv2d(s, fk, fb)  # [B, 1, h', w'] (shrinks, see docstring)

        weight = jax.nn.sigmoid(jnp.broadcast_to(sa, x.shape)
                                + jnp.broadcast_to(ca, x.shape))
        return (1.0 + weight) * x


class DAModule(nn.Module):
    """Dual attention (DANet, ref ``attention:/DANet.py``): position branch
    (conv + full self-attention over pixels) + channel branch (conv +
    projection-free attention over channels). NCHW."""

    d_model: int = 512
    kernel_size: int = 3
    H: int = 7
    W: int = 7

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        k = self.kernel_size
        pk, pb = _declare_conv(self, "pos_cnn", C, C, k)
        ck, cb = _declare_conv(self, "chan_cnn", C, C, k)

        y = _conv2d(x, pk, pb, padding=(k - 1) // 2)
        y = y.reshape(B, C, H * W).transpose(0, 2, 1)  # [B, N, C]
        p_out = ScaledDotProductAttention(
            self.d_model, d_k=self.d_model, d_v=self.d_model, h=1,
            name="pa")(y, y, y)
        p_out = p_out.transpose(0, 2, 1).reshape(B, C, H, W)

        z = _conv2d(x, ck, cb, padding=(k - 1) // 2)
        z = z.reshape(B, C, H * W)  # [B, C, N]
        c_out = SimplifiedScaledDotProductAttention(h=1, name="ca")(z, z, z)
        c_out = c_out.reshape(B, C, H, W)
        return p_out + c_out


class PSA(nn.Module):
    """Pyramid squeeze attention (ref ``attention:/PSA.py:8-68``): S channel
    groups with growing kernel sizes, per-group SE gates, softmax over
    groups. NCHW."""

    channel: int = 512
    reduction: int = 4
    S: int = 4

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        S = self.S
        cs = C // S

        groups = x.reshape(B, S, cs, H, W)
        spc, se = [], []
        for i in range(S):
            k = 2 * (i + 1) + 1
            kern, bias = _declare_conv(self, f"conv{i}", cs, cs, k)
            g = _conv2d(groups[:, i], kern, bias, padding=i + 1)
            spc.append(g)
            w1, _ = _declare_conv(self, f"se{i}_fc1", cs,
                                  C // (S * self.reduction), 1,
                                  use_bias=False)
            w2, _ = _declare_conv(self, f"se{i}_fc2",
                                  C // (S * self.reduction), cs, 1,
                                  use_bias=False)
            pooled = jnp.mean(g, axis=(2, 3))[:, :, None, None]
            gate = jax.nn.sigmoid(_conv2d(
                jax.nn.relu(_conv2d(pooled, w1)), w2))  # [B, cs, 1, 1]
            se.append(gate)
        spc = jnp.stack(spc, axis=1)  # [B, S, cs, H, W]
        se = jnp.stack(se, axis=1)  # [B, S, cs, 1, 1]
        soft = jax.nn.softmax(
            jnp.broadcast_to(se, spc.shape), axis=1)
        return (spc * soft).reshape(B, C, H, W)


class EMSA(nn.Module):
    """Efficient multi-head self-attention (ref ``attention:/EMSA.py:8-99``):
    optional strided depthwise-conv K/V downsampling + LayerNorm, optional
    1x1-conv head transform with softmax + instance norm. Input [B, N, C]
    with N = H*W."""

    d_model: int
    d_k: int
    d_v: int
    h: int
    H: int = 7
    W: int = 7
    ratio: int = 3
    apply_transform: bool = True
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, keys, values, deterministic: bool = True):
        B, nq, c = queries.shape
        qk = self.param("fc_q_kernel", _normal001, (self.d_model,
                                                    self.h * self.d_k))
        qb = self.param("fc_q_bias", _zeros, (self.h * self.d_k,))
        kk = self.param("fc_k_kernel", _normal001, (self.d_model,
                                                    self.h * self.d_k))
        kb = self.param("fc_k_bias", _zeros, (self.h * self.d_k,))
        vk = self.param("fc_v_kernel", _normal001, (self.d_model,
                                                    self.h * self.d_v))
        vb = self.param("fc_v_bias", _zeros, (self.h * self.d_v,))
        ok = self.param("fc_o_kernel", _normal001, (self.h * self.d_v,
                                                    self.d_model))
        ob = self.param("fc_o_bias", _zeros, (self.d_model,))

        q = (queries @ qk + qb).reshape(B, nq, self.h, self.d_k)
        q = q.transpose(0, 2, 1, 3)  # [B, h, nq, d_k]

        if self.ratio > 1:
            r = self.ratio
            sk, sb = _declare_conv(self, "sr_conv", c, c, r + 1, groups=c)
            xi = queries.transpose(0, 2, 1).reshape(B, c, self.H, self.W)
            xi = _conv2d(xi, sk, sb, stride=r, padding=r // 2, groups=c)
            xi = xi.reshape(B, c, -1).transpose(0, 2, 1)  # [B, n', c]
            lnw = self.param("sr_ln_scale", _ones, (c,))
            lnb = self.param("sr_ln_bias", _zeros, (c,))
            mu = jnp.mean(xi, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xi - mu), axis=-1, keepdims=True)
            xi = (xi - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb
            kin = vin = xi
        else:
            kin, vin = keys, values
        nk = kin.shape[1]
        k = (kin @ kk + kb).reshape(B, nk, self.h, self.d_k)
        k = k.transpose(0, 2, 3, 1)  # [B, h, d_k, nk]
        v = (vin @ vk + vb).reshape(B, nk, self.h, self.d_v)
        v = v.transpose(0, 2, 1, 3)  # [B, h, nk, d_v]

        att = jnp.matmul(q, k) / (self.d_k ** 0.5)  # [B, h, nq, nk]
        if self.apply_transform and self.h > 1:
            tk, tb = _declare_conv(self, "transform_conv", self.h, self.h, 1)
            att = _conv2d(att, tk, tb)
            att = jax.nn.softmax(att, axis=-1)
            # InstanceNorm2d(h), no affine: normalize per (B, head) map
            mu = jnp.mean(att, axis=(2, 3), keepdims=True)
            var = jnp.mean(jnp.square(att - mu), axis=(2, 3), keepdims=True)
            att = (att - mu) * jax.lax.rsqrt(var + 1e-5)
        else:
            att = jax.nn.softmax(att, axis=-1)
        if not deterministic and self.dropout > 0:
            from ser_tpu.ops.layers import dropout as fdrop

            att = fdrop(att, self.dropout, False, self.make_rng("dropout"))
        out = jnp.matmul(att, v).transpose(0, 2, 1, 3).reshape(
            B, nq, self.h * self.d_v)
        return out @ ok + ob


class CoTAttention(nn.Module):
    """Contextual transformer attention (ref
    ``attention:/CoTAttention.py:11-52``). NCHW."""

    dim: int = 512
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        ks = self.kernel_size
        factor = 4

        kek, _ = _declare_conv(self, "key_conv", C, C, ks, groups=4,
                               use_bias=False)
        key_bn = _declare_bn(self, "key_bn", C)
        k1 = jax.nn.relu(key_bn(_conv2d(x, kek, padding=ks // 2, groups=4)))

        vek, _ = _declare_conv(self, "value_conv", C, C, 1, use_bias=False)
        val_bn = _declare_bn(self, "value_bn", C)
        v = val_bn(_conv2d(x, vek)).reshape(B, C, -1)

        y = jnp.concatenate([k1, x], axis=1)  # [B, 2C, H, W]
        a1k, _ = _declare_conv(self, "att_conv1", 2 * C, 2 * C // factor, 1,
                               use_bias=False)
        att_bn = _declare_bn(self, "att_bn", 2 * C // factor)
        a2k, a2b = _declare_conv(self, "att_conv2", 2 * C // factor,
                                 ks * ks * C, 1)
        att = jax.nn.relu(att_bn(_conv2d(y, a1k)))
        att = _conv2d(att, a2k, a2b)  # [B, C*ks*ks, H, W]
        att = att.reshape(B, C, ks * ks, H, W).mean(axis=2).reshape(B, C, -1)
        k2 = (jax.nn.softmax(att, axis=-1) * v).reshape(B, C, H, W)
        return k1 + k2


class CoordAttention(nn.Module):
    """Coordinate attention (ref ``attention:/CoordAttention.py:22-56``):
    factorized H- and W-axis pooled descriptors -> shared bottleneck ->
    per-axis sigmoid gates. NCHW."""

    inp: int = 512
    oup: int = 512
    reduction: int = 32

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        mip = max(8, self.inp // self.reduction)

        x_h = jnp.mean(x, axis=3, keepdims=True)  # [B, C, H, 1]
        x_w = jnp.mean(x, axis=2, keepdims=True)  # [B, C, 1, W]
        x_w = x_w.transpose(0, 1, 3, 2)  # [B, C, W, 1]

        y = jnp.concatenate([x_h, x_w], axis=2)  # [B, C, H+W, 1]
        k1, b1 = _declare_conv(self, "conv1", self.inp, mip, 1)
        bn1 = _declare_bn(self, "bn1", mip)
        y = bn1(_conv2d(y, k1, b1))
        y = y * jnp.clip(y + 3.0, 0.0, 6.0) / 6.0  # h_swish

        y_h, y_w = y[:, :, :H], y[:, :, H:]
        y_w = y_w.transpose(0, 1, 3, 2)  # [B, mip, 1, W]
        kh, bh = _declare_conv(self, "conv_h", mip, self.oup, 1)
        kw, bw = _declare_conv(self, "conv_w", mip, self.oup, 1)
        a_h = jax.nn.sigmoid(_conv2d(y_h, kh, bh))  # [B, oup, H, 1]
        a_w = jax.nn.sigmoid(_conv2d(y_w, kw, bw))  # [B, oup, 1, W]
        return x * a_w * a_h


class TripletAttention(nn.Module):
    """Triplet attention (ref ``attention:/TripletAttention.py:36-56``):
    three rotation branches, each Z-pool (max|mean) -> 7x7 conv -> BN ->
    sigmoid gate; averaged. NCHW."""

    no_spatial: bool = False

    def _gate(self, x, name):
        K = 7
        kern, _ = _declare_conv(self, f"{name}_conv", 2, 1, K, use_bias=False)
        bn = _declare_bn(self, f"{name}_bn", 1)
        z = jnp.concatenate(
            [jnp.max(x, axis=1, keepdims=True),
             jnp.mean(x, axis=1, keepdims=True)], axis=1)
        return x * jax.nn.sigmoid(bn(_conv2d(z, kern, padding=K // 2)))

    @nn.compact
    def __call__(self, x):
        out1 = self._gate(x.transpose(0, 2, 1, 3), "cw").transpose(0, 2, 1, 3)
        out2 = self._gate(x.transpose(0, 3, 2, 1), "hc").transpose(0, 3, 2, 1)
        if self.no_spatial:
            return 0.5 * (out1 + out2)
        return (self._gate(x, "hw") + out1 + out2) / 3.0


class ShuffleAttention(nn.Module):
    """Shuffle attention (ref ``attention:/ShuffleAttention.py:9-72``):
    grouped channel-half SE gate + spatial-half GroupNorm gate, then channel
    shuffle. NCHW."""

    channel: int = 512
    G: int = 8

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        G = self.G
        half = C // (2 * G)
        cweight = self.param("cweight", _zeros, (1, half, 1, 1))
        cbias = self.param("cbias", _ones, (1, half, 1, 1))
        sweight = self.param("sweight", _zeros, (1, half, 1, 1))
        sbias = self.param("sbias", _ones, (1, half, 1, 1))
        gnw = self.param("gn_scale", _ones, (half,))
        gnb = self.param("gn_bias", _zeros, (half,))

        xg = x.reshape(B * G, C // G, H, W)
        x0, x1 = xg[:, :half], xg[:, half:]

        xc = jnp.mean(x0, axis=(2, 3), keepdims=True)
        xc = cweight * xc + cbias
        xc = x0 * jax.nn.sigmoid(xc)

        # GroupNorm(half groups, half channels) == per-channel spatial norm
        mu = jnp.mean(x1, axis=(2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x1 - mu), axis=(2, 3), keepdims=True)
        xn = (x1 - mu) * jax.lax.rsqrt(var + 1e-5)
        xn = xn * gnw[None, :, None, None] + gnb[None, :, None, None]
        xs = x1 * jax.nn.sigmoid(sweight * xn + sbias)

        out = jnp.concatenate([xc, xs], axis=1).reshape(B, C, H, W)
        # channel shuffle with 2 groups
        out = out.reshape(B, 2, C // 2, H, W).transpose(0, 2, 1, 3, 4)
        return out.reshape(B, C, H, W)


class MUSEAttention(nn.Module):
    """MUSE attention (ref ``attention:/MUSEAttention.py:33-105``): standard
    multi-head attention plus softmax-weighted depthwise-separable conv
    branches over V. Input [B, N, D]."""

    d_model: int
    d_k: int
    d_v: int
    h: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, queries, keys, values, deterministic: bool = True):
        B, nq = queries.shape[:2]
        nk = keys.shape[1]
        hdv = self.h * self.d_v

        qk = self.param("fc_q_kernel", _normal001, (self.d_model,
                                                    self.h * self.d_k))
        qb = self.param("fc_q_bias", _zeros, (self.h * self.d_k,))
        kk = self.param("fc_k_kernel", _normal001, (self.d_model,
                                                    self.h * self.d_k))
        kb = self.param("fc_k_bias", _zeros, (self.h * self.d_k,))
        vk = self.param("fc_v_kernel", _normal001, (self.d_model, hdv))
        vb = self.param("fc_v_bias", _zeros, (hdv,))
        ok = self.param("fc_o_kernel", _normal001, (hdv, self.d_model))
        ob = self.param("fc_o_bias", _zeros, (self.d_model,))

        q = (queries @ qk + qb).reshape(B, nq, self.h, self.d_k)
        k = (keys @ kk + kb).reshape(B, nk, self.h, self.d_k)
        v = (values @ vk + vb).reshape(B, nk, self.h, self.d_v)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (self.d_k ** 0.5)
        att = jax.nn.softmax(att, axis=-1)
        if not deterministic and self.dropout > 0:
            from ser_tpu.ops.layers import dropout as fdrop

            att = fdrop(att, self.dropout, False, self.make_rng("dropout"))
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, nq, hdv)
        out = out @ ok + ob

        # v reused by the conv branch (the reference projects V once):
        # [B, nk, h, d_v] -> [B, h*d_v, nk], h-major channel order
        v2 = v.reshape(B, nk, hdv).transpose(0, 2, 1)

        dy = self.param("dy_paras", _ones, (3,))
        w = jax.nn.softmax(dy)

        def dp_conv(name, ksz, xin):
            # depthwise 1-D conv (identity when k == 1) then pointwise conv
            if ksz > 1:
                binit = _uniform(1.0 / ksz ** 0.5)
                dk = self.param(f"{name}_depth_kernel", binit, (ksz, hdv))
                db = self.param(f"{name}_depth_bias", binit, (hdv,))
                pad = ksz // 2
                xp = jnp.pad(xin, ((0, 0), (0, 0), (pad, pad)))
                n = xin.shape[-1]
                xin = sum(dk[i][None, :, None] * xp[:, :, i : i + n]
                          for i in range(ksz)) + db[None, :, None]
            pinit = _uniform(1.0 / hdv ** 0.5)
            pk = self.param(f"{name}_point_kernel", pinit,
                            (hdv, self.d_model))
            pb = self.param(f"{name}_point_bias", pinit, (self.d_model,))
            return jnp.einsum("bcn,co->bon", xin, pk) + pb[None, :, None]

        out2 = (w[0] * dp_conv("conv1", 1, v2)
                + w[1] * dp_conv("conv3", 3, v2)
                + w[2] * dp_conv("conv5", 5, v2))
        return out + out2.transpose(0, 2, 1)


def _spatial_shift1(x):
    """S2-MLP shift pattern 1 on [B, W, H, C] — functional form of the
    reference's in-place slab writes (``attention:/S2Attention.py:7-13``).

    The vendored code assigns OVERLAPPING slices of the same tensor in
    place; where the destination index runs AHEAD of the source (slabs A/C)
    the elementwise copy cascades, so the whole axis collapses to the
    boundary slice (verified empirically against torch CPU). Slabs B/D copy
    against the iteration order and shift cleanly."""
    b, w, h, c = x.shape
    s = c // 4
    a = jnp.broadcast_to(x[:, :1, :, :s], (b, w, h, s))  # cascaded
    bl = jnp.concatenate([x[:, 1:, :, s: 2 * s], x[:, -1:, :, s: 2 * s]],
                         axis=1)
    cl = jnp.broadcast_to(x[:, :, :1, 2 * s: 3 * s], (b, w, h, s))  # cascaded
    d = jnp.concatenate([x[:, :, 1:, 3 * s:], x[:, :, -1:, 3 * s:]], axis=2)
    return jnp.concatenate([a, bl, cl, d], axis=3)


def _spatial_shift2(x):
    b, w, h, c = x.shape
    s = c // 4
    a = jnp.broadcast_to(x[:, :, :1, :s], (b, w, h, s))  # cascaded
    bl = jnp.concatenate([x[:, :, 1:, s: 2 * s], x[:, :, -1:, s: 2 * s]],
                         axis=2)
    cl = jnp.broadcast_to(x[:, :1, :, 2 * s: 3 * s], (b, w, h, s))  # cascaded
    d = jnp.concatenate([x[:, 1:, :, 3 * s:], x[:, -1:, :, 3 * s:]], axis=1)
    return jnp.concatenate([a, bl, cl, d], axis=3)


class S2Attention(nn.Module):
    """S2-MLP spatial-shift attention (ref ``attention:/S2Attention.py``).
    NCHW in/out.

    Faithfulness note: the vendored shifts mutate in place, so the row/col
    that is "shifted over" keeps its ORIGINAL value only where the slab was
    not yet written; the functional form above reproduces the exact
    post-mutation contents (boundary rows keep original values)."""

    channels: int = 512

    @nn.compact
    def __call__(self, x):
        B, C, W, H = x.shape
        k1, b1 = _declare_linear_torch(self, "mlp1", C, C * 3)
        k2, b2 = _declare_linear_torch(self, "mlp2", C, C)
        m1, _ = _declare_linear_torch(self, "sa_mlp1", C, C, use_bias=False)
        m2, _ = _declare_linear_torch(self, "sa_mlp2", C, C * 3,
                                      use_bias=False)

        xp = x.transpose(0, 2, 3, 1)  # [B, W, H, C]
        xp = xp @ k1 + b1
        x1 = _spatial_shift1(xp[..., :C])
        x2 = _spatial_shift2(xp[..., C: 2 * C])
        x3 = xp[..., 2 * C:]
        x_all = jnp.stack([x1, x2, x3], axis=1)  # [B, 3, W, H, C]

        flat = x_all.reshape(B, 3, -1, C)
        a = jnp.sum(flat, axis=(1, 2))  # [B, C]
        hat_a = jax.nn.gelu(a @ m1) @ m2  # [B, 3C]
        bar_a = jax.nn.softmax(hat_a.reshape(B, 3, C), axis=1)
        out = jnp.sum(bar_a[:, :, None, :] * flat, axis=1)  # [B, N, C]
        out = out.reshape(B, W, H, C) @ k2 + b2
        return out.transpose(0, 3, 1, 2)


class PolarizedSelfAttention(nn.Module):
    """Polarized self-attention (ref
    ``attention:/PolarizedSelfAttention.py``): channel-only branch
    (softmax-pooled spatial query, LayerNorm + sigmoid gate) and
    spatial-only branch (softmax-pooled channel query). ``sequential=False``
    adds the two branch outputs; ``sequential=True`` feeds the channel
    output into the spatial branch. NCHW."""

    channel: int = 512
    sequential: bool = False

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        half = C // 2
        ch_wv, ch_wv_b = _declare_conv(self, "ch_wv", C, half, 1)
        ch_wq, ch_wq_b = _declare_conv(self, "ch_wq", C, 1, 1)
        ch_wz, ch_wz_b = _declare_conv(self, "ch_wz", half, C, 1)
        lnw = self.param("ln_scale", _ones, (C,))
        lnb = self.param("ln_bias", _zeros, (C,))
        sp_wv, sp_wv_b = _declare_conv(self, "sp_wv", C, half, 1)
        sp_wq, sp_wq_b = _declare_conv(self, "sp_wq", C, half, 1)

        # channel-only branch
        wv = _conv2d(x, ch_wv, ch_wv_b).reshape(B, half, -1)  # [B, C/2, N]
        wq = _conv2d(x, ch_wq, ch_wq_b).reshape(B, -1, 1)  # [B, N, 1]
        wq = jax.nn.softmax(wq, axis=1)
        wz = jnp.matmul(wv, wq)[:, :, :, None]  # [B, C/2, 1, 1]
        z = _conv2d(wz, ch_wz, ch_wz_b).reshape(B, C)  # [B, C]
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
        z = (z - mu) * jax.lax.rsqrt(var + 1e-5) * lnw + lnb
        channel_out = jax.nn.sigmoid(z)[:, :, None, None] * x

        # spatial-only branch
        sp_in = channel_out if self.sequential else x
        swv = _conv2d(sp_in, sp_wv, sp_wv_b).reshape(B, half, -1)
        swq = jnp.mean(_conv2d(sp_in, sp_wq, sp_wq_b), axis=(2, 3))
        swq = jax.nn.softmax(swq, axis=-1)[:, None, :]  # [B, 1, C/2]
        swz = jnp.matmul(swq, swv).reshape(B, 1, H, W)
        spatial_out = jax.nn.sigmoid(swz) * sp_in
        if self.sequential:
            return spatial_out
        return spatial_out + channel_out


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
