"""Attention-zoo: vision-backbone blocks (catalog tail, ref ``attention:/``).

Continues ``ser_tpu.ops.attention_zoo`` with the vendored catalog's
image-backbone members: ResidualAttention, ParNet, CrissCross, ViP
(WeightedPermuteMLP), Outlook, MobileViT (v1), GFNet, Halo, ACmix, Axial,
CoAtNet. All NCHW/NHWC conventions follow the torch originals; norms are
eval-mode with loadable running stats (see ``attention_zoo``).

Faithfulness notes (verified against the vendored files):
- HaloAttention's padding mask is inverted in the vendored code (it
  ``masked_fill``s where the mask is TRUE, i.e. the VALID positions) — we
  reproduce that trained-in behavior bit for bit.
- CoAtNet imports ``model.conv.MBConv`` which does not exist anywhere in
  the reference tree (broken vendored file, like ``model/lsthm_h.py``); our
  CoAtNet uses a standard EfficientNet MBConvBlock (expand-dw-SE-project)
  and is shape-tested rather than oracle-tested.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops.attention_zoo import (
    ScaledDotProductAttention,
    _conv2d,
    _declare_bn,
    _declare_conv,
    _declare_linear_torch,
    _normal001,
    _ones,
    _uniform,
    _zeros,
)


class ResidualAttention(nn.Module):
    """Residual attention classification head
    (ref ``attention:/ResidualAttention.py:8-21``): per-pixel class scores,
    avg + la * max spatial pooling. NCHW -> [B, num_class]."""

    channel: int = 512
    num_class: int = 1000
    la: float = 0.2

    @nn.compact
    def __call__(self, x):
        k, _ = _declare_conv(self, "fc", self.channel, self.num_class, 1,
                             use_bias=False)
        y = _conv2d(x, k).reshape(x.shape[0], self.num_class, -1)
        return jnp.mean(y, axis=2) + self.la * jnp.max(y, axis=2)


class ParNetAttention(nn.Module):
    """ParNet block (ref ``attention:/ParNetAttention.py:8-35``):
    silu(conv1x1+BN + conv3x3+BN + SSE-gated x). NCHW."""

    channel: int = 512

    @nn.compact
    def __call__(self, x):
        C = self.channel
        sk, sb = _declare_conv(self, "sse_conv", C, C, 1)
        k1, b1 = _declare_conv(self, "conv1", C, C, 1)
        bn1 = _declare_bn(self, "bn1", C)
        k3, b3 = _declare_conv(self, "conv3", C, C, 3)
        bn3 = _declare_bn(self, "bn3", C)

        pooled = jnp.mean(x, axis=(2, 3), keepdims=True)
        gate = jax.nn.sigmoid(_conv2d(pooled, sk, sb))
        x1 = bn1(_conv2d(x, k1, b1))
        x2 = bn3(_conv2d(x, k3, b3, padding=1))
        y = x1 + x2 + gate * x
        return y * jax.nn.sigmoid(y)  # SiLU


class CrissCrossAttention(nn.Module):
    """Criss-cross attention (ref ``attention:/CrissCrossAttention.py``):
    joint softmax over the row and column of each pixel, self position
    excluded from the row branch via a -inf diagonal. NCHW."""

    in_dim: int

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        c8 = self.in_dim // 8
        qk, qb = _declare_conv(self, "query_conv", C, c8, 1)
        kk, kb = _declare_conv(self, "key_conv", C, c8, 1)
        vk, vb = _declare_conv(self, "value_conv", C, C, 1)
        gamma = self.param("gamma", _zeros, (1,))

        q = _conv2d(x, qk, qb)
        k = _conv2d(x, kk, kb)
        v = _conv2d(x, vk, vb)

        # energy_H[b,h,w,h'] = q[b,:,h,w].k[b,:,h',w]; -inf on h==h'
        energy_h = jnp.einsum("bchw,bcgw->bhwg", q, k)
        diag = jnp.eye(H, dtype=bool)[None, :, None, :]
        energy_h = jnp.where(diag, -jnp.inf, energy_h)
        # energy_W[b,h,w,w'] = q[b,:,h,w].k[b,:,h,w']
        energy_w = jnp.einsum("bchw,bchv->bhwv", q, k)
        concat = jax.nn.softmax(
            jnp.concatenate([energy_h, energy_w], axis=3), axis=3)
        att_h, att_w = concat[..., :H], concat[..., H:]

        out_h = jnp.einsum("bcgw,bhwg->bchw", v, att_h)
        out_w = jnp.einsum("bchv,bhwv->bchw", v, att_w)
        return gamma * (out_h + out_w) + x


class WeightedPermuteMLP(nn.Module):
    """ViP permute-MLP (ref ``attention:/ViP.py:16-50``): channel/height/
    width MLP branches, softmax-reweighted. Input NHWC [B, H, W, C]."""

    dim: int
    seg_dim: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        S = C // self.seg_dim
        ck, cb = _declare_linear_torch(self, "mlp_c", C, C,
                                       use_bias=self.qkv_bias)
        hk, hb = _declare_linear_torch(self, "mlp_h", C, C,
                                       use_bias=self.qkv_bias)
        wk, wb = _declare_linear_torch(self, "mlp_w", C, C,
                                       use_bias=self.qkv_bias)
        r1k, r1b = _declare_linear_torch(self, "reweight_fc1", C, C // 4)
        r2k, r2b = _declare_linear_torch(self, "reweight_fc2", C // 4, C * 3)
        pk, pb = _declare_linear_torch(self, "proj", C, C)

        def lin(t, kern, bias):
            t = t @ kern
            return t if bias is None else t + bias

        c_embed = lin(x, ck, cb)

        h_in = x.reshape(B, H, W, self.seg_dim, S).transpose(
            0, 3, 2, 1, 4).reshape(B, self.seg_dim, W, H * S)
        h_embed = lin(h_in, hk, hb).reshape(
            B, self.seg_dim, W, H, S).transpose(0, 3, 2, 1, 4).reshape(
            B, H, W, C)

        w_in = x.reshape(B, H, W, self.seg_dim, S).transpose(
            0, 3, 1, 2, 4).reshape(B, self.seg_dim, H, W * S)
        w_embed = lin(w_in, wk, wb).reshape(
            B, self.seg_dim, H, W, S).transpose(0, 2, 3, 1, 4).reshape(
            B, H, W, C)

        pooled = jnp.mean((c_embed + h_embed + w_embed).reshape(B, -1, C),
                          axis=1)  # [B, C]
        weight = (jax.nn.gelu(pooled @ r1k + r1b) @ r2k + r2b)
        weight = jax.nn.softmax(
            weight.reshape(B, C, 3).transpose(2, 0, 1), axis=0
        )[:, :, None, None, :]  # [3, B, 1, 1, C]

        out = (c_embed * weight[0] + w_embed * weight[1]
               + h_embed * weight[2])
        return out @ pk + pb


def _unfold(x, k, pad, stride=1):
    """torch ``nn.Unfold``: NCHW -> [B, C*k*k, L] with (c, ki, kj)-major
    channel order, L = h_out*w_out."""
    B, C, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    h_out = (H + 2 * pad - k) // stride + 1
    w_out = (W + 2 * pad - k) // stride + 1
    cols = []
    for ki in range(k):
        for kj in range(k):
            cols.append(jax.lax.slice(
                xp, (0, 0, ki, kj),
                (B, C, ki + (h_out - 1) * stride + 1,
                 kj + (w_out - 1) * stride + 1),
                (1, 1, stride, stride)))
    # [k*k, B, C, h_out, w_out] -> [B, C, k*k, L] -> [B, C*k*k, L]
    patches = jnp.stack(cols, axis=2)  # [B, C, k*k, h_out, w_out]
    return patches.reshape(B, C * k * k, h_out * w_out), (h_out, w_out)


def _fold(cols, out_hw, k, pad, stride=1):
    """torch ``F.fold``: [B, C*k*k, L] -> NCHW with overlapping ADD."""
    B = cols.shape[0]
    H, W = out_hw
    C = cols.shape[1] // (k * k)
    h_out = (H + 2 * pad - k) // stride + 1
    w_out = (W + 2 * pad - k) // stride + 1
    patches = cols.reshape(B, C, k, k, h_out, w_out)
    out = jnp.zeros((B, C, H + 2 * pad, W + 2 * pad), cols.dtype)
    for ki in range(k):
        for kj in range(k):
            upd = jnp.zeros_like(out)
            upd = upd.at[:, :, ki: ki + (h_out - 1) * stride + 1: stride,
                         kj: kj + (w_out - 1) * stride + 1: stride].set(
                patches[:, :, ki, kj])
            out = out + upd
    return out[:, :, pad: pad + H, pad: pad + W]


class OutlookAttention(nn.Module):
    """Outlook attention (ref ``attention:/OutlookAttention.py:8-55``):
    per-pixel k*k local attention maps predicted from pooled features,
    applied via unfold/fold. Input NHWC [B, H, W, C]."""

    dim: int
    num_heads: int = 1
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        k = self.kernel_size
        nh = self.num_heads
        hd = C // nh
        scale = hd ** -0.5
        vk, _ = _declare_linear_torch(self, "v_pj", C, C, use_bias=False)
        ak, ab = _declare_linear_torch(self, "attn", C, k ** 4 * nh)
        pk, pb = _declare_linear_torch(self, "proj", C, C)

        assert self.stride == 1, "stride > 1 not exercised by the reference"
        v = (x @ vk).transpose(0, 3, 1, 2)  # [B, C, H, W]
        cols, (h, w) = _unfold(v, k, self.padding, self.stride)
        v_p = cols.reshape(B, nh, hd, k * k, h * w).transpose(0, 1, 4, 3, 2)

        attn = (x @ ak + ab).reshape(B, H * W, nh, k * k, k * k)
        attn = jax.nn.softmax(attn.transpose(0, 2, 1, 3, 4) * scale, axis=-1)

        out = jnp.matmul(attn, v_p)  # [B, nh, H*W, k*k, hd]
        out = out.transpose(0, 1, 4, 3, 2).reshape(B, C * k * k, h * w)
        out = _fold(out, (H, W), k, self.padding, self.stride)
        return out.transpose(0, 2, 3, 1) @ pk + pb


class MobileViTAttention(nn.Module):
    """MobileViT v1 block (ref ``attention:/MobileViTAttention.py:75-105``):
    local convs -> patch-grid transformer (depth 3) -> fuse with input.
    NCHW."""

    in_channel: int = 3
    dim: int = 512
    kernel_size: int = 3
    patch_size: int = 7
    depth: int = 3
    heads: int = 8
    head_dim: int = 64
    mlp_dim: int = 1024

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, C, H, W = x.shape
        p = self.patch_size
        ks = self.kernel_size
        k1, b1 = _declare_conv(self, "conv1", C, C, ks)
        k2, b2 = _declare_conv(self, "conv2", C, self.dim, 1)
        k3, b3 = _declare_conv(self, "conv3", self.dim, C, 1)
        k4, b4 = _declare_conv(self, "conv4", 2 * C, C, ks)

        y = _conv2d(_conv2d(x, k1, b1, padding=ks // 2), k2, b2)
        nh, nw = H // p, W // p
        # 'bs dim (nh ph) (nw pw) -> bs (ph pw) (nh nw) dim'
        y = y.reshape(B, self.dim, nh, p, nw, p).transpose(
            0, 3, 5, 2, 4, 1).reshape(B, p * p, nh * nw, self.dim)

        for i in range(self.depth):
            y = y + self._attention(y, f"layer{i}_attn")
            y = y + self._ffn(y, f"layer{i}_ffn")

        y = y.reshape(B, p, p, nh, nw, self.dim).transpose(
            0, 5, 3, 1, 4, 2).reshape(B, self.dim, H, W)
        y = _conv2d(y, k3, b3)
        y = jnp.concatenate([x, y], axis=1)
        return _conv2d(y, k4, b4, padding=ks // 2)

    def _prenorm(self, t, name):
        s = self.param(f"{name}_ln_scale", _ones, (t.shape[-1],))
        b = self.param(f"{name}_ln_bias", _zeros, (t.shape[-1],))
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
        return (t - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

    def _attention(self, t, name):
        inner = self.heads * self.head_dim
        D = t.shape[-1]
        tn = self._prenorm(t, name)
        qkvk, _ = _declare_linear_torch(self, f"{name}_to_qkv", D, inner * 3,
                                        use_bias=False)
        ok, ob = _declare_linear_torch(self, f"{name}_to_out", inner, D)
        qkv = tn @ qkvk
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, P, N = t.shape[:3]
        shp = (B, P, N, self.heads, self.head_dim)
        q, k, v = (a.reshape(shp).transpose(0, 1, 3, 2, 4) for a in (q, k, v))
        att = jax.nn.softmax(
            jnp.matmul(q, jnp.swapaxes(k, -1, -2)) * self.head_dim ** -0.5,
            axis=-1)
        out = jnp.matmul(att, v).transpose(0, 1, 3, 2, 4).reshape(
            B, P, N, inner)
        return out @ ok + ob

    def _ffn(self, t, name):
        D = t.shape[-1]
        tn = self._prenorm(t, name)
        k1, b1 = _declare_linear_torch(self, f"{name}_fc1", D, self.mlp_dim)
        k2, b2 = _declare_linear_torch(self, f"{name}_fc2", self.mlp_dim, D)
        h = tn @ k1 + b1
        h = h * jax.nn.sigmoid(h)  # SiLU
        return h @ k2 + b2


class GFNet(nn.Module):
    """Global-filter network (ref ``attention:/gfnet.py:86-113``): patch
    embed -> [LN -> spectral filter -> LN -> MLP residual] blocks -> mean
    pool -> softmaxed head. NCHW images in, [B, num_classes] out."""

    embed_dim: int = 384
    img_size: int = 224
    patch_size: int = 16
    mlp_ratio: int = 4
    depth: int = 4
    num_classes: int = 1000
    in_chans: int = 3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        p = self.patch_size
        D = self.embed_dim
        a = self.img_size // p
        wbins = a // 2 + 1

        pk, pb = _declare_conv(self, "patch_proj", self.in_chans, D, p)
        # declared-but-unused `embedding` linear kept for parity
        _declare_linear_torch(self, "embedding", p * p * self.in_chans, D)

        y = _conv2d(x, pk, pb, stride=p)  # [B, D, a, a]
        y = y.reshape(B, D, -1).transpose(0, 2, 1)  # [B, N, D]

        def ln(t, name):
            s = self.param(f"{name}_scale", _ones, (D,))
            b = self.param(f"{name}_bias", _zeros, (D,))
            mu = jnp.mean(t, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-5) * s + b

        for i in range(self.depth):
            w = self.param(
                f"block{i}_complex_weight",
                lambda key, shape: 0.02 * jax.random.normal(key, shape),
                (a, wbins, D, 2))
            t = ln(y, f"block{i}_norm1").reshape(B, a, a, D)
            f = jnp.fft.rfft2(t, axes=(1, 2), norm="ortho")
            f = f * jax.lax.complex(w[..., 0], w[..., 1])
            t = jnp.fft.irfft2(f, s=(a, a), axes=(1, 2), norm="ortho")
            t = ln(t.reshape(B, -1, D), f"block{i}_norm2")
            k1, b1 = _declare_linear_torch(self, f"block{i}_fc1", D,
                                           D * self.mlp_ratio)
            k2, b2 = _declare_linear_torch(self, f"block{i}_fc2",
                                           D * self.mlp_ratio, D)
            y = y + (jax.nn.gelu(t @ k1 + b1) @ k2 + b2)

        y = jnp.mean(y, axis=1)
        hk, hb = _declare_linear_torch(self, "head", D, self.num_classes)
        return jax.nn.softmax(y @ hk + hb, axis=1)


def _rel_to_abs(x):
    """Relative->absolute index trick (ref ``HaloAttention.py:21-33``)."""
    b, l, m = x.shape
    r = (m + 1) // 2
    x = jnp.concatenate([x, jnp.zeros((b, l, 1), x.dtype)], axis=2)
    flat = jnp.concatenate(
        [x.reshape(b, -1), jnp.zeros((b, m - l), x.dtype)], axis=1)
    final = flat.reshape(b, l + 1, m)
    return final[:, :l, -r:]


def _relative_logits_1d(q, rel_k):
    b, h, w, _ = q.shape
    r = (rel_k.shape[0] + 1) // 2
    logits = jnp.einsum("bxyd,rd->bxyr", q, rel_k)
    logits = _rel_to_abs(logits.reshape(b * h, w, -1))
    logits = logits.reshape(b, h, w, r)
    return jnp.broadcast_to(logits[:, :, None], (b, h, r, w, r))


class HaloAttention(nn.Module):
    """Halo (blocked local) attention (ref ``attention:/HaloAttention.py``).
    NCHW. The vendored padding mask is INVERTED (fills valid positions) —
    reproduced faithfully."""

    dim: int
    block_size: int
    halo_size: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        block, halo, heads = self.block_size, self.halo_size, self.heads
        inner = self.dim_head * heads
        rel_size = block + 2 * halo
        scale = self.dim_head ** -0.5

        qk, _ = _declare_linear_torch(self, "to_q", C, inner, use_bias=False)
        kvk, _ = _declare_linear_torch(self, "to_kv", C, inner * 2,
                                       use_bias=False)
        ok, ob = _declare_linear_torch(self, "to_out", inner, C)
        rinit = lambda key, shape: scale * jax.random.normal(key, shape)
        rel_h = self.param("rel_height", rinit,
                           (rel_size * 2 - 1, self.dim_head))
        rel_w = self.param("rel_width", rinit,
                           (rel_size * 2 - 1, self.dim_head))

        nh, nw = H // block, W // block
        nblocks = nh * nw
        # queries: non-overlapping blocks -> [(B nh nw), block^2, C]
        q_inp = x.reshape(B, C, nh, block, nw, block).transpose(
            0, 2, 4, 3, 5, 1).reshape(B * nblocks, block * block, C)
        # keys/values: haloed blocks via unfold(k=block+2halo, stride=block)
        kv_cols, _ = _unfold(x, rel_size, halo, stride=block)
        kv_inp = kv_cols.reshape(B, C, rel_size * rel_size,
                                 nblocks).transpose(0, 3, 2, 1).reshape(
            B * nblocks, rel_size * rel_size, C)

        q = q_inp @ qk
        kv = kv_inp @ kvk
        k, v = jnp.split(kv, 2, axis=-1)

        def merge_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, heads, self.dim_head).transpose(
                0, 2, 1, 3).reshape(b * heads, n, self.dim_head)

        q, k, v = map(merge_heads, (q, k, v))
        q = q * scale
        sim = jnp.einsum("bid,bjd->bij", q, k)

        # relative positional bias
        qb = q.reshape(-1, block, block, self.dim_head)
        rl_w = _relative_logits_1d(qb, rel_w)
        # 'b x i y j -> b (x y) (i j)'
        rl_w = rl_w.transpose(0, 1, 3, 2, 4).reshape(
            -1, block * block, rel_size * rel_size)
        qb_t = qb.transpose(0, 2, 1, 3)
        rl_h = _relative_logits_1d(qb_t, rel_h)
        # 'b x i y j -> b (y x) (j i)'
        rl_h = rl_h.transpose(0, 3, 1, 4, 2).reshape(
            -1, block * block, rel_size * rel_size)
        sim = sim + rl_w + rl_h

        # the vendored mask bug: valid positions (unfold of ones == 1) are
        # filled with -finfo.max
        ones = jnp.ones((1, 1, H, W), x.dtype)
        mcols, _ = _unfold(ones, rel_size, halo, stride=block)
        mask = mcols.reshape(rel_size * rel_size, nblocks).T > 0  # [i, j]
        mask = jnp.broadcast_to(
            mask[None, :, :], (B, nblocks, rel_size * rel_size)).reshape(
            B * nblocks, 1, -1)
        mask = jnp.repeat(mask, heads, axis=0).reshape(
            B * nblocks * heads, 1, -1)
        # note: vendored repeat pattern '() j i -> (b i h) () j' interleaves
        # batch/blocks/heads the same way as our q layout (b, blocks, heads)
        sim = jnp.where(mask, -jnp.finfo(sim.dtype).max, sim)

        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bij,bjd->bid", attn, v)
        out = out.reshape(-1, heads, block * block, self.dim_head).transpose(
            0, 2, 1, 3).reshape(-1, block * block, inner)
        out = out @ ok + ob
        out = out.reshape(B, nh, nw, block, block, C).transpose(
            0, 5, 1, 3, 2, 4).reshape(B, C, H, W)
        return out


class ACmix(nn.Module):
    """ACmix (ref ``attention:/ACmixAttention.py:29-104``): shared 1x1 qkv
    feeding a local-window attention branch and a shift-conv branch, mixed
    by learnable rates (0.5 init). NCHW, stride 1."""

    in_planes: int
    out_planes: int
    kernel_att: int = 7
    head: int = 4
    kernel_conv: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        head, hd = self.head, self.out_planes // self.head
        ka, kc = self.kernel_att, self.kernel_conv
        rate1 = self.param("rate1", lambda k, s: 0.5 * jnp.ones(s), (1,))
        rate2 = self.param("rate2", lambda k, s: 0.5 * jnp.ones(s), (1,))
        k1, b1 = _declare_conv(self, "conv1", C, self.out_planes, 1)
        k2, b2 = _declare_conv(self, "conv2", C, self.out_planes, 1)
        k3, b3 = _declare_conv(self, "conv3", C, self.out_planes, 1)
        kp, bp = _declare_conv(self, "conv_p", 2, hd, 1)
        fk, _ = _declare_conv(self, "fc", 3 * head, kc * kc, 1,
                              use_bias=False)
        # dep_conv: identity-shift init; NO bias — the reference's
        # reset_parameters assigns `self.dep_conv.bias = init_rate_0(...)`
        # which returns None, removing the bias (ACmixAttention.py:66)
        eye = jnp.zeros((kc, kc, kc * kc), jnp.float32)
        for i in range(kc * kc):
            eye = eye.at[i // kc, i % kc, i].set(1.0)
        dk = self.param(
            "dep_conv_kernel",
            lambda key, shape: jnp.broadcast_to(eye[:, :, :, None], shape),
            (kc, kc, kc * kc, self.out_planes))

        q = _conv2d(x, k1, b1)
        k = _conv2d(x, k2, b2)
        v = _conv2d(x, k3, b3)
        scaling = hd ** -0.5

        # position encodings
        loc_w = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, W)[None], (H, W))
        loc_h = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, H)[:, None], (H, W))
        loc = jnp.stack([loc_w, loc_h])[None]  # [1, 2, H, W]
        pe = _conv2d(loc, kp, bp)  # [1, hd, H, W]

        q_att = q.reshape(B * head, hd, H, W) * scaling
        k_att = k.reshape(B * head, hd, H, W)
        v_att = v.reshape(B * head, hd, H, W)

        pad = (self.dilation * (ka - 1) + 1) // 2

        def unfold_reflect(t):
            tp = jnp.pad(t, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                         mode="reflect")
            cols, _ = _unfold(tp, ka, 0)
            return cols.reshape(t.shape[0], t.shape[1], ka * ka, H, W)

        unfold_k = unfold_reflect(k_att)
        unfold_rpe = unfold_reflect(pe)
        att = jnp.sum(
            q_att[:, :, None] * (unfold_k + pe[:, :, None] - unfold_rpe),
            axis=1)  # [B*head, ka*ka, H, W]
        att = jax.nn.softmax(att, axis=1)
        out_att = jnp.sum(att[:, None] * unfold_reflect(v_att),
                          axis=2).reshape(B, self.out_planes, H, W)

        f_all = jnp.concatenate(
            [t.reshape(B, head, hd, H * W) for t in (q, k, v)], axis=1)
        f_all = jnp.einsum("bchn,co->bohn", f_all, fk[0, 0])  # [B,kc*kc,hd,N]
        f_conv = f_all.transpose(0, 2, 1, 3).reshape(B, hd * kc * kc, H, W)
        out_conv = _conv2d(f_conv, dk, padding=1, groups=hd)
        return rate1 * out_att + rate2 * out_conv


class AxialAttention(nn.Module):
    """Axial attention (ref ``attention:/Axial_attention.py:262-285``):
    multi-head self-attention along each spatial axis independently,
    contributions summed. NCHW (dim_index=1) like the vendored demo."""

    dim: int
    num_dimensions: int = 2
    heads: int = 8
    dim_heads: int | None = None

    @nn.compact
    def __call__(self, x):
        B, C = x.shape[0], x.shape[1]
        hd = self.dim_heads if self.dim_heads is not None else C // self.heads
        inner = hd * self.heads

        def axis_attention(t, name):
            # t: [N, L, C] merged batch, one axis as sequence
            qk, _ = _declare_linear_torch(self, f"{name}_to_q", C, inner,
                                          use_bias=False)
            kvk, _ = _declare_linear_torch(self, f"{name}_to_kv", C,
                                           2 * inner, use_bias=False)
            ok, ob = _declare_linear_torch(self, f"{name}_to_out", inner, C)
            q = t @ qk
            k, v = jnp.split(t @ kvk, 2, axis=-1)
            n = t.shape[0]

            def mh(a):
                return a.reshape(n, -1, self.heads, hd).transpose(
                    0, 2, 1, 3).reshape(n * self.heads, -1, hd)

            q, k, v = map(mh, (q, k, v))
            dots = jax.nn.softmax(
                jnp.einsum("bie,bje->bij", q, k) * hd ** -0.5, axis=-1)
            out = jnp.einsum("bij,bje->bie", dots, v)
            out = out.reshape(n, self.heads, -1, hd).transpose(
                0, 2, 1, 3).reshape(n, -1, inner)
            return out @ ok + ob

        assert x.ndim == self.num_dimensions + 2
        H, W = x.shape[2], x.shape[3]
        # axis H: permute [B, W, H, C] -> merge (B W)
        th = x.transpose(0, 3, 2, 1).reshape(B * W, H, C)
        out_h = axis_attention(th, "axis0").reshape(B, W, H, C).transpose(
            0, 3, 2, 1)
        # axis W: permute [B, H, W, C] -> merge (B H)
        tw = x.transpose(0, 2, 3, 1).reshape(B * H, W, C)
        out_w = axis_attention(tw, "axis1").reshape(B, H, W, C).transpose(
            0, 3, 1, 2)
        return out_h + out_w


class MBConvBlock(nn.Module):
    """Standard EfficientNet MBConv (expand -> depthwise -> SE -> project).
    Stands in for the reference's missing ``model/conv/MBConv.py`` import
    (CoAtNet is a broken vendored file). NCHW."""

    ksize: int
    input_filters: int
    output_filters: int
    expand_ratio: int = 1
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        cin = self.input_filters
        mid = cin * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            ek, _ = _declare_conv(self, "expand", cin, mid, 1, use_bias=False)
            ebn = _declare_bn(self, "expand_bn", mid)
            y = ebn(_conv2d(y, ek))
            y = y * jax.nn.sigmoid(y)
        dk, _ = _declare_conv(self, "dw", mid, mid, self.ksize, groups=mid,
                              use_bias=False)
        dbn = _declare_bn(self, "dw_bn", mid)
        y = dbn(_conv2d(y, dk, padding=self.ksize // 2, groups=mid))
        y = y * jax.nn.sigmoid(y)
        se_c = max(1, int(cin * self.se_ratio))
        s1, sb1 = _declare_conv(self, "se_reduce", mid, se_c, 1)
        s2, sb2 = _declare_conv(self, "se_expand", se_c, mid, 1)
        pooled = jnp.mean(y, axis=(2, 3), keepdims=True)
        g = _conv2d(pooled, s1, sb1)
        g = g * jax.nn.sigmoid(g)
        y = y * jax.nn.sigmoid(_conv2d(g, s2, sb2))
        pk, _ = _declare_conv(self, "project", mid, self.output_filters, 1,
                              use_bias=False)
        pbn = _declare_bn(self, "project_bn", self.output_filters)
        y = pbn(_conv2d(y, pk))
        if self.input_filters == self.output_filters:
            y = y + x
        return y


class CoAtNet(nn.Module):
    """CoAtNet pyramid (ref ``attention:/CoAtNet.py:9-79``): conv stem, two
    MBConv stages, two attention stages, staged pooling. NCHW images."""

    in_ch: int
    image_size: int
    out_chs: tuple = (64, 96, 192, 384, 768)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, C, H, W = x.shape
        oc = self.out_chs

        def conv_mlp(name, cin, cout, t):
            a, ab = _declare_conv(self, f"{name}_0", cin, cout, 1)
            b, bb = _declare_conv(self, f"{name}_2", cout, cout, 1)
            return _conv2d(jax.nn.relu(_conv2d(t, a, ab)), b, bb)

        def maxpool2d(t):
            return -jax.lax.reduce_window(
                -t, jnp.inf, jax.lax.min, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")

        s0a, s0ab = _declare_conv(self, "s0_0", C, C, 3)
        s0b, s0bb = _declare_conv(self, "s0_2", C, C, 3)
        y = _conv2d(jax.nn.relu(_conv2d(x, s0a, s0ab, padding=1)), s0b, s0bb,
                    padding=1)
        y = maxpool2d(conv_mlp("mlp0", C, oc[0], y))
        y = MBConvBlock(3, oc[0], oc[0], name="s1")(y)
        y = maxpool2d(conv_mlp("mlp1", oc[0], oc[1], y))
        y = MBConvBlock(3, oc[1], oc[1], name="s2")(y)
        y = maxpool2d(conv_mlp("mlp2", oc[1], oc[2], y))

        Bc, Cc, Hc, Wc = y.shape
        y = y.reshape(Bc, Cc, -1).transpose(0, 2, 1)  # [B, N, C]
        y = ScaledDotProductAttention(oc[2], oc[2] // 8, oc[2] // 8, 8,
                                      name="s3")(y, y, y,
                                                 deterministic=deterministic)
        w1, b1 = _declare_linear_torch(self, "mlp3_0", oc[2], oc[3])
        w2, b2 = _declare_linear_torch(self, "mlp3_2", oc[3], oc[3])
        y = jax.nn.relu(y @ w1 + b1) @ w2 + b2
        # MaxPool1d(2) over the sequence
        n2 = y.shape[1] // 2
        y = jnp.max(y[:, : 2 * n2].reshape(Bc, n2, 2, -1), axis=2)
        y = ScaledDotProductAttention(oc[3], oc[3] // 8, oc[3] // 8, 8,
                                      name="s4")(y, y, y,
                                                 deterministic=deterministic)
        w3, b3 = _declare_linear_torch(self, "mlp4_0", oc[3], oc[4])
        w4, b4 = _declare_linear_torch(self, "mlp4_2", oc[4], oc[4])
        y = jax.nn.relu(y @ w3 + b3) @ w4 + b4
        n4 = y.shape[1] // 2
        y = jnp.max(y[:, : 2 * n4].reshape(Bc, n4, 2, -1), axis=2)
        side = int(n4 ** 0.5)
        return y.transpose(0, 2, 1).reshape(Bc, oc[4], side, side)
