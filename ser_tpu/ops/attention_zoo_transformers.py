"""Attention-zoo: Swin-family transformer backbones (catalog tail).

The last three vendored catalog members — CrossFormer, MOATransformer, and
DAT (Vision Transformer with Deformable Attention) — are full hierarchical
backbones derived from Swin. Eval-path ports (dropout/drop-path are
inference no-ops at the vendored defaults), weight-transfer oracle-tested
against the vendored torch files.

Shared TPU-first infra: window partition/reverse as pure reshapes, the Swin
relative-position index precomputed host-side as a static numpy gather
table, and a bilinear ``grid_sample`` (align_corners=True, zero padding)
built from one gather + fused lerp for DAT's deformable sampling.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ser_tpu.ops.attention_zoo import (
    _conv2d,
    _declare_conv,
    _declare_linear_torch,
    _ones,
    _zeros,
)


def _trunc01(key, shape, dtype=jnp.float32):
    return 0.01 * jax.random.normal(key, shape, dtype)


def _ln(module, name, d):
    scale = module.param(f"{name}_scale", _ones, (d,))
    bias = module.param(f"{name}_bias", _zeros, (d,))

    def apply(t):
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
        return (t - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    return apply


def window_partition(x, ws):
    """[B, H, W, C] -> [B*nW, ws*ws, C] (Swin layout)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(w, ws, H, W):
    """[B*nW, ws*ws, C] -> [B, H, W, C]."""
    C = w.shape[-1]
    B = w.shape[0] // (H * W // ws // ws)
    x = w.reshape(B, H // ws, W // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index(Wh, Ww):
    """Swin pair-wise relative position index table [Wh*Ww, Wh*Ww]."""
    coords = np.stack(np.meshgrid(np.arange(Wh), np.arange(Ww),
                                  indexing="ij"))  # 2, Wh, Ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += Wh - 1
    rel[:, :, 1] += Ww - 1
    rel[:, :, 0] *= 2 * Ww - 1
    return rel.sum(-1)


def grid_sample_bilinear(x, grid):
    """torch ``F.grid_sample(mode='bilinear', align_corners=True,
    padding_mode='zeros')``. x: [B, C, H, W]; grid: [B, Hg, Wg, 2] in
    (x, y) order over [-1, 1]. Returns [B, C, Hg, Wg]."""
    B, C, H, W = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        flat = (yc * W + xc).reshape(B, -1)  # [B, Hg*Wg]
        vals = jnp.take_along_axis(
            x.reshape(B, C, H * W), flat[:, None, :], axis=2)
        return vals * valid.reshape(B, 1, -1)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wxf = wx.reshape(B, 1, -1)
    wyf = wy.reshape(B, 1, -1)
    out = (v00 * (1 - wxf) * (1 - wyf) + v01 * wxf * (1 - wyf)
           + v10 * (1 - wxf) * wyf + v11 * wxf * wyf)
    return out.reshape(B, C, *grid.shape[1:3])


# =========================================================================
# CrossFormer (ref attention:/Crossformer.py)
# =========================================================================

class CrossFormer(nn.Module):
    """CrossFormer (ref ``Crossformer.py:478-620``): multi-scale patch
    embedding, alternating short/long-distance group attention with dynamic
    position bias, multi-kernel patch merging. NCHW images in,
    [B, num_classes] out."""

    img_size: int = 224
    patch_size: tuple = (4, 8)
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    group_size: tuple = (7, 7, 7, 7)
    mlp_ratio: float = 4.0
    merge_size: tuple = ((2, 4), (2, 4), (2, 4))

    def _dyn_pos_bias(self, prefix, dim, heads, biases):
        """DynamicPosBias (ref ``Crossformer.py:25-56``, residual=False).
        The vendored Attention passes dim//4 and DynamicPosBias divides by
        4 again, so pos_dim = dim // 16."""
        pd = dim // 16
        pk, pb = _declare_linear_torch(self, f"{prefix}_pos_proj", 2, pd)
        pos = biases @ pk + pb
        for i, dout in ((1, pd), (2, pd), (3, heads)):
            lnf = _ln(self, f"{prefix}_pos{i}_ln", pd)
            k, b = _declare_linear_torch(self, f"{prefix}_pos{i}_fc", pd,
                                         dout)
            pos_in = jax.nn.relu(lnf(pos))
            pos = pos_in @ k + b
        return pos  # [(2G-1)^2, heads]

    def _attention(self, prefix, x, dim, heads, G):
        """Group attention with dynamic relative position bias
        (ref ``Crossformer.py:64-155``)."""
        B_, N, C = x.shape
        hd = dim // heads
        qkvk, qkvb = _declare_linear_torch(self, f"{prefix}_qkv", dim,
                                           3 * dim)
        prk, prb = _declare_linear_torch(self, f"{prefix}_proj", dim, dim)

        qkv = (x @ qkvk + qkvb).reshape(B_, N, 3, heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2))

        ph = np.arange(1 - G, G)
        bias_grid = np.stack(np.meshgrid(ph, ph, indexing="ij")).reshape(
            2, -1).T.astype(np.float32)
        pos = self._dyn_pos_bias(prefix, dim, heads, jnp.asarray(bias_grid))
        idx = relative_position_index(G, G).reshape(-1)
        rel = pos[idx].reshape(G * G, G * G, heads).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + rel[None], axis=-1)

        out = jnp.matmul(attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return out @ prk + prb

    def _block(self, prefix, x, res, dim, heads, G, lsda_flag):
        H, W = res
        B, L, C = x.shape
        if min(res) <= G:
            lsda_flag, G = 0, min(res)
        shortcut = x
        x = _ln(self, f"{prefix}_norm1", dim)(x).reshape(B, H, W, C)
        if lsda_flag == 0:  # SDA: contiguous G x G groups
            x = x.reshape(B, H // G, G, W // G, G, C).transpose(
                0, 1, 3, 2, 4, 5)
        else:  # LDA: dilated groups
            x = x.reshape(B, G, H // G, G, W // G, C).transpose(
                0, 2, 4, 1, 3, 5)
        x = x.reshape(B * H * W // G ** 2, G ** 2, C)
        x = self._attention(f"{prefix}_attn", x, dim, heads, G)
        x = x.reshape(B, H // G, W // G, G, G, C)
        if lsda_flag == 0:
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        else:
            x = x.transpose(0, 3, 1, 4, 2, 5).reshape(B, H, W, C)
        x = shortcut + x.reshape(B, L, C)

        h = _ln(self, f"{prefix}_norm2", dim)(x)
        hid = int(dim * self.mlp_ratio)
        k1, b1 = _declare_linear_torch(self, f"{prefix}_mlp_fc1", dim, hid)
        k2, b2 = _declare_linear_torch(self, f"{prefix}_mlp_fc2", hid, dim)
        return x + (jax.nn.gelu(h @ k1 + b1) @ k2 + b2)

    def _merge(self, prefix, x, res, dim, patch_sizes):
        """Multi-kernel PatchMerging (ref ``Crossformer.py:283-318``)."""
        H, W = res
        B = x.shape[0]
        x = _ln(self, f"{prefix}_norm", dim)(x)
        x = x.reshape(B, H, W, dim).transpose(0, 3, 1, 2)
        outs = []
        for i, ps in enumerate(patch_sizes):
            out_dim = 2 * dim // 2 ** i if i == len(patch_sizes) - 1 \
                else 2 * dim // 2 ** (i + 1)
            kern, bias = _declare_conv(self, f"{prefix}_red{i}", dim,
                                       out_dim, ps)
            y = _conv2d(x, kern, bias, stride=2, padding=(ps - 2) // 2)
            outs.append(y.reshape(B, out_dim, -1).transpose(0, 2, 1))
        return jnp.concatenate(outs, axis=2)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        D = self.embed_dim
        res = self.img_size // self.patch_size[0]

        # multi-scale patch embedding
        embeds = []
        for i, ps in enumerate(self.patch_size):
            dim = D // 2 ** i if i == len(self.patch_size) - 1 \
                else D // 2 ** (i + 1)
            kern, bias = _declare_conv(self, f"patch_proj{i}", self.in_chans,
                                       dim, ps)
            y = _conv2d(x, kern, bias, stride=self.patch_size[0],
                        padding=(ps - self.patch_size[0]) // 2)
            embeds.append(y.reshape(B, dim, -1).transpose(0, 2, 1))
        y = jnp.concatenate(embeds, axis=2)
        y = _ln(self, "patch_norm", D)(y)

        n_layers = len(self.depths)
        for i in range(n_layers):
            dim = int(D * 2 ** i)
            r = (res // 2 ** i, res // 2 ** i)
            for d in range(self.depths[i]):
                y = self._block(f"layer{i}_block{d}", y, r, dim,
                                self.num_heads[i], self.group_size[i],
                                lsda_flag=0 if d % 2 == 0 else 1)
            if i < n_layers - 1:
                y = self._merge(f"layer{i}_merge", y, r, dim,
                                self.merge_size[i])

        nf = int(D * 2 ** (n_layers - 1))
        y = _ln(self, "norm", nf)(y)
        y = jnp.mean(y, axis=1)
        hk, hb = _declare_linear_torch(self, "head", nf, self.num_classes)
        return y @ hk + hb


# =========================================================================
# MOATransformer (ref attention:/MOATransformer.py)
# =========================================================================

class MOATransformer(nn.Module):
    """MOA transformer (ref ``MOATransformer.py:599-726``): Swin window
    attention blocks with a Multi-resolution Overlapped Attention (global)
    module at each stage boundary. NCHW images in, [B, num_classes] out.

    NOTE the vendored GlobalAttention hardcodes its key-unfold stride to 14
    (``MOATransformer.py:233``) — only window_size=14 geometries are
    self-consistent, exactly as in the vendored demo."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: tuple = (2, 2, 6)
    num_heads: tuple = (3, 6, 12)
    window_size: int = 14
    mlp_ratio: float = 4.0

    def _window_attention(self, prefix, x, dim, heads, ws):
        """Swin W-MSA with relative position bias
        (ref ``MOATransformer.py:66-148``)."""
        B_, N, C = x.shape
        hd = dim // heads
        table = self.param(f"{prefix}_rpb_table", _trunc01,
                           ((2 * ws - 1) ** 2, heads))
        qkvk, qkvb = _declare_linear_torch(self, f"{prefix}_qkv", dim,
                                           3 * dim)
        pk, pb = _declare_linear_torch(self, f"{prefix}_proj", dim, dim)

        qkv = (x @ qkvk + qkvb).reshape(B_, N, 3, heads, hd).transpose(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd ** -0.5, qkv[1], qkv[2]
        attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2))
        idx = relative_position_index(ws, ws).reshape(-1)
        rel = table[idx].reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + rel[None], axis=-1)
        out = jnp.matmul(attn, v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return out @ pk + pb

    def _global_attention(self, prefix, x, res, dim, heads):
        """MOA global attention (ref ``MOATransformer.py:166-280``)."""
        H, W = res
        B = x.shape[0]
        ws = self.window_size
        qs, ks = ws, ws + 2
        seq = H // qs
        red = max(1, dim // 32)
        hd = dim // heads

        pk, pb = _declare_conv(self, f"{prefix}_pre_conv", dim, red, 1)
        table = self.param(f"{prefix}_rpb_table", _trunc01,
                           ((2 * seq - 1) ** 2, heads))
        qdim = red * qs * qs
        kdim = red * ks * ks
        qk, qb = _declare_linear_torch(self, f"{prefix}_q", qdim, dim)
        kvk, kvb = _declare_linear_torch(self, f"{prefix}_kv", kdim,
                                         2 * dim)
        prk, prb = _declare_linear_torch(self, f"{prefix}_proj", dim, dim)

        # NOTE vendored quirk: x arrives as [B, HW, C] and is
        # `.reshape(-1, C, H, W)`-ed — a RAW reinterpretation, not a
        # permute; we reproduce the same raw reshape.
        t = x.reshape(B, dim, H, W)
        t = _conv2d(t, pk, pb)  # [B, red, H, W]
        # queryembedding: 'b c (h p1) (w p2) -> b (p1 p2 c) h w' then a RAW
        # `.view(B, -1, query_dim)` (layout scramble kept bit-for-bit)
        qe = t.reshape(B, red, seq, qs, seq, qs).transpose(
            0, 3, 5, 1, 2, 4).reshape(B, qs * qs * red, seq * seq)
        qe = qe.reshape(B, seq * seq, qdim)  # raw view, as vendored
        query = qe @ qk + qb  # [B, nW, dim]
        N = query.shape[1]
        q = query.reshape(B, N, heads, hd).transpose(0, 2, 1, 3) * hd ** -0.5

        # keyembedding: Unfold(k=ks, stride=14, padding=1) - torch unfold
        # channel order (c, ki, kj)
        from ser_tpu.ops.attention_zoo_vision import _unfold

        kcols, _ = _unfold(t, ks, 1, stride=14)
        key = kcols.reshape(B, -1, kdim)  # raw view, as vendored
        kv = (key @ kvk + kvb).reshape(B, N, 2, heads, hd).transpose(
            2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = jnp.matmul(q, jnp.swapaxes(k, -1, -2))
        idx = relative_position_index(seq, seq).reshape(-1)
        rel = table[idx].reshape(seq * seq, seq * seq, heads).transpose(
            2, 0, 1)
        attn = jax.nn.softmax(attn + rel[None], axis=-1)
        out = jnp.matmul(attn, v).transpose(0, 2, 1, 3).reshape(B, N, dim)
        return out @ prk + prb

    def _local_block(self, prefix, x, res, dim, heads):
        H, W = res
        B, L, C = x.shape
        ws = min(self.window_size, min(res))
        shortcut = x
        x = _ln(self, f"{prefix}_norm1", dim)(x).reshape(B, H, W, C)
        xw = window_partition(x, ws)
        xw = self._window_attention(f"{prefix}_attn", xw, dim, heads, ws)
        x = window_reverse(xw, ws, H, W).reshape(B, L, C)
        x = shortcut + x
        h = _ln(self, f"{prefix}_norm2", dim)(x)
        hid = int(dim * self.mlp_ratio)
        k1, b1 = _declare_linear_torch(self, f"{prefix}_mlp_fc1", dim, hid)
        k2, b2 = _declare_linear_torch(self, f"{prefix}_mlp_fc2", hid, dim)
        return x + (jax.nn.gelu(h @ k1 + b1) @ k2 + b2)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        D = self.embed_dim
        p = self.patch_size
        res = self.img_size // p

        kern, bias = _declare_conv(self, "patch_proj", self.in_chans, D, p)
        y = _conv2d(x, kern, bias, stride=p)
        y = y.reshape(B, D, -1).transpose(0, 2, 1)
        y = _ln(self, "patch_norm", D)(y)

        n_layers = len(self.depths)
        for i in range(n_layers):
            dim = int(D * 2 ** i)
            r = (res // 2 ** i, res // 2 ** i)
            for d in range(self.depths[i]):
                y = self._local_block(f"layer{i}_block{d}", y, r, dim,
                                      self.num_heads[i])
            if i < n_layers - 1:
                H, W = r
                ws = self.window_size
                if min(r) >= ws:
                    # local windows + broadcast global attention
                    shortcut = y
                    t = _ln(self, f"layer{i}_gnorm1", dim)(y)
                    nw = H * W // ws ** 2
                    local = t.reshape(B, nw, ws, ws, dim)
                    glb = self._global_attention(f"layer{i}_glb", t, r, dim,
                                                 self.num_heads[i])
                    glb = glb.reshape(B, nw, 1, 1, dim)
                    # NOTE vendored quirk: the sum is .view(B,C,H,W)-ed — a
                    # RESHAPE, not a layout permute — and added to
                    # shortcut.view(B,C,H,W); we reproduce the raw reshape.
                    t = (local + glb).reshape(B, H * W, dim)
                    y = shortcut + t
                    y = _ln(self, f"layer{i}_gnorm2", dim)(y)
                    ck, cb = _declare_conv(self, f"layer{i}_post_conv", dim,
                                           dim, 3)
                    # vendored: x.view(B,C,H,W) — raw reshape of [B, HW, C]
                    yc = y.reshape(B, dim, H, W)
                    yc = _conv2d(yc, ck, cb, padding=1)
                    y = y + yc.reshape(B, H * W, dim)
                # Swin PatchMerging (ref MOATransformer.py:395-432)
                t = y.reshape(B, H, W, dim)
                t = jnp.concatenate(
                    [t[:, 0::2, 0::2], t[:, 1::2, 0::2],
                     t[:, 0::2, 1::2], t[:, 1::2, 1::2]], axis=-1)
                t = t.reshape(B, -1, 4 * dim)
                t = _ln(self, f"layer{i}_merge_norm", 4 * dim)(t)
                rk, _ = _declare_linear_torch(self, f"layer{i}_merge_red",
                                              4 * dim, 2 * dim,
                                              use_bias=False)
                y = t @ rk

        nf = int(D * 2 ** (n_layers - 1))
        y = _ln(self, "norm", nf)(y)
        y = jnp.mean(y, axis=1)
        hk, hb = _declare_linear_torch(self, "head", nf, self.num_classes)
        return y @ hk + hb


# =========================================================================
# DAT — Vision Transformer with Deformable Attention (ref attention:/DAT.py)
# =========================================================================

class DAT(nn.Module):
    """DAT backbone (ref ``DAT.py:424-563``): 4 stages mixing Swin local
    ('L'), shifted-window ('S'), and deformable ('D') attention, each block
    followed by a transformer MLP. NCHW images in; returns class logits
    (positions/references are internals, exposed by the vendored model but
    unused downstream)."""

    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    expansion: int = 4
    dim_stem: int = 96
    dims: tuple = (96, 192, 384, 768)
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (3, 6, 12, 24)
    window_sizes: tuple = (7, 7, 7, 7)
    strides: tuple = (-1, -1, 1, 1)
    offset_range_factor: tuple = (-1, -1, 2, 2)
    stage_spec: tuple = (("L", "S"), ("L", "S"), ("L", "D"), ("L", "D"))
    groups: tuple = (-1, -1, 3, 6)
    use_pes: tuple = (False, False, True, True)

    def _ln_proxy(self, name, t, dim):
        """LayerNormProxy: channel-last LN applied to NCHW."""
        f = _ln(self, name, dim)
        return f(t.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)

    def _local_attention(self, prefix, x, dim, heads, ws, shift=0):
        """LocalAttention / ShiftWindowAttention (ref ``DAT.py:19-130``)."""
        B, C, H, W = x.shape
        hd = dim // heads
        table = self.param(f"{prefix}_rpb_table", _trunc01,
                           ((2 * ws - 1) ** 2, heads))
        qkvk, qkvb = _declare_linear_torch(self, f"{prefix}_qkv", dim,
                                           3 * dim)
        pk, pb = _declare_linear_torch(self, f"{prefix}_proj", dim, dim)

        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(2, 3))

        xw = window_partition(x.transpose(0, 2, 3, 1), ws)  # [B*nW, ws², C]
        qkv = (xw @ qkvk + qkvb)
        q, k, v = jnp.split(qkv, 3, axis=2)
        q = q * hd ** -0.5

        def mh(t):
            b, n, _ = t.shape
            return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(mh, (q, k, v))
        attn = jnp.einsum("bhmc,bhnc->bhmn", q, k)
        idx = relative_position_index(ws, ws).reshape(-1)
        rel = table[idx].reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
        attn = attn + rel[None]

        if shift:
            # Swin shift mask (ref DAT.py:105-122)
            img_mask = np.zeros((H, W), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[hs, wsl] = cnt
                    cnt += 1
            mw = window_partition(
                jnp.asarray(img_mask)[None, :, :, None], ws)[..., 0]
            amask = mw[:, None, :] - mw[:, :, None]
            amask = jnp.where(amask != 0, -100.0, 0.0)  # [nW, ws², ws²]
            nW = amask.shape[0]
            attn = attn.reshape(B, nW, heads, ws * ws, ws * ws) \
                + amask.reshape(1, nW, 1, ws * ws, ws * ws)
            attn = attn.reshape(B * nW, heads, ws * ws, ws * ws)

        attn = jax.nn.softmax(attn, axis=3)
        out = jnp.einsum("bhmn,bhnc->bhmc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(out.shape[0], ws * ws, dim)
        out = out @ pk + pb
        out = window_reverse(out, ws, H, W).transpose(0, 3, 1, 2)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(2, 3))
        return out

    def _deformable_attention(self, prefix, x, dim, heads, n_groups, stride,
                              off_factor, use_pe, stage_idx):
        """DAttentionBaseline (ref ``DAT.py:132-295``): offsets predicted
        from grouped queries, K/V bilinearly sampled at deformed points."""
        B, C, H, W = x.shape
        hd = dim // heads
        gc = dim // n_groups
        gh = heads // n_groups
        kk = [9, 7, 5, 3][stage_idx]

        qk_, qb_ = _declare_conv(self, f"{prefix}_proj_q", dim, dim, 1)
        kk_, kb_ = _declare_conv(self, f"{prefix}_proj_k", dim, dim, 1)
        vk_, vb_ = _declare_conv(self, f"{prefix}_proj_v", dim, dim, 1)
        ok_, ob_ = _declare_conv(self, f"{prefix}_proj_out", dim, dim, 1)
        ck_, cb_ = _declare_conv(self, f"{prefix}_off_conv", gc, gc, kk,
                                 groups=gc)
        c2k_, _ = _declare_conv(self, f"{prefix}_off_out", gc, 2, 1,
                                use_bias=False)
        if use_pe:
            rpe = self.param(f"{prefix}_rpe_table", _trunc01,
                             (heads, H * 2 - 1, W * 2 - 1))

        q = _conv2d(x, qk_, qb_)
        q_off = q.reshape(B * n_groups, gc, H, W)
        off = _conv2d(q_off, ck_, cb_, stride=stride, padding=kk // 2,
                      groups=gc)
        off = self._ln_proxy(f"{prefix}_off_ln", off, gc)
        off = _conv2d(jax.nn.gelu(off, approximate=False), c2k_)
        Hk, Wk = off.shape[2], off.shape[3]
        n_sample = Hk * Wk
        if off_factor > 0:
            rng = jnp.asarray([1.0 / Hk, 1.0 / Wk]).reshape(1, 2, 1, 1)
            off = jnp.tanh(off) * rng * off_factor
        off = off.transpose(0, 2, 3, 1)  # [B*g, Hk, Wk, 2] (y, x)

        def ref_points(hk, wk, n):
            ry = jnp.linspace(0.5, hk - 0.5, hk) / hk * 2 - 1
            rx = jnp.linspace(0.5, wk - 0.5, wk) / wk * 2 - 1
            ref = jnp.stack(jnp.meshgrid(ry, rx, indexing="ij"), axis=-1)
            return jnp.broadcast_to(ref[None], (n, hk, wk, 2))

        reference = ref_points(Hk, Wk, B * n_groups)
        if off_factor >= 0:
            pos = off + reference
        else:
            pos = jnp.tanh(off + reference)

        x_sampled = grid_sample_bilinear(
            x.reshape(B * n_groups, gc, H, W), pos[..., ::-1])  # (x, y)
        x_sampled = x_sampled.reshape(B, C, 1, n_sample)

        qf = q.reshape(B * heads, hd, H * W)
        kf = _conv2d(x_sampled, kk_, kb_).reshape(B * heads, hd, n_sample)
        vf = _conv2d(x_sampled, vk_, vb_).reshape(B * heads, hd, n_sample)
        attn = jnp.einsum("bcm,bcn->bmn", qf, kf) * hd ** -0.5

        if use_pe:
            rpe_bias = jnp.broadcast_to(
                rpe[None], (B, heads, H * 2 - 1, W * 2 - 1)).reshape(
                B * n_groups, gh, H * 2 - 1, W * 2 - 1)
            q_grid = ref_points(H, W, B * n_groups)
            disp = (q_grid.reshape(B * n_groups, H * W, 2)[:, :, None]
                    - pos.reshape(B * n_groups, n_sample, 2)[:, None]) * 0.5
            attn_bias = grid_sample_bilinear(rpe_bias, disp[..., ::-1])
            attn = attn + attn_bias.reshape(B * heads, H * W, n_sample)

        attn = jax.nn.softmax(attn, axis=2)
        out = jnp.einsum("bmn,bcn->bcm", attn, vf).reshape(B, C, H, W)
        return _conv2d(out, ok_, ob_)

    def _mlp(self, prefix, x, dim):
        """TransformerMLP (ref ``DAT.py:297-317``)."""
        B, C, H, W = x.shape
        hid = dim * self.expansion
        k1, b1 = _declare_linear_torch(self, f"{prefix}_fc1", dim, hid)
        k2, b2 = _declare_linear_torch(self, f"{prefix}_fc2", hid, dim)
        t = x.reshape(B, C, -1).transpose(0, 2, 1)
        t = jax.nn.gelu(t @ k1 + b1) @ k2 + b2
        return t.transpose(0, 2, 1).reshape(B, C, H, W)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import math

        B = x.shape[0]
        pk, pb = _declare_conv(self, "patch_proj", 3, self.dim_stem,
                               self.patch_size)
        y = _conv2d(x, pk, pb, stride=self.patch_size)
        y = self._ln_proxy("patch_norm", y, self.dim_stem)

        for i in range(4):
            dim_in = self.dim_stem if i == 0 else self.dims[i - 1] * 2
            dim = self.dims[i]
            if dim_in != dim:
                sk, sb = _declare_conv(self, f"stage{i}_proj", dim_in, dim, 1)
                y = _conv2d(y, sk, sb)
            ws = self.window_sizes[i]
            for d, spec in enumerate(self.stage_spec[i]):
                prefix = f"stage{i}_block{d}"
                y0 = y
                t = self._ln_proxy(f"{prefix}_norm1", y, dim)
                if spec == "L":
                    t = self._local_attention(f"{prefix}_attn", t, dim,
                                              self.heads[i], ws)
                elif spec == "S":
                    t = self._local_attention(
                        f"{prefix}_attn", t, dim, self.heads[i], ws,
                        shift=math.ceil(ws / 2))
                elif spec == "D":
                    t = self._deformable_attention(
                        f"{prefix}_attn", t, dim, self.heads[i],
                        self.groups[i], self.strides[i],
                        self.offset_range_factor[i], self.use_pes[i], i)
                else:
                    raise ValueError(spec)
                y = t + y0
                y0 = y
                t = self._ln_proxy(f"{prefix}_norm2", y, dim)
                y = self._mlp(f"{prefix}_mlp", t, dim) + y0
            if i < 3:
                dk, _ = _declare_conv(self, f"down{i}", self.dims[i],
                                      self.dims[i + 1], 2, use_bias=False)
                y = _conv2d(y, dk, stride=2)
                y = self._ln_proxy(f"down{i}_norm", y, self.dims[i + 1])

        y = self._ln_proxy("cls_norm", y, self.dims[-1])
        y = jnp.mean(y, axis=(2, 3))
        hk, hb = _declare_linear_torch(self, "cls_head", self.dims[-1],
                                       self.num_classes)
        return y @ hk + hb
