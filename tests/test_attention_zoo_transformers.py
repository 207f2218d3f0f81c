"""Swin-family backbone tranche (CrossFormer, MOATransformer, DAT):
weight-transfer oracles vs the actual vendored torch files."""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.medium

REF_ATT = "/root/reference/attention:"

ref_available = pytest.mark.skipif(
    not os.path.isdir(REF_ATT), reason="reference checkout not available")


def _load_ref(name):
    import importlib.util

    sys.modules.setdefault("imp", types.ModuleType("imp"))
    if "timm" not in sys.modules:
        import torch.nn as tnn

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        def trunc_normal_(t, std=1.0, **kw):
            with __import__("torch").no_grad():
                t.normal_(0.0, std)
            return t

        layers.DropPath = DropPath
        layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        layers.trunc_normal_ = trunc_normal_
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    spec = importlib.util.spec_from_file_location(
        f"refattt_{name}", os.path.join(REF_ATT, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cw(t):
    return np.asarray(t.detach()).transpose(2, 3, 1, 0)


def _lw(t):
    return np.asarray(t.detach()).T


def _a(t):
    return np.asarray(t.detach())


def _lin(p, prefix, mod, bias=True):
    p[f"{prefix}_kernel"] = _lw(mod.weight)
    if bias and mod.bias is not None:
        p[f"{prefix}_bias"] = _a(mod.bias)


def _lnp(p, prefix, mod):
    p[f"{prefix}_scale"] = _a(mod.weight)
    p[f"{prefix}_bias"] = _a(mod.bias)


def _conv(p, prefix, mod, bias=True):
    p[f"{prefix}_kernel"] = _cw(mod.weight)
    if bias and mod.bias is not None:
        p[f"{prefix}_bias"] = _a(mod.bias)


def _run(mod, params, x):
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return np.asarray(mod.apply({"params": params}, x))


@ref_available
def test_crossformer_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_transformers import CrossFormer

    ref_mod = _load_ref("Crossformer")
    torch.manual_seed(0)
    ref = ref_mod.CrossFormer(
        img_size=32, patch_size=[4, 8], in_chans=3, num_classes=10,
        embed_dim=32, depths=[2, 2], num_heads=[2, 4], group_size=[4, 4],
        mlp_ratio=4.0, drop_path_rate=0.0, merge_size=[[2, 4]])
    ref.eval()
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    p = {}
    for i, proj in enumerate(ref.patch_embed.projs):
        _conv(p, f"patch_proj{i}", proj)
    _lnp(p, "patch_norm", ref.patch_embed.norm)
    for i, layer in enumerate(ref.layers):
        for d, blk in enumerate(layer.blocks):
            pre = f"layer{i}_block{d}"
            _lnp(p, f"{pre}_norm1", blk.norm1)
            _lnp(p, f"{pre}_norm2", blk.norm2)
            _lin(p, f"{pre}_attn_qkv", blk.attn.qkv)
            _lin(p, f"{pre}_attn_proj", blk.attn.proj)
            _lin(p, f"{pre}_attn_pos_proj", blk.attn.pos.pos_proj)
            for j in (1, 2, 3):
                seq = getattr(blk.attn.pos, f"pos{j}")
                _lnp(p, f"{pre}_attn_pos{j}_ln", seq[0])
                _lin(p, f"{pre}_attn_pos{j}_fc", seq[2])
            _lin(p, f"{pre}_mlp_fc1", blk.mlp.fc1)
            _lin(p, f"{pre}_mlp_fc2", blk.mlp.fc2)
        if layer.downsample is not None:
            _lnp(p, f"layer{i}_merge_norm", layer.downsample.norm)
            for j, red in enumerate(layer.downsample.reductions):
                _conv(p, f"layer{i}_merge_red{j}", red)
    _lnp(p, "norm", ref.norm)
    _lin(p, "head", ref.head)

    mine = CrossFormer(img_size=32, patch_size=(4, 8), num_classes=10,
                       embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                       group_size=(4, 4), merge_size=((2, 4),))
    out = _run(mine, p, jnp.asarray(x))
    np.testing.assert_allclose(out, _a(want), rtol=2e-4, atol=2e-4)


@ref_available
def test_moa_transformer_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_transformers import MOATransformer

    ref_mod = _load_ref("MOATransformer")
    torch.manual_seed(1)
    ref = ref_mod.MOATransformer(
        img_size=112, patch_size=4, in_chans=3, num_classes=10,
        embed_dim=32, depths=[2, 2], num_heads=[2, 4], window_size=14,
        mlp_ratio=4.0, drop_path_rate=0.0)
    ref.eval()
    x = np.random.default_rng(1).standard_normal((1, 3, 112, 112)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    p = {}
    _conv(p, "patch_proj", ref.patch_embed.proj)
    _lnp(p, "patch_norm", ref.patch_embed.norm)
    for i, layer in enumerate(ref.layers):
        for d, blk in enumerate(layer.blocks):
            pre = f"layer{i}_block{d}"
            _lnp(p, f"{pre}_norm1", blk.norm1)
            _lnp(p, f"{pre}_norm2", blk.norm2)
            p[f"{pre}_attn_rpb_table"] = _a(
                blk.attn.relative_position_bias_table)
            _lin(p, f"{pre}_attn_qkv", blk.attn.qkv)
            _lin(p, f"{pre}_attn_proj", blk.attn.proj)
            _lin(p, f"{pre}_mlp_fc1", blk.mlp.fc1)
            _lin(p, f"{pre}_mlp_fc2", blk.mlp.fc2)
        if layer.downsample is not None:
            if layer.glb_attn is not None:
                _lnp(p, f"layer{i}_gnorm1", layer.norm1)
                _lnp(p, f"layer{i}_gnorm2", layer.norm2)
                _conv(p, f"layer{i}_post_conv", layer.post_conv)
                g = layer.glb_attn
                _conv(p, f"layer{i}_glb_pre_conv", g.pre_conv)
                p[f"layer{i}_glb_rpb_table"] = _a(
                    g.relative_position_bias_table)
                _lin(p, f"layer{i}_glb_q", g.q)
                _lin(p, f"layer{i}_glb_kv", g.kv)
                _lin(p, f"layer{i}_glb_proj", g.proj)
            _lnp(p, f"layer{i}_merge_norm", layer.downsample.norm)
            _lin(p, f"layer{i}_merge_red", layer.downsample.reduction,
                 bias=False)
    _lnp(p, "norm", ref.norm)
    _lin(p, "head", ref.head)

    mine = MOATransformer(img_size=112, patch_size=4, num_classes=10,
                          embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                          window_size=14)
    out = _run(mine, p, jnp.asarray(x))
    np.testing.assert_allclose(out, _a(want), rtol=2e-4, atol=2e-4)


@ref_available
def test_dat_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_transformers import DAT

    ref_mod = _load_ref("DAT")
    torch.manual_seed(2)
    cfg = dict(
        img_size=64, patch_size=4, num_classes=10, expansion=4,
        dim_stem=16, dims=[16, 32, 64, 128], depths=[2, 2, 2, 2],
        stage_spec=[["L", "S"], ["L", "S"], ["L", "D"], ["L", "D"]],
        heads=[2, 2, 4, 4], window_sizes=[4, 4, 4, 2],
        groups=[-1, -1, 2, 2], use_pes=[False, False, True, True],
        dwc_pes=[False, False, False, False], strides=[-1, -1, 1, 1],
        sr_ratios=[-1, -1, -1, -1], offset_range_factor=[-1, -1, 2, 2],
        no_offs=[False, False, False, False],
        fixed_pes=[False, False, False, False],
        use_dwc_mlps=[False, False, False, False], use_conv_patches=False,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    ref = ref_mod.DAT(**cfg)
    ref.eval()
    x = np.random.default_rng(2).standard_normal((1, 3, 64, 64)).astype(
        np.float32)
    with torch.no_grad():
        want, _, _ = ref(torch.tensor(x))

    p = {}
    _conv(p, "patch_proj", ref.patch_proj[0])
    _lnp(p, "patch_norm", ref.patch_proj[1].norm)
    for i, stage in enumerate(ref.stages):
        for d in range(stage.depths):
            pre = f"stage{i}_block{d}"
            _lnp(p, f"{pre}_norm1", stage.layer_norms[2 * d].norm)
            _lnp(p, f"{pre}_norm2", stage.layer_norms[2 * d + 1].norm)
            att = stage.attns[d]
            spec = cfg["stage_spec"][i][d]
            if spec in ("L", "S"):
                p[f"{pre}_attn_rpb_table"] = _a(
                    att.relative_position_bias_table)
                _lin(p, f"{pre}_attn_qkv", att.proj_qkv)
                _lin(p, f"{pre}_attn_proj", att.proj_out)
            else:  # D
                _conv(p, f"{pre}_attn_proj_q", att.proj_q)
                _conv(p, f"{pre}_attn_proj_k", att.proj_k)
                _conv(p, f"{pre}_attn_proj_v", att.proj_v)
                _conv(p, f"{pre}_attn_proj_out", att.proj_out)
                _conv(p, f"{pre}_attn_off_conv", att.conv_offset[0])
                _lnp(p, f"{pre}_attn_off_ln", att.conv_offset[1].norm)
                _conv(p, f"{pre}_attn_off_out", att.conv_offset[3],
                      bias=False)
                p[f"{pre}_attn_rpe_table"] = _a(att.rpe_table)
            mlp = stage.mlps[d]
            _lin(p, f"{pre}_mlp_fc1", mlp.chunk.linear1)
            _lin(p, f"{pre}_mlp_fc2", mlp.chunk.linear2)
    for i, down in enumerate(ref.down_projs):
        _conv(p, f"down{i}", down[0], bias=False)
        _lnp(p, f"down{i}_norm", down[1].norm)
    _lnp(p, "cls_norm", ref.cls_norm.norm)
    _lin(p, "cls_head", ref.cls_head)

    mine = DAT(img_size=64, patch_size=4, num_classes=10, dim_stem=16,
               dims=(16, 32, 64, 128), depths=(2, 2, 2, 2),
               heads=(2, 2, 4, 4), window_sizes=(4, 4, 4, 2),
               strides=(-1, -1, 1, 1), offset_range_factor=(-1, -1, 2, 2),
               stage_spec=(("L", "S"), ("L", "S"), ("L", "D"), ("L", "D")),
               groups=(-1, -1, 2, 2), use_pes=(False, False, True, True))
    out = _run(mine, p, jnp.asarray(x))
    np.testing.assert_allclose(out, _a(want), rtol=3e-4, atol=3e-4)
