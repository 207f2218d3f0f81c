"""Vision-backbone attention tranche: weight-transfer oracles vs the actual
vendored torch modules (imported standalone from /root/reference/attention:/).

CoAtNet's vendored file imports two modules absent from the reference tree
(model/conv/MBConv.py and model/attention/SelfAttention.py). The oracle
test stubs them — SelfAttention re-exported from the vendored
attention:/SelfAttention.py, MBConvBlock as a torch stand-in implementing
the standard EfficientNet block our port assumes — so the vendored
CoAtNet.py itself runs as the reference for the weight transfer."""

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
    # timm shim for gfnet (DropPath at p=0 is identity; to_2tuple trivial)
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        import torch.nn as tnn

        class DropPath(tnn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        def trunc_normal_(t, std=1.0, **kw):
            import torch

            with torch.no_grad():
                t.normal_(0.0, std)
            return t

        layers.DropPath = DropPath
        layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        layers.trunc_normal_ = trunc_normal_
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    spec = importlib.util.spec_from_file_location(
        f"refattv_{name}", os.path.join(REF_ATT, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cw(t):
    return np.asarray(t.detach()).transpose(2, 3, 1, 0)


def _lw(t):
    return np.asarray(t.detach()).T


def _a(t):
    return np.asarray(t.detach())


def _bn(prefix, bn):
    return {f"{prefix}_scale": _a(bn.weight), f"{prefix}_bias": _a(bn.bias),
            f"{prefix}_mean": _a(bn.running_mean),
            f"{prefix}_var": _a(bn.running_var)}


def _run(mod, params, *args, **kwargs):
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return np.asarray(mod.apply({"params": params}, *args, **kwargs))


def _close(ours, theirs, rtol=1e-4, atol=1e-4):
    np.testing.assert_allclose(ours, _a(theirs), rtol=rtol, atol=atol)


@ref_available
def test_residual_attention_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import ResidualAttention

    ref_mod = _load_ref("ResidualAttention")
    torch.manual_seed(0)
    ref = ref_mod.ResidualAttention(channel=8, num_class=10, la=0.2)
    ref.eval()
    x = np.random.default_rng(0).standard_normal((2, 8, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    out = _run(ResidualAttention(channel=8, num_class=10, la=0.2),
               {"fc_kernel": _cw(ref.fc.weight)}, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_parnet_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import ParNetAttention

    ref_mod = _load_ref("ParNetAttention")
    torch.manual_seed(1)
    ref = ref_mod.ParNetAttention(channel=8)
    ref.eval()
    x = np.random.default_rng(1).standard_normal((2, 8, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "sse_conv_kernel": _cw(ref.sse[1].weight),
        "sse_conv_bias": _a(ref.sse[1].bias),
        "conv1_kernel": _cw(ref.conv1x1[0].weight),
        "conv1_bias": _a(ref.conv1x1[0].bias),
        "conv3_kernel": _cw(ref.conv3x3[0].weight),
        "conv3_bias": _a(ref.conv3x3[0].bias),
    }
    params.update(_bn("bn1", ref.conv1x1[1]))
    params.update(_bn("bn3", ref.conv3x3[1]))
    out = _run(ParNetAttention(channel=8), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_crisscross_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import CrissCrossAttention

    ref_mod = _load_ref("CrissCrossAttention")
    torch.manual_seed(2)
    ref = ref_mod.CrissCrossAttention(16)
    ref.eval()
    with torch.no_grad():
        ref.gamma.fill_(0.7)  # gamma inits to 0 (output == x); make it bite
    x = np.random.default_rng(2).standard_normal((2, 16, 5, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "query_conv_kernel": _cw(ref.query_conv.weight),
        "query_conv_bias": _a(ref.query_conv.bias),
        "key_conv_kernel": _cw(ref.key_conv.weight),
        "key_conv_bias": _a(ref.key_conv.bias),
        "value_conv_kernel": _cw(ref.value_conv.weight),
        "value_conv_bias": _a(ref.value_conv.bias),
        "gamma": _a(ref.gamma),
    }
    out = _run(CrissCrossAttention(in_dim=16), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_vip_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import WeightedPermuteMLP

    ref_mod = _load_ref("ViP")
    torch.manual_seed(3)
    ref = ref_mod.WeightedPermuteMLP(16, seg_dim=4)
    ref.eval()
    # the vendored permute-MLP requires H == W == seg_dim (H*S == dim)
    x = np.random.default_rng(3).standard_normal((2, 4, 4, 16)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "mlp_c_kernel": _lw(ref.mlp_c.weight),
        "mlp_h_kernel": _lw(ref.mlp_h.weight),
        "mlp_w_kernel": _lw(ref.mlp_w.weight),
        "reweight_fc1_kernel": _lw(ref.reweighting.fc1.weight),
        "reweight_fc1_bias": _a(ref.reweighting.fc1.bias),
        "reweight_fc2_kernel": _lw(ref.reweighting.fc2.weight),
        "reweight_fc2_bias": _a(ref.reweighting.fc2.bias),
        "proj_kernel": _lw(ref.proj.weight),
        "proj_bias": _a(ref.proj.bias),
    }
    out = _run(WeightedPermuteMLP(dim=16, seg_dim=4), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_outlook_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import OutlookAttention

    ref_mod = _load_ref("OutlookAttention")
    torch.manual_seed(4)
    ref = ref_mod.OutlookAttention(dim=8, num_heads=2)
    ref.eval()
    x = np.random.default_rng(4).standard_normal((2, 6, 6, 8)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "v_pj_kernel": _lw(ref.v_pj.weight),
        "attn_kernel": _lw(ref.attn.weight),
        "attn_bias": _a(ref.attn.bias),
        "proj_kernel": _lw(ref.proj.weight),
        "proj_bias": _a(ref.proj.bias),
    }
    out = _run(OutlookAttention(dim=8, num_heads=2), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_mobilevit_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import MobileViTAttention

    ref_mod = _load_ref("MobileViTAttention")
    torch.manual_seed(5)
    ref = ref_mod.MobileViTAttention(in_channel=3, dim=32, kernel_size=3,
                                     patch_size=2)
    ref.eval()
    x = np.random.default_rng(5).standard_normal((1, 3, 4, 4)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))

    params = {}
    for i in range(1, 5):
        conv = getattr(ref, f"conv{i}")
        params[f"conv{i}_kernel"] = _cw(conv.weight)
        params[f"conv{i}_bias"] = _a(conv.bias)
    for i, (att, ffn) in enumerate(ref.trans.layers):
        params[f"layer{i}_attn_ln_scale"] = _a(att.ln.weight)
        params[f"layer{i}_attn_ln_bias"] = _a(att.ln.bias)
        params[f"layer{i}_attn_to_qkv_kernel"] = _lw(att.fn.to_qkv.weight)
        params[f"layer{i}_attn_to_out_kernel"] = _lw(att.fn.to_out[0].weight)
        params[f"layer{i}_attn_to_out_bias"] = _a(att.fn.to_out[0].bias)
        params[f"layer{i}_ffn_ln_scale"] = _a(ffn.ln.weight)
        params[f"layer{i}_ffn_ln_bias"] = _a(ffn.ln.bias)
        params[f"layer{i}_ffn_fc1_kernel"] = _lw(ffn.fn.net[0].weight)
        params[f"layer{i}_ffn_fc1_bias"] = _a(ffn.fn.net[0].bias)
        params[f"layer{i}_ffn_fc2_kernel"] = _lw(ffn.fn.net[3].weight)
        params[f"layer{i}_ffn_fc2_bias"] = _a(ffn.fn.net[3].bias)
    out = _run(MobileViTAttention(in_channel=3, dim=32, patch_size=2,
                                  heads=8, head_dim=64, mlp_dim=1024),
               params, jnp.asarray(x))
    _close(out, want, rtol=2e-4, atol=2e-4)


@ref_available
def test_gfnet_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import GFNet

    ref_mod = _load_ref("gfnet")
    torch.manual_seed(6)
    ref = ref_mod.GFNet(embed_dim=32, img_size=32, patch_size=16, depth=2,
                        num_classes=10)
    ref.eval()
    x = np.random.default_rng(6).standard_normal((2, 3, 32, 32)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "patch_proj_kernel": _cw(ref.patch_embed.proj.weight),
        "patch_proj_bias": _a(ref.patch_embed.proj.bias),
        "embedding_kernel": _lw(ref.embedding.weight),
        "embedding_bias": _a(ref.embedding.bias),
        "head_kernel": _lw(ref.head.weight),
        "head_bias": _a(ref.head.bias),
    }
    for i, blk in enumerate(ref.blocks):
        params[f"block{i}_norm1_scale"] = _a(blk.norm1.weight)
        params[f"block{i}_norm1_bias"] = _a(blk.norm1.bias)
        params[f"block{i}_norm2_scale"] = _a(blk.norm2.weight)
        params[f"block{i}_norm2_bias"] = _a(blk.norm2.bias)
        params[f"block{i}_complex_weight"] = _a(blk.filter.complex_weight)
        params[f"block{i}_fc1_kernel"] = _lw(blk.mlp.fc1.weight)
        params[f"block{i}_fc1_bias"] = _a(blk.mlp.fc1.bias)
        params[f"block{i}_fc2_kernel"] = _lw(blk.mlp.fc2.weight)
        params[f"block{i}_fc2_bias"] = _a(blk.mlp.fc2.bias)
    out = _run(GFNet(embed_dim=32, img_size=32, patch_size=16, depth=2,
                     num_classes=10), params, jnp.asarray(x))
    _close(out, want, rtol=2e-4, atol=1e-5)


@ref_available
def test_halo_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import HaloAttention

    ref_mod = _load_ref("HaloAttention")
    torch.manual_seed(7)
    ref = ref_mod.HaloAttention(dim=16, block_size=2, halo_size=1,
                                dim_head=4, heads=2)
    ref.eval()
    x = np.random.default_rng(7).standard_normal((2, 16, 4, 4)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "to_q_kernel": _lw(ref.to_q.weight),
        "to_kv_kernel": _lw(ref.to_kv.weight),
        "to_out_kernel": _lw(ref.to_out.weight),
        "to_out_bias": _a(ref.to_out.bias),
        "rel_height": _a(ref.rel_pos_emb.rel_height),
        "rel_width": _a(ref.rel_pos_emb.rel_width),
    }
    out = _run(HaloAttention(dim=16, block_size=2, halo_size=1, dim_head=4,
                             heads=2), params, jnp.asarray(x))
    _close(out, want)


@ref_available
def test_acmix_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import ACmix

    ref_mod = _load_ref("ACmixAttention")
    torch.manual_seed(8)
    ref = ref_mod.ACmix(in_planes=16, out_planes=16, head=4)
    ref.eval()
    x = np.random.default_rng(8).standard_normal((2, 16, 5, 5)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {
        "rate1": _a(ref.rate1), "rate2": _a(ref.rate2),
        "fc_kernel": _cw(ref.fc.weight),
        "dep_conv_kernel": _cw(ref.dep_conv.weight),
    }
    for i in (1, 2, 3):
        conv = getattr(ref, f"conv{i}")
        params[f"conv{i}_kernel"] = _cw(conv.weight)
        params[f"conv{i}_bias"] = _a(conv.bias)
    params["conv_p_kernel"] = _cw(ref.conv_p.weight)
    params["conv_p_bias"] = _a(ref.conv_p.bias)
    out = _run(ACmix(in_planes=16, out_planes=16, head=4), params,
               jnp.asarray(x))
    _close(out, want)


@ref_available
def test_axial_vs_vendored():
    import torch

    from ser_tpu.ops.attention_zoo_vision import AxialAttention

    ref_mod = _load_ref("Axial_attention")
    torch.manual_seed(9)
    ref = ref_mod.AxialAttention(dim=16, dim_index=1, heads=4,
                                 num_dimensions=2)
    ref.eval()
    x = np.random.default_rng(9).standard_normal((2, 16, 5, 6)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x))
    params = {}
    for i, att in enumerate(ref.axial_attentions):
        fn = att.fn
        params[f"axis{i}_to_q_kernel"] = _lw(fn.to_q.weight)
        params[f"axis{i}_to_kv_kernel"] = _lw(fn.to_kv.weight)
        params[f"axis{i}_to_out_kernel"] = _lw(fn.to_out.weight)
        params[f"axis{i}_to_out_bias"] = _a(fn.to_out.bias)
    out = _run(AxialAttention(dim=16, heads=4), params, jnp.asarray(x))
    _close(out, want)


def test_coatnet_shapes():
    """Reference-free smoke: our CoAtNet rebuild runs and is finite."""
    from ser_tpu.ops.attention_zoo_vision import CoAtNet

    x = jnp.asarray(np.random.default_rng(10).standard_normal(
        (1, 3, 32, 32)).astype(np.float32))
    mod = CoAtNet(in_ch=3, image_size=32, out_chs=(8, 12, 16, 24, 32))
    params = mod.init({"params": jax.random.PRNGKey(0)}, x)
    out = mod.apply(params, x)
    assert out.shape[0] == 1 and out.shape[1] == 32
    assert np.isfinite(np.asarray(out)).all()


def _shim_coatnet_imports():
    """Make the vendored CoAtNet.py importable: provide the two modules it
    imports from a 'model' package that exists nowhere in the tree
    (``attention:/CoAtNet.py:6-7``).

    - model.attention.SelfAttention: re-export of the vendored
      attention:/SelfAttention.py (same class the collection ships).
    - model.conv.MBConv.MBConvBlock: torch stand-in for the standard
      EfficientNet MBConv block (expand -> depthwise+BN+swish -> SE ->
      project+BN, residual on matching filters) — the block the public
      External-Attention collection vendors from EfficientNet-PyTorch and
      the one our flax port implements.
    """
    import torch
    import torch.nn as tnn

    class MBConvBlock(tnn.Module):
        def __init__(self, ksize, input_filters, output_filters,
                     image_size=None, expand_ratio=1, se_ratio=0.25):
            super().__init__()
            del image_size  # static same-padding == ksize//2 at stride 1
            self.expand_ratio = expand_ratio
            self.has_residual = input_filters == output_filters
            mid = input_filters * expand_ratio
            if expand_ratio != 1:
                self._expand_conv = tnn.Conv2d(input_filters, mid, 1,
                                               bias=False)
                self._bn0 = tnn.BatchNorm2d(mid)
            self._depthwise_conv = tnn.Conv2d(
                mid, mid, ksize, padding=ksize // 2, groups=mid, bias=False)
            self._bn1 = tnn.BatchNorm2d(mid)
            se_c = max(1, int(input_filters * se_ratio))
            self._se_reduce = tnn.Conv2d(mid, se_c, 1)
            self._se_expand = tnn.Conv2d(se_c, mid, 1)
            self._project_conv = tnn.Conv2d(mid, output_filters, 1,
                                            bias=False)
            self._bn2 = tnn.BatchNorm2d(output_filters)

        def forward(self, x):
            y = x
            if self.expand_ratio != 1:
                y = self._bn0(self._expand_conv(y))
                y = y * torch.sigmoid(y)
            y = self._bn1(self._depthwise_conv(y))
            y = y * torch.sigmoid(y)
            g = y.mean(dim=(2, 3), keepdim=True)
            g = self._se_reduce(g)
            g = g * torch.sigmoid(g)
            y = y * torch.sigmoid(self._se_expand(g))
            y = self._bn2(self._project_conv(y))
            if self.has_residual:
                y = y + x
            return y

    model_pkg = types.ModuleType("model")
    conv_pkg = types.ModuleType("model.conv")
    mbconv_mod = types.ModuleType("model.conv.MBConv")
    mbconv_mod.MBConvBlock = MBConvBlock
    att_pkg = types.ModuleType("model.attention")
    sa_mod = types.ModuleType("model.attention.SelfAttention")
    sa_mod.ScaledDotProductAttention = _load_ref(
        "SelfAttention").ScaledDotProductAttention
    for name, mod in (("model", model_pkg), ("model.conv", conv_pkg),
                      ("model.conv.MBConv", mbconv_mod),
                      ("model.attention", att_pkg),
                      ("model.attention.SelfAttention", sa_mod)):
        sys.modules[name] = mod


def _mbconv_params(block):
    """torch MBConv stand-in -> our flax MBConvBlock param dict."""
    p = {"dw_kernel": _cw(block._depthwise_conv.weight),
         "se_reduce_kernel": _cw(block._se_reduce.weight),
         "se_reduce_bias": _a(block._se_reduce.bias),
         "se_expand_kernel": _cw(block._se_expand.weight),
         "se_expand_bias": _a(block._se_expand.bias),
         "project_kernel": _cw(block._project_conv.weight)}
    p.update(_bn("dw_bn", block._bn1))
    p.update(_bn("project_bn", block._bn2))
    if block.expand_ratio != 1:
        p["expand_kernel"] = _cw(block._expand_conv.weight)
        p.update(_bn("expand_bn", block._bn0))
    return p


def _sdpa_params(att):
    return {f"fc_{n}_{w}": (_lw if w == "kernel" else _a)(
        getattr(att, f"fc_{n}").weight if w == "kernel"
        else getattr(att, f"fc_{n}").bias)
        for n in ("q", "k", "v", "o") for w in ("kernel", "bias")}


@ref_available
def test_coatnet_vs_vendored():
    """Weight-transfer oracle for the 37th catalog module: the vendored
    CoAtNet.py runs with its missing imports stubbed (see
    _shim_coatnet_imports) and our rebuild must match per element."""
    import torch

    _shim_coatnet_imports()
    torch.manual_seed(21)
    ref = _load_ref("CoAtNet").CoAtNet(3, 32, out_chs=[8, 12, 16, 24, 32])
    # randomize BN running stats so the transfer actually pins the BN
    # mapping (fresh stats are identity-ish)
    gen = torch.Generator().manual_seed(7)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.3, generator=gen)
            m.running_var.uniform_(0.6, 1.6, generator=gen)
    ref.eval()

    params = {
        "s0_0_kernel": _cw(ref.s0[0].weight), "s0_0_bias": _a(ref.s0[0].bias),
        "s0_2_kernel": _cw(ref.s0[2].weight), "s0_2_bias": _a(ref.s0[2].bias),
        "s1": _mbconv_params(ref.s1), "s2": _mbconv_params(ref.s2),
        "s3": _sdpa_params(ref.s3), "s4": _sdpa_params(ref.s4),
    }
    for i in (0, 1, 2):
        seq = getattr(ref, f"mlp{i}")
        params[f"mlp{i}_0_kernel"] = _cw(seq[0].weight)
        params[f"mlp{i}_0_bias"] = _a(seq[0].bias)
        params[f"mlp{i}_2_kernel"] = _cw(seq[2].weight)
        params[f"mlp{i}_2_bias"] = _a(seq[2].bias)
    for i in (3, 4):
        seq = getattr(ref, f"mlp{i}")
        params[f"mlp{i}_0_kernel"] = _lw(seq[0].weight)
        params[f"mlp{i}_0_bias"] = _a(seq[0].bias)
        params[f"mlp{i}_2_kernel"] = _lw(seq[2].weight)
        params[f"mlp{i}_2_bias"] = _a(seq[2].bias)

    from ser_tpu.ops.attention_zoo_vision import CoAtNet

    x = np.random.default_rng(11).standard_normal(
        (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.tensor(x))
    mod = CoAtNet(in_ch=3, image_size=32, out_chs=(8, 12, 16, 24, 32))
    # structural completeness: the transfer covers every init param
    init = mod.init({"params": jax.random.PRNGKey(0)},
                    jnp.asarray(x))["params"]
    import jax.tree_util as jtu

    init_names = {jtu.keystr(k) for k, _ in
                  jtu.tree_flatten_with_path(init)[0]}
    got_names = {jtu.keystr(k) for k, _ in
                 jtu.tree_flatten_with_path(params)[0]}
    assert init_names == got_names, (
        sorted(init_names - got_names), sorted(got_names - init_names))
    ours = _run(mod, params, jnp.asarray(x), deterministic=True)
    _close(ours, theirs, rtol=2e-4, atol=2e-4)
