"""Backbone shape/stride contracts + a torch golden check for Swin windows."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relation_detr_tpu.models.backbones import build_backbone


@pytest.mark.parametrize(
    "arch,expect_channels",
    [
        ("resnet50", (512, 1024, 2048)),
        ("resnet18", (128, 256, 512)),
        ("swin_t", (192, 384, 768)),
        ("focalnet_tiny_srf", (192, 384, 768)),
        ("convnext_tiny", (192, 384, 768)),
    ],
)
def test_backbone_shapes(arch, expect_channels):
    bb = build_backbone(arch)
    assert bb.num_channels == expect_channels
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.eval_shape(lambda: bb.init(jax.random.key(0), x))
    outs = jax.eval_shape(lambda v: bb.apply(v, x), variables)
    strides = (8, 16, 32)
    for out, s, c in zip(outs, strides, expect_channels):
        assert out.shape == (1, 64 // s, 96 // s, c), (arch, out.shape, s)


def test_resnext_grouped_conv_shapes():
    bb = build_backbone("resnext50_32x4d")
    assert bb.num_channels == (512, 1024, 2048)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.eval_shape(lambda: bb.init(jax.random.key(0), x))
    # 3x3 conv2 of stage 1 block 0 has grouped kernel: (3, 3, width/32, width)
    k = variables["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 128 // 32, 128)
    outs = jax.eval_shape(lambda v: bb.apply(v, x), variables)
    assert outs[-1].shape == (1, 2, 3, 2048)


def test_dcn_resnet_variant_builds_and_matches_plain_at_zero_offsets():
    """stage_with_dcn swaps conv2 for DeformConv2dPack (reference
    resnet.py:38-55); zero-init offsets/masks make it 0.5 * plain conv."""
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    dcn = build_backbone("resnet18", stage_with_dcn=(False, False, True, True))
    v = dcn.init(jax.random.key(1), x)
    p = v["params"]["layer3_0"]
    assert "conv_offset" in p["conv2"] and "conv_mask" in p["conv2"]
    assert p["conv2"]["kernel"].shape == (9, 256, 256)
    assert "bias" not in p["conv2"]  # reference conv3x3_dcn is bias-free
    outs = dcn.apply(v, x)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)

    # numeric check on the block level: zero offsets + sigmoid(0)=0.5 masks
    # reduce DCN to 0.5x a dense 3x3 conv with the same tap kernel
    from relation_detr_tpu.models.backbones.resnet import BasicBlock

    xb = jax.random.normal(jax.random.key(2), (1, 8, 8, 32))
    blk_dcn = BasicBlock(32, with_dcn=True)
    vd = blk_dcn.init(jax.random.key(3), xb)
    blk_plain = BasicBlock(32, with_dcn=False)
    vp = jax.tree_util.tree_map(lambda a: a, blk_plain.init(jax.random.key(3), xb))
    # copy shared params; plain conv2 kernel (3,3,32,32) from tap kernel
    import flax

    vp = flax.core.unfreeze(vp) if hasattr(flax.core, "unfreeze") else dict(vp)
    pd = vd["params"]
    k_tap = np.asarray(pd["conv2"]["kernel"])  # (9, 32, 32)
    vp["params"]["conv2"]["kernel"] = jnp.asarray(
        0.5 * k_tap.reshape(3, 3, 32, 32)
    )
    vp["params"]["conv1"] = pd["conv1"]
    # FrozenBatchNorm state lives in batch_stats
    if "batch_stats" in vd:
        vp["batch_stats"] = vd["batch_stats"]
    out_d = blk_dcn.apply(vd, xb)
    out_p = blk_plain.apply(vp, xb)
    # interior only (border taps sample zero-padding identically here since
    # bilinear at integer grid points matches conv padding)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_p), atol=1e-5)


def test_swin_tiny_runs_and_is_finite():
    bb = build_backbone("swin_t")
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    variables = bb.init(jax.random.key(1), x)
    outs = bb.apply(variables, x)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_swin_v2_builds_and_shapes():
    bb = build_backbone("swin_v2_t")
    assert bb.num_channels == (192, 384, 768)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.eval_shape(lambda: bb.init(jax.random.key(0), x))
    p = variables["params"]["stage0_block0"]["attn"]
    # v2 params: logit_scale + continuous-position-bias MLP, no bias table
    assert "logit_scale" in p and "cpb_fc1" in p and "cpb_fc2" in p
    assert "relative_position_bias_table" not in p
    # PatchMergingV2 norm is over the reduced 2C dim (reference swin.py:84-94)
    assert variables["params"]["merge1"]["norm"]["scale"].shape == (192,)
    outs = jax.eval_shape(lambda v: bb.apply(v, x), variables)
    assert outs[-1].shape == (1, 2, 3, 768)


def test_swin_v2_attention_math_golden():
    """Independent numpy recomputation of the v2 cosine attention + continuous
    position bias (reference swin.py:330-381): normalized q/k, clamped
    exp(logit_scale), 16*sigmoid(cpb_mlp(log coords)), zeroed k bias."""
    from relation_detr_tpu.models.backbones.swin import (
        WindowAttention,
        _log_coords_table,
        _relative_position_index,
    )

    ws, heads, c = 4, 2, 8
    attn_mod = WindowAttention(c, heads, ws, shift=0, v2=True)
    x = jax.random.normal(jax.random.key(0), (1, ws, ws, c))
    v = attn_mod.init(jax.random.key(1), x)
    # randomize params that init deterministically (logit_scale, biases)
    import flax

    p = flax.core.unfreeze(v)["params"] if hasattr(flax.core, "unfreeze") else dict(v["params"])
    p["logit_scale"] = jax.random.normal(jax.random.key(2), (heads, 1, 1)) * 2
    p["qkv"]["bias"] = jax.random.normal(jax.random.key(3), (3 * c,))
    v = {"params": p}
    out = np.asarray(attn_mod.apply(v, x))

    xn = np.asarray(x).reshape(ws * ws, c)
    Wqkv = np.asarray(p["qkv"]["kernel"])  # (C, 3C)
    bqkv = np.asarray(p["qkv"]["bias"]).copy()
    bqkv[c:2 * c] = 0.0  # v2 zeroes the k bias
    qkv = xn @ Wqkv + bqkv
    hd = c // heads
    q = qkv[:, :c].reshape(-1, heads, hd)
    k = qkv[:, c:2 * c].reshape(-1, heads, hd)
    val = qkv[:, 2 * c:].reshape(-1, heads, hd)
    qn = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    kn = k / np.maximum(np.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    scale = np.exp(np.minimum(np.asarray(p["logit_scale"])[:, 0, 0], np.log(100.0)))
    logits = np.einsum("qhd,khd->hqk", qn, kn) * scale[:, None, None]
    table = np.asarray(_log_coords_table(ws))  # ((2ws-1)^2, 2)
    h1 = np.maximum(table @ np.asarray(p["cpb_fc1"]["kernel"]) +
                    np.asarray(p["cpb_fc1"]["bias"]), 0)
    bias_tab = h1 @ np.asarray(p["cpb_fc2"]["kernel"])  # ((2ws-1)^2, heads)
    idx = _relative_position_index(ws)
    rel = bias_tab[idx.reshape(-1)].reshape(ws * ws, ws * ws, heads)
    rel = 16.0 / (1.0 + np.exp(-rel))
    logits = logits + rel.transpose(2, 0, 1)
    a = np.exp(logits - logits.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    o = np.einsum("hqk,khd->qhd", a, val).reshape(ws * ws, c)
    o = o @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])
    np.testing.assert_allclose(out.reshape(ws * ws, c), o, rtol=1e-5, atol=1e-5)


def test_swin_shifted_window_mask_blocks_cross_regions():
    from relation_detr_tpu.models.backbones.swin import _shift_attn_mask

    mask = _shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    # first window is a single region: nothing blocked
    assert (mask[0] == 0).all()
    # corner window mixes 4 regions: some pairs blocked
    assert (mask[-1] < 0).any()
    # diagonal never blocked
    assert all((np.diag(mask[i]) == 0).all() for i in range(4))


def test_relative_position_index_symmetry():
    from relation_detr_tpu.models.backbones.swin import _relative_position_index

    idx = _relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # relation(i, j) mirrors relation(j, i) around the table center
    center = idx[0, 0]
    assert (np.diag(idx) == center).all()


def test_vit_sfp_shapes():
    bb = build_backbone("vit_b")
    assert bb.num_channels == (256, 256, 256)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.eval_shape(lambda: bb.init(jax.random.key(0), x))
    outs = jax.eval_shape(lambda v: bb.apply(v, x), variables)
    for out, s in zip(outs, (8, 16, 32)):
        assert out.shape == (1, 64 // s, 96 // s, 256), (out.shape, s)


def test_eva02_vit_builds_and_rope_rotates():
    bb = build_backbone("eva_02_vit_b_4attn_1024")
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    v = bb.init(jax.random.key(1), x)
    p = v["params"]["block0"]["attn"]
    assert "q_proj" in p and "k_proj" in p and "v_proj" in p  # EVA02 split
    assert "bias" not in p["k_proj"]  # k has no bias (vit.py:166-172)
    assert "w1" in v["params"]["block0"]["mlp"]  # SwiGLU
    outs = bb.apply(v, x)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_rope_tables_rotation_identity():
    """RoPE preserves per-pair norms and is identity at position 0."""
    from relation_detr_tpu.models.backbones.vit import (
        _apply_rope,
        _rope_tables,
    )

    cos, sin = _rope_tables(16, 16, (4, 4))
    assert cos.shape == (16, 16)
    t = np.random.RandomState(0).randn(16, 16).astype(np.float32)
    out = np.asarray(_apply_rope(jnp.asarray(t), jnp.asarray(cos), jnp.asarray(sin)))
    # rotation preserves the norm of each (even, odd) pair
    def pair_norms(a):
        return (a.reshape(16, 8, 2) ** 2).sum(-1)
    np.testing.assert_allclose(pair_norms(out), pair_norms(t), rtol=1e-5)
    # position 0 has zero angle -> identity
    np.testing.assert_allclose(out[0], t[0], rtol=1e-5)


def test_res_bottleneck_block_identity_at_init():
    """Zero-init last norm makes the block an identity at init
    (vit.py:275-277)."""
    from relation_detr_tpu.models.backbones.vit import ResBottleneckBlock

    blk = ResBottleneckBlock(32, 8)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 32))
    v = blk.init(jax.random.key(1), x)
    np.testing.assert_allclose(np.asarray(blk.apply(v, x)), np.asarray(x),
                               atol=1e-6)
