import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from relation_detr_tpu.models.deform_conv import DeformConv2dPack
from relation_detr_tpu.ops.grid_sample import bilinear_sample
from relation_detr_tpu.utils.class_names import (
    COCO_CLASSES,
    decode_labels,
    encode_labels,
)


def test_bilinear_sample_matches_grid_sample():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 9, 11, 5).astype(np.float32)
    pts = rng.uniform(-1, 12, (2, 17, 2)).astype(np.float32)  # incl. OOB
    ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(pts)))
    # torch grid_sample with align_corners=False: pixel p -> norm (2p+1)/size - 1
    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    gx = (2 * pts[..., 0] + 1) / 11 - 1
    gy = (2 * pts[..., 1] + 1) / 9 - 1
    grid = torch.from_numpy(np.stack([gx, gy], -1))[:, :, None, :]
    ref = F.grid_sample(t_feat, grid, align_corners=False, padding_mode="zeros")
    ref = ref[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_deform_conv_zero_offsets_equal_dense_conv():
    """With zero-init offsets, DCN == a 3x3 conv with 0.5 masks."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 10, 4).astype(np.float32))
    dcn = DeformConv2dPack(features=6)
    v = dcn.init(jax.random.key(0), x)
    out = dcn.apply(v, x)
    assert out.shape == (1, 8, 10, 6)
    # reference: plain conv with the same taps kernel, masks all 0.5
    kernel = np.asarray(v["params"]["kernel"])  # (9, 4, 6)
    t_x = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    t_k = torch.from_numpy(kernel.reshape(3, 3, 4, 6)).permute(3, 2, 0, 1)
    ref = F.conv2d(t_x, t_k, padding=1) * 0.5
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


def test_class_names_roundtrip():
    enc = encode_labels(COCO_CLASSES)
    assert decode_labels(enc) == COCO_CLASSES


def test_context_block_identity_at_init():
    """GCNet zero-inits each fusion branch's final conv (basic.py:136-141):
    channel_add starts as identity, channel_mul as x*sigmoid(0)=0.5x."""
    from relation_detr_tpu.models.layers import ContextBlock

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 7, 16).astype(np.float32))
    add = ContextBlock(channels=16, ratio=0.25)
    out = add.apply(add.init(jax.random.key(0), x), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    mul = ContextBlock(channels=16, ratio=0.25, pooling_type="avg",
                       fusion_types=("channel_mul",))
    out = mul.apply(mul.init(jax.random.key(0), x), x)
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(x), atol=1e-6)


def test_context_block_matches_torch_oracle():
    """Golden vs a transcription of ContextBlock (basic.py:77-188): attn
    pooling + both fusions, weights copied across."""
    from relation_detr_tpu.models.layers import ContextBlock

    rng = np.random.RandomState(4)
    C, hidden = 8, 4
    x = rng.randn(2, 5, 6, C).astype(np.float32)
    blk = ContextBlock(channels=C, ratio=0.5,
                       fusion_types=("channel_add", "channel_mul"))
    v = blk.init(jax.random.key(1), jnp.asarray(x))
    # perturb the zero-init final layers so the test sees real transforms
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * rng.randn(*a.shape).astype(np.float32), v["params"]
    )
    out = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))

    p = params
    t_x = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    b, c, h, w = t_x.shape
    wm = torch.from_numpy(np.asarray(p["conv_mask"]["kernel"]))  # (C, 1)
    bm = torch.from_numpy(np.asarray(p["conv_mask"]["bias"]))
    logits = (t_x.permute(0, 2, 3, 1).reshape(b, h * w, c) @ wm).squeeze(-1) + bm
    attn = torch.softmax(logits, dim=-1)
    context = torch.einsum("bn,bnc->bc", attn, t_x.permute(0, 2, 3, 1).reshape(b, h * w, c))

    def bottleneck(ctx, name):
        w1 = torch.from_numpy(np.asarray(p[f"{name}_1"]["kernel"]))
        b1 = torch.from_numpy(np.asarray(p[f"{name}_1"]["bias"]))
        t = ctx @ w1 + b1
        g = torch.from_numpy(np.asarray(p[f"{name}_norm"]["scale"]))
        be = torch.from_numpy(np.asarray(p[f"{name}_norm"]["bias"]))
        t = torch.nn.functional.layer_norm(t, (hidden,), g, be, eps=1e-6).relu()
        w2 = torch.from_numpy(np.asarray(p[f"{name}_2"]["kernel"]))
        b2 = torch.from_numpy(np.asarray(p[f"{name}_2"]["bias"]))
        return t @ w2 + b2

    ref = t_x * torch.sigmoid(bottleneck(context, "channel_mul"))[:, :, None, None]
    ref = ref + bottleneck(context, "channel_add")[:, :, None, None]
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
