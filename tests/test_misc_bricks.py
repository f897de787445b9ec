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
