"""Fused relation-bias Pallas kernel vs the unfused reference math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relation_detr_tpu.ops.relation_pallas import (
    _reference_bias,
    fused_relation_bias,
)


@pytest.mark.parametrize("shape", [(1, 60, 60), (2, 33, 47)])
def test_fused_matches_reference(shape):
    b, n1, n2 = shape
    rng = np.random.RandomState(0)
    rel = jnp.asarray(rng.randn(b, n1, n2, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    got = fused_relation_bias(rel, kernel, bias)
    want = _reference_bias(rel, kernel, bias, 16, 10000.0, 100.0)
    assert got.shape == (b, 8, n1, n2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_grads_match_reference():
    rng = np.random.RandomState(1)
    rel = jnp.asarray(rng.randn(1, 24, 24, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)

    def loss_fused(k, b):
        return jnp.sum(fused_relation_bias(rel, k, b) ** 2)

    def loss_ref(k, b):
        return jnp.sum(_reference_bias(rel, k, b, 16, 10000.0, 100.0) ** 2)

    gk, gb = jax.grad(loss_fused, argnums=(0, 1))(kernel, bias)
    rk, rb = jax.grad(loss_ref, argnums=(0, 1))(kernel, bias)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-4, atol=1e-4)


def _direct_bias_from_boxes(src, tgt, kernel, bias):
    from relation_detr_tpu.models.relation import box_rel_encoding

    rel = box_rel_encoding(src, tgt)
    return _reference_bias(rel, kernel, bias, 16, 10000.0, 100.0)


@pytest.mark.parametrize("shape", [(1, 60, 60), (2, 33, 47)])
def test_separable_matches_direct(shape):
    """separable_relation_bias (per-box wh transcendentals + bilinear MXU
    mixing) == the direct pairwise embedding, up to fp regrouping noise."""
    from relation_detr_tpu.models.relation import separable_relation_bias

    b, n1, n2 = shape
    rng = np.random.RandomState(2)
    src = jnp.asarray(rng.rand(b, n1, 4).astype(np.float32) * 0.9 + 0.01)
    tgt = jnp.asarray(rng.rand(b, n2, 4).astype(np.float32) * 0.9 + 0.01)
    kernel = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    got = separable_relation_bias(src, tgt, kernel, bias)
    want = _direct_bias_from_boxes(src, tgt, kernel, bias)
    assert got.shape == (b, 8, n1, n2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


@pytest.mark.parametrize("shape", [(1, 60, 60), (2, 33, 47)])
def test_v4_matches_direct(shape):
    """Boxes-in/bias-out v4 kernel == direct pairwise embedding."""
    from relation_detr_tpu.ops.relation_pallas import fused_relation_bias_v4

    b, n1, n2 = shape
    rng = np.random.RandomState(4)
    src = jnp.asarray(rng.rand(b, n1, 4).astype(np.float32) * 0.9 + 0.01)
    tgt = jnp.asarray(rng.rand(b, n2, 4).astype(np.float32) * 0.9 + 0.01)
    kernel = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    got = fused_relation_bias_v4(src, tgt, kernel, bias)
    want = _direct_bias_from_boxes(src, tgt, kernel, bias)
    assert got.shape == (b, 8, n1, n2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)

    gk, gb = jax.grad(
        lambda k, b_: jnp.sum(fused_relation_bias_v4(src, tgt, k, b_) ** 2),
        argnums=(0, 1),
    )(kernel, bias)
    rk, rb = jax.grad(
        lambda k, b_: jnp.sum(_direct_bias_from_boxes(src, tgt, k, b_) ** 2),
        argnums=(0, 1),
    )(kernel, bias)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=5e-3, atol=5e-3)


def test_separable_extreme_boxes_and_grads():
    """Tiny/degenerate wh (large log-ratio angles) stay within tolerance and
    kernel/bias grads match the direct path."""
    from relation_detr_tpu.models.relation import separable_relation_bias

    rng = np.random.RandomState(3)
    src = np.concatenate(
        [rng.rand(1, 24, 2), 10 ** rng.uniform(-4.5, 0, (1, 24, 2))], -1
    ).astype(np.float32)
    tgt = np.concatenate(
        [rng.rand(1, 17, 2), 10 ** rng.uniform(-4.5, 0, (1, 17, 2))], -1
    ).astype(np.float32)
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)
    kernel = jnp.asarray(rng.randn(64, 8).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    got = separable_relation_bias(src, tgt, kernel, bias)
    want = _direct_bias_from_boxes(src, tgt, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3)

    gk, gb = jax.grad(
        lambda k, b: jnp.sum(separable_relation_bias(src, tgt, k, b) ** 2),
        argnums=(0, 1),
    )(kernel, bias)
    rk, rb = jax.grad(
        lambda k, b: jnp.sum(_direct_bias_from_boxes(src, tgt, k, b) ** 2),
        argnums=(0, 1),
    )(kernel, bias)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=5e-3, atol=5e-3)
