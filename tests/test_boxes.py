import numpy as np
import pytest
import torch

import jax.numpy as jnp

from relation_detr_tpu.ops import boxes as box_ops


def np_pairwise_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union, union


def np_pairwise_giou(a, b):
    iou, union = np_pairwise_iou(a, b)
    lt = np.minimum(a[:, None, :2], b[None, :, :2])
    rb = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def random_xyxy(n, seed):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, 0.6, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_box_conversions_roundtrip(seed):
    b = random_xyxy(13, seed)
    cxcywh = box_ops.box_xyxy_to_cxcywh(jnp.asarray(b))
    back = box_ops.box_cxcywh_to_xyxy(cxcywh)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-6, atol=1e-6)


def test_box_iou_matches_numpy_oracle():
    a = random_xyxy(7, 0)
    b = random_xyxy(9, 1)
    ours = np.asarray(box_ops.box_iou(jnp.asarray(a), jnp.asarray(b)))
    ref, _ = np_pairwise_iou(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_generalized_box_iou_matches_numpy_oracle():
    a = random_xyxy(7, 2)
    b = random_xyxy(9, 3)
    ours = np.asarray(box_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    ref = np_pairwise_giou(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_elementwise_giou_matches_diag():
    a = random_xyxy(8, 4)
    b = random_xyxy(8, 5)
    ours = np.asarray(
        box_ops.elementwise_generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    )
    full = np.asarray(box_ops.generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, np.diag(full), rtol=1e-5, atol=1e-6)


def test_inverse_sigmoid_matches_reference_semantics():
    x = np.array([0.0, 1e-6, 0.25, 0.5, 0.999, 1.0, -0.3, 1.4], np.float32)
    ours = np.asarray(box_ops.inverse_sigmoid(jnp.asarray(x)))
    xt = torch.from_numpy(x).clamp(0, 1)
    x1 = xt.clamp(min=1e-3)
    x2 = (1 - xt).clamp(min=1e-3)
    ref = torch.log(x1 / x2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
