import numpy as np

import jax
import jax.numpy as jnp

from relation_detr_tpu.ops.nms import nms_mask
from relation_detr_tpu.utils.ema import ema_init, ema_update


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0., 0., 10., 10.],
        [1., 1., 11., 11.],   # IoU ~0.68 with box 0 -> suppressed
        [20., 20., 30., 30.],
        [0., 0., 10., 10.],   # duplicate of 0, lower score -> suppressed
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(jax.jit(lambda b, s: nms_mask(b, s, 0.5))(boxes, scores))
    assert keep.tolist() == [True, False, True, False]


def test_nms_respects_score_order_not_index_order():
    boxes = jnp.asarray([
        [0., 0., 10., 10.],
        [1., 1., 11., 11.],
    ])
    scores = jnp.asarray([0.5, 0.9])  # second box wins
    keep = np.asarray(nms_mask(boxes, scores, 0.5))
    assert keep.tolist() == [False, True]


def test_ema_converges_to_params():
    params = {"w": jnp.ones((3,)) * 2.0}
    ema = ema_init({"w": jnp.zeros((3,))})
    for _ in range(2000):
        ema = ema_update(ema, params, decay=0.99)
    np.testing.assert_allclose(np.asarray(ema["w"]), 2.0, rtol=1e-5)


def test_mixed_match_tiling():
    from relation_detr_tpu.losses.criterion import tile_targets

    gt_labels = jnp.asarray([[1, 2, -1]])
    gt_boxes = jnp.zeros((1, 3, 4))
    gt_valid = jnp.asarray([[True, True, False]])
    labels, boxes, valid = tile_targets(gt_labels, gt_boxes, gt_valid, 3, 100)
    assert labels.shape == (1, 9)
    # 2 real GTs, cap = min(50 // 2, 3) = 3 -> all copies valid for real rows
    assert np.asarray(valid).sum() == 6
    # tiny query budget caps copies: min(4 // 2, 3) = 2
    _, _, valid2 = tile_targets(gt_labels, gt_boxes, gt_valid, 3, 9)
    assert np.asarray(valid2).sum() == 4
