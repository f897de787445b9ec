"""CDN/DN layout golden tests vs the reference formulas (denoising.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relation_detr_tpu.models.denoising import GenerateDenoisingQueries
from relation_detr_tpu.models.transformer import NEG_INF


def run_generator(contrastive, n_gt=(3, 5), denoising_nums=10, groups=4,
                  num_matching=7, num_classes=9, cap=8):
    bs = len(n_gt)
    rng = np.random.RandomState(0)
    gt_labels = jnp.asarray(rng.randint(0, num_classes, (bs, cap)), jnp.int32)
    gt_boxes = jnp.asarray(
        np.clip(rng.uniform(0.2, 0.6, (bs, cap, 4)), 0.05, 0.95), jnp.float32
    )
    gt_valid = jnp.asarray([[i < n for i in range(cap)] for n in n_gt])
    gen = GenerateDenoisingQueries(
        num_classes=num_classes, embed_dim=32, contrastive=contrastive,
        denoising_nums=denoising_nums, denoising_groups=groups,
        max_gt_cap_dn=6, with_indicator=not contrastive,
        label_noise_prob=0.0, box_noise_scale=0.0,
    )
    variables = gen.init(jax.random.key(0), gt_labels, gt_boxes, gt_valid,
                         num_matching, jax.random.key(1))
    out = gen.apply(variables, gt_labels, gt_boxes, gt_valid, num_matching,
                    jax.random.key(2))
    return out, gt_labels, gt_boxes, gt_valid


def test_cdn_group_count_matches_reference_formula():
    # groups = denoising_nums // max_gt (denoising.py:253-254); max_gt = 5
    (_, _, _, meta), *_ = run_generator(True)
    assert int(meta.max_gt) == 5
    assert int(meta.groups) == 10 // 5


def test_cdn_slot_layout_positive_negative_alternate():
    (labels_q, boxes_q, bias, meta), gt_labels, gt_boxes, gt_valid = run_generator(True)
    max_gt, groups = int(meta.max_gt), int(meta.groups)
    pos = np.asarray(meta.dn_positive)
    gt_idx = np.asarray(meta.dn_gt_index)
    # rep r = slot // max_gt: even rep positive, odd negative (within used groups)
    for b, n in enumerate((3, 5)):
        for slot in range(2 * groups * max_gt):
            rep, k = divmod(slot, max_gt)
            expect_pos = (rep % 2 == 0) and k < n
            assert bool(pos[b, slot]) == expect_pos, (b, slot)
            if expect_pos:
                assert gt_idx[b, slot] == k


def test_cdn_noiseless_boxes_equal_gt():
    # with box_noise_scale=0 the noised boxes are the (clamped-logit) GTs
    (_, boxes_q, _, meta), _, gt_boxes, _ = run_generator(True)
    from relation_detr_tpu.ops.boxes import inverse_sigmoid

    b, slot = 1, 2  # group 0, positive rep, gt 2 (valid: image 1 has 5 gts)
    expected = np.asarray(inverse_sigmoid(gt_boxes[b, 2]))
    np.testing.assert_allclose(np.asarray(boxes_q[b, slot]), expected, rtol=1e-5)


def test_attention_bias_block_structure():
    (_, _, bias, meta), *_ = run_generator(True, num_matching=7)
    bias = np.asarray(bias[0, 0])
    max_gt, groups = int(meta.max_gt), int(meta.groups)
    dn_cap = bias.shape[0] - 7
    blocked = bias <= NEG_INF / 2
    # matching queries cannot see any dn key
    assert blocked[dn_cap:, :dn_cap].all()
    # matching <-> matching fully open
    assert not blocked[dn_cap:, dn_cap:].any()
    # dn queries see matching keys
    assert not blocked[:dn_cap, dn_cap:].any()
    # group 0 cannot see group 1's keys and vice versa
    g0 = slice(0, 2 * max_gt)
    g1 = slice(2 * max_gt, 4 * max_gt)
    assert blocked[g0, g1].all() and blocked[g1, g0].all()
    # within-group open
    assert not blocked[g0, g0].any()


def test_dn_variant_indicator_and_groups():
    (labels_q, _, _, meta), *_ = run_generator(False, groups=4)
    # DN: all used slots positive; indicator channel == 1 on valid slots
    valid = np.asarray(meta.dn_valid)
    pos = np.asarray(meta.dn_positive)
    assert (pos == valid).all()
    ind = np.asarray(labels_q[..., -1])
    assert (ind[valid] == 1.0).all()
    assert (ind[~valid] == 0.0).all()
    assert int(meta.groups) == min(4, labels_q.shape[1] // int(meta.max_gt))
