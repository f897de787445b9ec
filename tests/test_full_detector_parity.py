"""Full-detector torch parity: image -> detections through convert_state_dict.

Round-3 verdict item 3: the transformer-only parity harness left the
backbone (resnet.py:63-339), ChannelMapper (channel_mapper.py:27-89),
position-embedding integration, and PostProcess (post_process.py:28-43)
outside the shared-weight loop — a transposed ResNet stage or a wrong
FrozenBN fold passed every test. This test runs the SAME random weights
through the reference-shaped torch detector (tests/torch_oracle.py
FullDetector) and our flax RelationDETR via the converter — batch_stats
included — and compares final detections.
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.convert_torch_weights import convert_state_dict  # noqa: E402

from relation_detr_tpu.models.detector import RelationDETR  # noqa: E402
from relation_detr_tpu.models.post_process import post_process  # noqa: E402
from tests.torch_oracle import (  # noqa: E402
    FullDetector,
    RelationTransformer as TorchRelationTransformer,
    post_process_topk,
)

# toy dims: fast CPU loop, exercises batch>1 + per-image padding.
# flagship dims (round-4 verdict item 3): the REAL config — embed 256,
# 6+6 layers, 8 heads, 900 queries, d_ffn 2048
# (/root/reference/configs/relation_detr/relation_detr_resnet50_800_1333.py:32-111)
# on a small canvas, so head-dim/layer-count-dependent layout bugs the
# 64-dim loop can't see pass through the converter.
CASES = {
    "toy": dict(
        dims=dict(num_classes=7, embed_dim=64, d_ffn=128, num_heads=4,
                  num_levels=4, num_points=4, num_encoder_layers=2,
                  num_decoder_layers=2, two_stage_num_proposals=20,
                  hybrid_num_proposals=30),
        b=2, h=128, w=160, topk=25,
    ),
    "flagship": dict(
        dims=dict(num_classes=91, embed_dim=256, d_ffn=2048, num_heads=8,
                  num_levels=4, num_points=4, num_encoder_layers=6,
                  num_decoder_layers=6, two_stage_num_proposals=900,
                  hybrid_num_proposals=1500),
        b=1, h=256, w=320, topk=100,
    ),
}


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


@pytest.fixture(scope="module", params=["toy", "flagship"])
def detectors(request):
    case = CASES[request.param]
    DIMS = case["dims"]
    B, H, W = case["b"], case["h"], case["w"]
    torch.manual_seed(0)
    oracle = FullDetector(
        TorchRelationTransformer(**DIMS), DIMS["num_classes"],
        DIMS["embed_dim"],
    ).eval()
    # randomize FrozenBN stats so a wrong fold cannot hide behind the
    # (mean 0, var 1) defaults
    rng = np.random.RandomState(7)
    with torch.no_grad():
        for name, buf in oracle.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.from_numpy(
                    rng.randn(*buf.shape).astype(np.float32) * 0.2))
            elif name.endswith("running_var"):
                buf.copy_(torch.from_numpy(
                    rng.rand(*buf.shape).astype(np.float32) * 2 + 0.1))
            elif ".bn" in name or "downsample.1" in name:
                buf.copy_(torch.from_numpy(
                    rng.randn(*buf.shape).astype(np.float32) * 0.1 + 1))

    params_flat, stats_flat, leftover = convert_state_dict(
        dict(oracle.state_dict())
    )
    assert stats_flat, "FrozenBN stats must land in batch_stats"
    assert not [k for k in leftover if "position_relation" not in k], leftover

    model = RelationDETR(
        num_classes=DIMS["num_classes"], embed_dim=DIMS["embed_dim"],
        num_queries=DIMS["two_stage_num_proposals"],
        hybrid_num_proposals=DIMS["hybrid_num_proposals"],
        num_feature_levels=DIMS["num_levels"],
        num_heads=DIMS["num_heads"], dim_feedforward=DIMS["d_ffn"],
        transformer_enc_layers=DIMS["num_encoder_layers"],
        transformer_dec_layers=DIMS["num_decoder_layers"],
        backbone_arch="resnet50",
    )
    variables = model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        jnp.zeros((B, H, W, 3), jnp.float32), jnp.zeros((B, H, W), bool),
        jnp.zeros((B, 4), jnp.int32), jnp.full((B, 4, 4), 0.5),
        jnp.zeros((B, 4), bool), train=True,
    )

    def paths(tree):
        return {
            "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    params = _unflatten(params_flat)
    stats = _unflatten(stats_flat)
    want_p, got_p = paths(variables["params"]), paths(params)
    assert want_p.keys() == got_p.keys(), (
        f"missing: {sorted(set(want_p) - set(got_p))[:8]} "
        f"extra: {sorted(set(got_p) - set(want_p))[:8]}"
    )
    for k in want_p:
        assert want_p[k] == got_p[k], (k, want_p[k], got_p[k])
    want_s, got_s = paths(variables["batch_stats"]), paths(stats)
    assert want_s.keys() == got_s.keys(), (
        f"missing: {sorted(set(want_s) - set(got_s))[:8]} "
        f"extra: {sorted(set(got_s) - set(want_s))[:8]}"
    )

    # inputs: normalized-ish image with per-image padding (valid ratios)
    images = rng.randn(B, H, W, 3).astype(np.float32)
    mask = np.zeros((B, H, W), bool)
    mask[B - 1, (3 * H) // 4:, :] = True
    mask[B - 1, :, (3 * W) // 4:] = True
    images[mask] = 0.0
    variables = {"params": params, "batch_stats": stats}
    return oracle, model, variables, images, mask, case


def test_full_detector_eval_parity(detectors):
    oracle, model, variables, images, mask, _case = detectors
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(mask),
        )
    ours = model.apply(
        variables, jnp.asarray(images), jnp.asarray(mask), train=False
    )
    # raw heads through the whole stack: backbone -> neck -> pos-embeds ->
    # transformer; tolerance as in test_e2e_parity (fp32 fusion noise)
    if _case["dims"]["two_stage_num_proposals"] >= 900:
        # flagship dims: the two-stage top-900-of-~1700 proposal cut at
        # random init is tie-dense — fp noise flips a handful of boundary
        # proposals between the frameworks, making those QUERIES entirely
        # different objects (measured: ~11/900 flipped, the other 889 match
        # to 2e-3). Assert per-query: nearly all queries match tightly, so a
        # head-dim/layer-count-dependent layout bug (which corrupts EVERY
        # query) still fails loudly.
        for name, a, b in (
            ("pred_logits", ours["pred_logits"], ref[0][-1].numpy()),
            ("pred_boxes", ours["pred_boxes"], ref[1][-1].numpy()),
        ):
            a = np.asarray(a)
            bad = (
                np.abs(a - b) > 2e-3 + 2e-3 * np.abs(b)
            ).any(axis=-1)  # (B, Q) queries with any mismatched element
            frac = bad.mean()
            assert frac <= 0.03, (
                f"{name}: {bad.sum()}/{bad.size} queries mismatch "
                f"({frac:.1%}) — beyond proposal-tie noise"
            )
    else:
        np.testing.assert_allclose(
            np.asarray(ours["pred_logits"]), ref[0][-1].numpy(),
            rtol=2e-3, atol=2e-3, err_msg="pred_logits",
        )
        np.testing.assert_allclose(
            np.asarray(ours["pred_boxes"]), ref[1][-1].numpy(),
            rtol=2e-3, atol=2e-3, err_msg="pred_boxes",
        )


def test_full_detector_detections_parity(detectors):
    """Image -> final detections (PostProcess semantics,
    post_process.py:28-43): boxes/scores/labels match the torch pipeline."""
    oracle, model, variables, images, mask, case = detectors
    B, TOPK = case["b"], case["topk"]
    sizes = np.array(
        [[96.0, 128.0], [64.0, 80.0]][:B], np.float32
    )  # (h, w) per image
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(mask),
        )
        rboxes, rscores, rlabels = post_process_topk(
            ref[0][-1], ref[1][-1], torch.from_numpy(sizes), TOPK
        )
    ours = model.apply(
        variables, jnp.asarray(images), jnp.asarray(mask), train=False
    )
    det = post_process(
        ours["pred_logits"], ours["pred_boxes"], jnp.asarray(sizes), TOPK
    )
    np.testing.assert_allclose(
        np.asarray(det["scores"]), rscores.numpy(), rtol=2e-3, atol=2e-3
    )
    # top-k tie ordering can differ where scores are ~equal; compare as
    # (label, box) sets matched by score order per image
    for i in range(B):
        ours_set = sorted(
            zip(np.asarray(det["labels"])[i].tolist(),
                np.round(np.asarray(det["boxes"])[i], 2).tolist())
        )
        ref_set = sorted(
            zip(rlabels[i].tolist(), np.round(rboxes[i].numpy(), 2).tolist())
        )
        matched = sum(
            1 for a, b in zip(ours_set, ref_set)
            if a[0] == b[0] and np.allclose(a[1], b[1], atol=0.6)
        )
        # at random init the top-k boundary is tie-dense (81.9k candidate
        # scores at flagship dims); allow fp-noise reordering at the tail.
        # flagship additionally carries the two-stage proposal tie flips
        # (measured ~11/900 queries select different proposals at init —
        # see eval_parity above — and ~12 of those land in the top-100)
        allowed = max(2, TOPK // 10) if TOPK < 100 else TOPK // 5
        assert matched >= TOPK - allowed, (
            f"image {i}: only {matched}/{TOPK} matched"
        )
