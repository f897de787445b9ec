"""Every model family builds, runs a train forward, and yields finite loss+grads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relation_detr_tpu.losses.criterion import CriterionConfig, relation_detr_loss
from relation_detr_tpu.models.detector import RelationDETR

FAMILIES = {
    "relation": dict(with_hybrid=True, denoising="cdn", encoder_memory_fusion=True,
                     decoder_use_relation=True, query_source="tgt_embed"),
    "dino_pp": dict(with_hybrid=False, denoising="cdn", encoder_memory_fusion=False,
                    decoder_use_relation=True, query_source="tgt_embed"),
    "def_detr_pp": dict(with_hybrid=False, denoising=None, encoder_memory_fusion=False,
                        decoder_use_relation=True, query_source="tgt_embed"),
    "dn_def_detr_pp": dict(with_hybrid=False, denoising="dn", dn_groups=3,
                           encoder_memory_fusion=False, decoder_use_relation=True,
                           query_source="learned_anchor"),
    "dab_def_detr_pp": dict(with_hybrid=False, denoising=None,
                            encoder_memory_fusion=False, decoder_use_relation=True,
                            query_source="memory"),
}


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    B, H, W, G = 1, 64, 64, 6
    return {
        "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "mask": jnp.zeros((B, H, W), bool),
        "gt_labels": jnp.asarray(rng.randint(0, 10, (B, G)), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.clip(rng.uniform(0.2, 0.6, (B, G, 4)), 0.05, 0.95), jnp.float32
        ),
        "gt_valid": jnp.asarray(np.array([[True, True, True, False, False, False]])),
    }


@pytest.mark.parametrize("family", list(FAMILIES))
def test_family_train_and_eval(family, batch):
    kwargs = FAMILIES[family]
    model = RelationDETR(
        num_classes=10,
        num_queries=30,
        hybrid_num_proposals=40,
        denoising_nums=4,
        transformer_enc_layers=1,
        transformer_dec_layers=2,
        backbone_arch="resnet18",
        **kwargs,
    )
    cfg = CriterionConfig(num_classes=10,
                          class_loss_type="vari_focal" if family == "relation" else "focal",
                          two_stage_binary_cls=family == "def_detr_pp")
    variables = model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        batch["images"], batch["mask"], batch["gt_labels"], batch["gt_boxes"],
        batch["gt_valid"], train=True,
    )

    def loss_fn(v):
        out = model.apply(
            v, batch["images"], batch["mask"], batch["gt_labels"],
            batch["gt_boxes"], batch["gt_valid"], train=True,
            rngs={"denoising": jax.random.key(2)},
        )
        total, losses = relation_detr_loss(cfg, out, batch["gt_labels"],
                                           batch["gt_boxes"], batch["gt_valid"])
        return total, losses

    (total, losses), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(variables)
    assert np.isfinite(float(total)), family
    assert all(np.isfinite(float(v)) for v in losses.values()), family
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads)), family

    # family-specific output structure
    out = jax.jit(
        lambda v: model.apply(v, batch["images"], batch["mask"], train=False)
    )(variables)
    assert out["pred_logits"].shape == (1, 30, 10)
    if family in ("def_detr_pp", "dab_def_detr_pp", "dino_pp", "relation"):
        assert "enc_outputs" in out
    else:
        assert "enc_outputs" not in out
    if family == "dn_def_detr_pp":
        assert "loss_class_enc" not in losses
    if family == "relation":
        assert any(k.endswith("_hybrid") for k in losses)
    else:
        assert not any(k.endswith("_hybrid") for k in losses)
    if kwargs["denoising"]:
        assert "loss_class_dn" in losses
    else:
        assert "loss_class_dn" not in losses


def test_bf16_mixed_precision_policy(batch):
    """compute_dtype="bfloat16" (the --mixed-precision bf16 policy,
    reference main.py:28-35): params stay fp32, outputs stay fp32, and
    numerics track the fp32 forward within bf16 tolerance; train-mode grads
    stay finite."""
    kwargs = dict(
        num_classes=10, num_queries=30, hybrid_num_proposals=40,
        denoising_nums=4, transformer_enc_layers=1, transformer_dec_layers=2,
        backbone_arch="resnet18",
    )
    model32 = RelationDETR(**kwargs)
    model16 = RelationDETR(
        **kwargs, compute_dtype="bfloat16", backbone_dtype="bfloat16"
    )
    variables = model32.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        batch["images"], batch["mask"], batch["gt_labels"], batch["gt_boxes"],
        batch["gt_valid"], train=True,
    )
    # identical param tree: the policy is compute-only
    v16 = model16.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        batch["images"], batch["mask"], batch["gt_labels"], batch["gt_boxes"],
        batch["gt_valid"], train=True,
    )
    assert jax.tree.structure(variables) == jax.tree.structure(v16)
    assert all(x.dtype == y.dtype for x, y in
               zip(jax.tree.leaves(variables), jax.tree.leaves(v16)))

    out32 = jax.jit(lambda v: model32.apply(v, batch["images"], batch["mask"],
                                            train=False))(variables)
    out16 = jax.jit(lambda v: model16.apply(v, batch["images"], batch["mask"],
                                            train=False))(variables)
    assert out16["pred_logits"].dtype == jnp.float32
    assert out16["pred_boxes"].dtype == jnp.float32
    # Tolerance note: on a random-init model the two-stage top-k selects (and
    # orders) proposals differently under bf16 rounding, so elementwise
    # comparison of query-slot outputs is ill-posed. Robust checks instead:
    # the bulk of logits must track closely (median drift), and the top-k
    # *distributions* must agree — which catches dtype bugs (wrong island,
    # double rounding) that produce O(logit) errors everywhere.
    l16 = np.asarray(out16["pred_logits"])
    l32 = np.asarray(out32["pred_logits"])
    assert np.median(np.abs(l16 - l32)) < 0.05
    np.testing.assert_allclose(
        np.sort(l16.reshape(-1))[-50:], np.sort(l32.reshape(-1))[-50:], atol=0.3
    )
    # box sets match as sets: every bf16 box has a close fp32 counterpart
    b16 = np.asarray(out16["pred_boxes"])[0]
    b32 = np.asarray(out32["pred_boxes"])[0]
    d = np.abs(b16[:, None, :] - b32[None, :, :]).max(-1)
    assert float(np.median(d.min(1))) < 0.02

    cfg = CriterionConfig(num_classes=10)

    def loss_fn(v):
        out = model16.apply(
            v, batch["images"], batch["mask"], batch["gt_labels"],
            batch["gt_boxes"], batch["gt_valid"], train=True,
            rngs={"denoising": jax.random.key(2)},
        )
        total, _ = relation_detr_loss(cfg, out, batch["gt_labels"],
                                      batch["gt_boxes"], batch["gt_valid"])
        return total

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(variables)
    assert np.isfinite(float(total))
    leaves = jax.tree.leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)


def test_int8_slab_detector_drift(batch):
    """--msda-int8-slab (eval-only opt-in, PERF.md round 5): detector-level
    quantization drift stays in the bf16-policy tolerance class. Same
    robust-set comparisons as the bf16 test: the two-stage top-k can swap
    proposal order under rounding, so slot-wise comparison is ill-posed."""
    from relation_detr_tpu.ops.msda import msda_defaults

    kwargs = dict(
        num_classes=10, num_queries=30, hybrid_num_proposals=40,
        denoising_nums=4, transformer_enc_layers=1, transformer_dec_layers=2,
        backbone_arch="resnet18",
    )
    model = RelationDETR(**kwargs)
    variables = model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        batch["images"], batch["mask"], batch["gt_labels"], batch["gt_boxes"],
        batch["gt_valid"], train=True,
    )
    # force the tiled encoder path on CPU (auto dispatch routes off-TPU
    # traffic to corner_pack, which ignores the slab flag)
    with msda_defaults(impl="tiled_xla"):
        base = jax.jit(lambda v: model.apply(
            v, batch["images"], batch["mask"], train=False))(variables)
        base = jax.tree.map(np.asarray, base)
    with msda_defaults(impl="tiled_xla", tiled_int8_slab=True):
        q8 = jax.jit(lambda v: model.apply(
            v, batch["images"], batch["mask"], train=False))(variables)
        q8 = jax.tree.map(np.asarray, q8)

    lq, lb = q8["pred_logits"], base["pred_logits"]
    assert np.isfinite(lq).all()
    assert np.median(np.abs(lq - lb)) < 0.05
    np.testing.assert_allclose(
        np.sort(lq.reshape(-1))[-50:], np.sort(lb.reshape(-1))[-50:], atol=0.3
    )
    bq, bb = q8["pred_boxes"][0], base["pred_boxes"][0]
    d = np.abs(bq[:, None, :] - bb[None, :, :]).max(-1)
    assert float(np.median(d.min(1))) < 0.02
