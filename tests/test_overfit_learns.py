"""End-to-end "it learns" proof (SURVEY §4 overfit-tiny-subset; round-4
verdict item 5): the full optimizer/criterion/CDN/hybrid stack, run as real
train steps from random init on 4 synthetic images, must (a) materially
reduce the total loss and (b) reach real detection AP on the training
images through the standard post_process + CocoEvaluator path.

Tuned on CPU (experiments/r5_overfit_tune.py): at 224x320 the tiny config
reaches AP 0.83 / AP50 1.0 by step 40 at lr 2e-4 (loss 44 -> 16). The test
runs a reduced 192x256 canvas for suite-budget reasons with conservative
thresholds (AP50 >= 0.5, final loss <= 0.55x initial).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from relation_detr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR
from relation_detr_tpu.models.post_process import post_process
from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
from relation_detr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
)
from relation_detr_tpu.utils.coco_eval import CocoEvaluator
from relation_detr_tpu.utils.param_groups import build_optimizer

B, H, W, G = 4, 192, 256, 5
SPECS = [  # (cat, x, y, w, h): one big saturated rectangle per image
    (1, 30, 25, 130, 100),
    (2, 140, 80, 100, 85),
    (3, 50, 60, 160, 100),
    (1, 80, 15, 120, 150),
]
COLORS = {1: (1.0, 0.15, 0.15), 2: (0.15, 1.0, 0.15), 3: (0.15, 0.15, 1.0)}
STEPS = 50
LR = 2e-4


def _make_batch():
    rng = np.random.RandomState(3)
    images = rng.randint(0, 60, (B, H, W, 3)).astype(np.float32) / 255.0
    gt_labels = np.zeros((B, G), np.int32)
    gt_boxes = np.full((B, G, 4), 0.5, np.float32)
    gt_valid = np.zeros((B, G), bool)
    for i, (cat, x, y, bw, bh) in enumerate(SPECS):
        images[i, y:y + bh, x:x + bw] = COLORS[cat]
        gt_labels[i, 0] = cat
        gt_boxes[i, 0] = [(x + bw / 2) / W, (y + bh / 2) / H, bw / W, bh / H]
        gt_valid[i, 0] = True
    images = (images - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    return {
        "images": jnp.asarray(images, jnp.float32),
        "mask": jnp.zeros((B, H, W), bool),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_valid": jnp.asarray(gt_valid),
    }


def _ann_json(path):
    images, annotations = [], []
    for i, (cat, x, y, bw, bh) in enumerate(SPECS):
        images.append({"id": i, "height": H, "width": W,
                       "file_name": f"{i}.jpg"})
        annotations.append({"id": i + 1, "image_id": i, "category_id": cat,
                            "bbox": [x, y, bw, bh], "area": bw * bh,
                            "iscrowd": 0})
    with open(path, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": f"c{c}"}
                                  for c in (1, 2, 3)]}, f)


@pytest.mark.slow
def test_overfit_four_images_reaches_ap(tmp_path):
    model = RelationDETR(
        num_classes=4, num_queries=60, hybrid_num_proposals=90,
        denoising_nums=5, transformer_enc_layers=1, transformer_dec_layers=2,
        backbone_arch="resnet18",
    )
    batch = _make_batch()
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "denoising": rng, "dropout": rng},
        batch["images"], batch["mask"], batch["gt_labels"],
        batch["gt_boxes"], batch["gt_valid"], train=True,
    )
    mesh = create_mesh(jax.devices()[:1])  # single device: B=4 % 8 != 0
    tx = build_optimizer(optax.constant_schedule(LR))
    state = create_train_state(dict(variables), tx, mesh)
    step = make_train_step(model, CriterionConfig(num_classes=4), tx, mesh,
                           donate=False)
    sb = shard_batch(mesh, batch)
    key = jax.random.key(1)

    losses = []
    for _ in range(STEPS):
        state, m = step(state, sb, key)
        losses.append(float(m["total_loss"]))
    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-5:]))
    assert np.isfinite(losses).all(), losses[-5:]
    assert last <= 0.55 * first, (first, last)

    # eval AP on the training images via the real decode + evaluator path
    vv = {"params": state.params, "batch_stats": state.batch_stats}
    out = model.apply(vv, batch["images"], batch["mask"], train=False)
    orig = jnp.asarray([[H, W]] * B, jnp.float32)
    det = post_process(out["pred_logits"], out["pred_boxes"], orig, 30)
    ann = tmp_path / "overfit_ann.json"
    _ann_json(ann)
    ev = CocoEvaluator(str(ann))
    for i in range(B):
        ev.update_from_arrays(
            i, np.asarray(det["boxes"][i]), np.asarray(det["scores"][i]),
            np.asarray(det["labels"][i]),
        )
    stats = ev.accumulate_and_summarize(verbose=False)
    assert stats["AP50"] >= 0.5, stats
