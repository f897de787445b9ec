"""Tune the overfit-learns test (VERDICT r4 item 5): how many steps / what LR
does the tiny model need to overfit 4 synthetic images to AP > 0.5?

Usage: JAX_PLATFORM_NAME=cpu python experiments/r5_overfit_tune.py [steps] [lr]
Prints loss every 10 steps and AP every 40. The winning (steps, lr) gets
frozen into tests/test_overfit_learns.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import json

import jax.numpy as jnp
import numpy as np
import optax

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

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
LR = float(sys.argv[2]) if len(sys.argv) > 2 else 2e-4

B, H, W, G = 4, 224, 320, 5
SPECS = [  # (cat, x, y, w, h) one box per image, big and saturated
    (1, 40, 30, 160, 120),
    (2, 180, 100, 120, 100),
    (3, 60, 80, 200, 120),
    (1, 100, 20, 150, 180),
]
COLORS = {1: (1.0, 0.15, 0.15), 2: (0.15, 1.0, 0.15), 3: (0.15, 0.15, 1.0)}


def make_batch():
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


def ann_json(path):
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


def eval_ap(model, variables, batch, ann_path):
    out = model.apply(variables, batch["images"], batch["mask"], train=False)
    orig = jnp.asarray([[H, W]] * B, jnp.float32)
    det = post_process(out["pred_logits"], out["pred_boxes"], orig, 30)
    ev = CocoEvaluator(ann_path)
    for i in range(B):
        ev.update_from_arrays(
            i, np.asarray(det["boxes"][i]), np.asarray(det["scores"][i]),
            np.asarray(det["labels"][i]),
        )
    return ev.accumulate_and_summarize(verbose=False)


def main():
    model = RelationDETR(
        num_classes=4, num_queries=60, hybrid_num_proposals=90,
        denoising_nums=5, transformer_enc_layers=1, transformer_dec_layers=2,
        backbone_arch="resnet18",
    )
    batch = make_batch()
    rng = jax.random.key(0)
    t0 = time.perf_counter()
    variables = model.init(
        {"params": rng, "denoising": rng, "dropout": rng},
        batch["images"], batch["mask"], batch["gt_labels"],
        batch["gt_boxes"], batch["gt_valid"], train=True,
    )
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

    mesh = create_mesh(jax.devices()[:1])
    tx = build_optimizer(optax.constant_schedule(LR))
    state = create_train_state(dict(variables), tx, mesh)
    step = make_train_step(model, CriterionConfig(num_classes=4), tx, mesh,
                           donate=False)
    sb = shard_batch(mesh, batch)
    key = jax.random.key(1)

    ann_path = "/tmp/overfit_ann.json"
    ann_json(ann_path)

    t0 = time.perf_counter()
    losses = []
    for i in range(STEPS):
        state, m = step(state, sb, key)
        if i == 0:
            print(f"step0 wall {time.perf_counter()-t0:.1f}s", flush=True)
        loss = float(m["total_loss"])
        losses.append(loss)
        if i % 10 == 0 or i == STEPS - 1:
            print(f"step {i:4d} loss {loss:8.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
        if (i + 1) % 40 == 0 or i == STEPS - 1:
            vv = {"params": state.params, "batch_stats": state.batch_stats}
            stats = eval_ap(model, vv, batch, ann_path)
            print(f"  AP {stats['AP']:.3f} AP50 {stats['AP50']:.3f}",
                  flush=True)
    print(f"first3 {np.mean(losses[:3]):.2f} last3 {np.mean(losses[-3:]):.2f}")


if __name__ == "__main__":
    main()
