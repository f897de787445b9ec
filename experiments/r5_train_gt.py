"""Round-5: train-step wall cost vs GT capacity and the matcher's wall share.

The loader pads GT to a static capacity; the matcher's scan-over-rows runs
one serial while per (real or padded) row and the hybrid buffer is
6*capacity rows — so capacity sets the serial-window count regardless of
how many boxes the image actually has. COCO averages ~7 boxes/image.

Variants: capacity 100 vs 16 (both with ~30%/~50% real rows), each with the
real matcher and with a fixed dummy matching (ablation -> matcher wall).
Queued-dispatch timing per PERF.md.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.losses import criterion as crit
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
from relation_detr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
)
from relation_detr_tpu.utils.param_groups import build_optimizer
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

B, H, W = 1, 800, 1344
rng = np.random.RandomState(1)
mesh = create_mesh()
model = _flagship()
images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
mask = jnp.zeros((B, H, W), bool)
variables = _init_variables(
    model, images, mask, jnp.zeros((B, 8), jnp.int32),
    jnp.full((B, 8, 4), 0.5, jnp.float32), jnp.zeros((B, 8), bool),
)
print("init done", flush=True)


def make_batch(G, frac):
    r = np.random.RandomState(2)
    return {
        "images": images,
        "mask": mask,
        "gt_labels": jnp.asarray(r.randint(0, 91, (B, G)), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.clip(r.uniform(0.2, 0.6, (B, G, 4)), 0.05, 0.95), jnp.float32
        ),
        "gt_valid": jnp.asarray(r.rand(B, G) < frac),
    }


def timed(tag, G, frac=0.3, match_free=False, K=6):
    batch = make_batch(G, frac)
    orig = crit.compute_matching
    if match_free:
        # bypass the solver entirely: assign GT g -> query g (valid-masked
        # to -1), preserving compute_matching's (B, G) contract
        def dummy(cfg, pred_logits, pred_boxes, gt_labels, gt_boxes,
                  gt_valid, row_group=None):
            bsz, g = gt_valid.shape
            idx = jnp.broadcast_to(jnp.arange(g), (bsz, g))
            return jnp.where(gt_valid, idx, -1)
        crit.compute_matching = dummy
    try:
        tx = build_optimizer(optax.constant_schedule(1e-4))
        state = create_train_state(dict(variables), tx, mesh)
        step = make_train_step(model, CriterionConfig(num_classes=91), tx,
                               mesh, donate=False)
        sb = shard_batch(mesh, batch)
        key = jax.random.key(0)
        t0 = time.perf_counter()
        state, m = step(state, sb, key)
        probe = float(m["total_loss"])
        compile_s = time.perf_counter() - t0
        state, m = step(state, sb, key)
        float(m["total_loss"])
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, sb, key)
        float(m["total_loss"])
        per = (time.perf_counter() - t0) / K
    finally:
        crit.compute_matching = orig
    print(json.dumps({"tag": tag, "G": G, "ms": round(per * 1000, 1),
                      "compile_s": round(compile_s, 1),
                      "loss": round(probe, 3)}), flush=True)


which = sys.argv[1:] or ["gt100", "gt100_mf", "gt16", "gt16_mf"]
for v in which:
    if v == "gt100":
        timed("capacity 100 (bench operating point)", 100)
    elif v == "gt100_mf":
        timed("capacity 100, matching-free", 100, match_free=True)
    elif v == "gt16":
        timed("capacity 16 (COCO-typical bucket)", 16, frac=0.5)
    elif v == "gt16_mf":
        timed("capacity 16, matching-free", 16, frac=0.5, match_free=True)
