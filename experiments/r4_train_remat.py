"""Round-4: train-step remat-policy A/B at the REAL loader capacity.

Usage: python experiments/r4_train_remat.py [GT] [policy ...]
Queued timing (K dispatched steps + one scalar fetch), PERF.md methodology.
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
args = sys.argv[1:]
GT = int(args[0]) if args and args[0].isdigit() else 100
policies = [a for a in args if not a.isdigit()] or ["none", "dots", "save_all"]
rng = np.random.RandomState(0)
batch = {
    "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
    "mask": jnp.zeros((B, H, W), bool),
    "gt_labels": jnp.asarray(rng.randint(0, 91, (B, GT)), jnp.int32),
    "gt_boxes": jnp.asarray(
        np.clip(rng.uniform(0.2, 0.6, (B, GT, 4)), 0.05, 0.95), jnp.float32
    ),
    "gt_valid": jnp.asarray(rng.rand(B, GT) < 0.3),
}
mesh = create_mesh()
key = jax.random.key(0)

for pol in policies:
    model = _flagship()
    if pol != "none":
        model = model.clone(remat_policy=pol)
    variables = _init_variables(
        model, batch["images"], batch["mask"], batch["gt_labels"][:, :8],
        batch["gt_boxes"][:, :8], batch["gt_valid"][:, :8]
    )
    tx = build_optimizer(optax.constant_schedule(1e-4))
    state = create_train_state(dict(variables), tx, mesh)
    step = make_train_step(model, CriterionConfig(num_classes=91), tx, mesh,
                           donate=False)
    sb = shard_batch(mesh, batch)
    t0 = time.perf_counter()
    state, m = step(state, sb, key)
    loss0 = float(m["total_loss"])
    compile_s = time.perf_counter() - t0
    state, m = step(state, sb, key)
    float(m["total_loss"])
    K = 8
    t0 = time.perf_counter()
    for _ in range(K):
        state, m = step(state, sb, key)
    float(m["total_loss"])
    per = (time.perf_counter() - t0) / K
    print(json.dumps({
        "policy": pol, "gt": GT, "ms_step": round(per * 1000, 1),
        "compile_s": round(compile_s, 1), "loss": round(loss0, 3),
        "grad_norm": round(float(m["grad_norm"]), 2),
    }), flush=True)
