"""Diagnose the round-4 train-step pathology (bench measured 67 s/step at
MAX_GT=100 vs round-3's 363 ms). Per-step wall times + compile logging."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_log_compiles", True)

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

model = _flagship()
B, H, W = 1, 800, 1344
GT = int(__import__("sys").argv[1]) if len(__import__("sys").argv) > 1 else 100
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
mask = jnp.zeros((B, H, W), bool)
rng1 = np.random.RandomState(1)
tb = {
    "images": images,
    "mask": mask,
    "gt_labels": jnp.asarray(rng1.randint(0, 91, (B, GT)), jnp.int32),
    "gt_boxes": jnp.asarray(
        np.clip(rng1.uniform(0.2, 0.6, (B, GT, 4)), 0.05, 0.95), jnp.float32
    ),
    "gt_valid": jnp.asarray(rng1.rand(B, GT) < 0.3),
}
variables = _init_variables(
    model, images, mask, tb["gt_labels"][:, :8],
    tb["gt_boxes"][:, :8], tb["gt_valid"][:, :8],
)
print("init done", flush=True)

mesh = create_mesh()
tx = build_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(dict(variables), tx, mesh)
step = make_train_step(model, CriterionConfig(num_classes=91), tx, mesh,
                       donate=False)
sb = shard_batch(mesh, tb)
key = jax.random.key(0)

t0 = time.perf_counter()
state, m = step(state, sb, key)
loss = float(m["total_loss"])
print(f"step 0 (compile): {time.perf_counter()-t0:.1f} s, loss={loss:.3f}",
      flush=True)
for i in range(1, 5):
    t0 = time.perf_counter()
    state, m = step(state, sb, key)
    loss = float(m["total_loss"])
    print(f"step {i}: {time.perf_counter()-t0:.3f} s, loss={loss:.3f}",
          flush=True)

# queued timing (K dispatches + one fetch) — comparable to the PERF.md ladder
K = 8
t0 = time.perf_counter()
for _ in range(K):
    state, m = step(state, sb, key)
loss = float(m["total_loss"])
per = (time.perf_counter() - t0) / K
print(f"queued x{K}: {per*1000:.1f} ms/step (GT={GT}), loss={loss:.3f}",
      flush=True)
