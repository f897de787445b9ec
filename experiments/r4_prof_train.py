"""Round-4: profile the flagship train step at the REAL loader capacity
(MAX_GT=100) and dump hlo_stats for r4_hlo_breakdown.py.

Usage: python experiments/r4_prof_train.py [GT]
"""
import glob
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
GT = int(sys.argv[1]) if len(sys.argv) > 1 else 100
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
model = _flagship()
variables = _init_variables(model, batch["images"], batch["mask"],
                            batch["gt_labels"][:, :8], batch["gt_boxes"][:, :8],
                            batch["gt_valid"][:, :8])
tx = build_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(dict(variables), tx, mesh)
step = make_train_step(model, CriterionConfig(num_classes=91), tx, mesh,
                       donate=False)
sb = shard_batch(mesh, batch)
key = jax.random.key(0)
state, m = step(state, sb, key)
print("first loss", float(m["total_loss"]), flush=True)
state, m = step(state, sb, key)
float(m["total_loss"])

jax.profiler.start_trace("/tmp/train_trace")
for _ in range(4):
    state, m = step(state, sb, key)
float(m["total_loss"])
jax.profiler.stop_trace()
print("trace done", flush=True)

xplanes = sorted(glob.glob("/tmp/train_trace/**/*.xplane.pb", recursive=True))
assert xplanes, "no xplane written"
from xprof.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode()
with open("/tmp/train_hlo_stats.json", "w") as f:
    f.write(data)
print("wrote /tmp/train_hlo_stats.json", len(data))
