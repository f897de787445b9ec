import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, optax

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
from relation_detr_tpu.parallel.train_step import create_train_state, make_train_step
from relation_detr_tpu.utils.param_groups import build_optimizer
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
B, H, W, G = 1, 800, 1344, 20
rng = np.random.RandomState(0)
batch = {
    "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
    "mask": jnp.zeros((B, H, W), bool),
    "gt_labels": jnp.asarray(rng.randint(0, 91, (B, G)), jnp.int32),
    "gt_boxes": jnp.asarray(np.clip(rng.uniform(0.2, 0.6, (B, G, 4)), 0.05, 0.95), jnp.float32),
    "gt_valid": jnp.asarray(rng.rand(B, G) < 0.8),
}
mesh = create_mesh()
model = _flagship()
variables = _init_variables(model, batch["images"], batch["mask"],
                            batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"])
tx = build_optimizer(optax.constant_schedule(1e-4))
state = create_train_state(variables, tx)
step = make_train_step(model, CriterionConfig(num_classes=91), tx, mesh, donate=False)
sb = shard_batch(mesh, batch)
key = jax.random.key(0)
state, m = step(state, sb, key)
print("first loss", float(m["total_loss"]), flush=True)
state, m = step(state, sb, key)
float(m["total_loss"])

jax.profiler.start_trace("/tmp/train_trace")
for _ in range(3):
    state, m = step(state, sb, key)
float(m["total_loss"])
jax.profiler.stop_trace()
print("trace done", flush=True)
