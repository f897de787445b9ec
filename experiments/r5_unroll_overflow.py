"""Round-5: measure (a) tiled_batch_unroll at B=4, (b) the weight-keyed
top_k overflow channel at fast halos. Queued timing per PERF.md."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.ops.msda import msda_defaults
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

model = _flagship()
H, W, G = 800, 1344, 8
rng = np.random.RandomState(0)
v1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
m1 = jnp.zeros((1, H, W), bool)
variables = _init_variables(
    model, v1, m1, jnp.zeros((1, G), jnp.int32),
    jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
)
print("init done", flush=True)


def timed(tag, B, **overrides):
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)) if B > 1 \
        else v1
    mask = jnp.zeros((B, H, W), bool)
    with msda_defaults(**overrides):
        fwd = jax.jit(lambda v, x, m: jnp.sum(
            model.apply(v, x, m, train=False)["pred_logits"]))
        t0 = time.perf_counter()
        r0 = float(fwd(variables, images, mask))
        compile_s = time.perf_counter() - t0
        float(fwd(variables, images, mask))
        K = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fwd(variables, images, mask)
        float(out)
        per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": tag, "B": B, "ms": round(per * 1000, 2),
                      "img_s": round(B / per, 2),
                      "compile_s": round(compile_s, 1), "probe": r0}),
          flush=True)


which = set(sys.argv[1:]) or {"unroll", "overflow"}
if "unroll" in which:
    timed("B=4 batch-unrolled tiled encoder", 4, tiled_batch_unroll=True)
    timed("B=2 batch-unrolled", 2, tiled_batch_unroll=True)
if "overflow" in which:
    timed("fast halos + of8, top_k channel", 1,
          tiled_halos=(4, 3, 2, 2), tiled_overflow=8,
          tiled_batch_unroll=False)
    timed("auto halos + of8, top_k channel", 1, tiled_overflow=8,
          tiled_batch_unroll=False)
