"""Round-4: flagship eval fwd with the slab_dot Pallas contraction vs the
XLA separable einsum (PERF.md round-4 layout work).

Queued-dispatch timing (K dispatches + one scalar fetch), per PERF.md.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.ops.msda import msda_defaults
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

model = _flagship()
B, H, W, G = 1, 800, 1344, 8
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
mask = jnp.zeros((B, H, W), bool)
variables = _init_variables(
    model, images, mask, jnp.zeros((B, G), jnp.int32),
    jnp.full((B, G, 4), 0.5, jnp.float32), jnp.zeros((B, G), bool),
)
print("init done", flush=True)


def timed(tag, **overrides):
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
    print(json.dumps({"tag": tag, "ms": round(per * 1000, 2),
                      "img_s": round(1 / per, 2),
                      "compile_s": round(compile_s, 1),
                      "probe": r0}), flush=True)
    return per


variants = sys.argv[1:] or ["slab_on", "slab_off"]
for v in variants:
    if v == "slab_on":
        timed("slab_dot kernel (round-4 default)", tiled_slab_kernel=True)
    elif v == "slab_off":
        timed("XLA separable einsum (round-3e default)",
              tiled_slab_kernel=False)
