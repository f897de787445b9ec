"""Round-4: re-measure the overflow-8 side channel under the parts-layout
accumulate (PERF.md round 4).

Round-3b measured overflow-8 at +20 ms with root cause open. The prime
suspect was the per-level residual add into the 4x lane-padded (B,nt,T,H,D)
f32 accumulator — which the parts refactor removed (the residual now joins
the token-ordered parts sum). If the channel is now cheap, the reduced-halo
profile (4,3,2,2 + overflow-8, exact for any offsets) becomes a candidate
default.

Queued-dispatch timing (K dispatches + one scalar fetch), per PERF.md.
"""
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


variants = sys.argv[1:] or ["fast_of8", "fast_of0", "auto_of8"]
for v in variants:
    if v == "fast_of8":
        timed("halos (4,3,2,2) + overflow-8 (exact any offsets)",
              tiled_halos=(4, 3, 2, 2), tiled_overflow=8)
    elif v == "fast_of0":
        timed("halos (4,3,2,2) overflow 0 (init-clamping lower bound)",
              tiled_halos=(4, 3, 2, 2), tiled_overflow=0)
    elif v == "auto_of8":
        timed("auto halos + overflow-8 (channel cost at default halos)",
              tiled_overflow=8)
    elif v == "default":
        timed("default (auto halos, overflow auto=0)")
