"""Round-5: A/B the patch-slab element order (tiled_slab_order) on TPU.

The round-5 hlo profile shows XLA re-materializing every (layer, level)
patch slab into the dot's preferred layout: ~4.4 ms/iter at B=1 (ph-minor
want) and ~10 ms/image at B=4 (batch-minor want). Pre-arranging the slab
should kill the copy. Queued timing per PERF.md.

Usage: python experiments/r5_slab_order.py [b1|b4 ...]
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


which = set(sys.argv[1:]) or {"b1", "b4"}
if "b1" in which:
    timed("B=1 yx (round-4 default)", 1, tiled_slab_order="yx")
    timed("B=1 xy (ph-minor slab)", 1, tiled_slab_order="xy")
if "b4" in which:
    timed("B=4 yx (round-4 default)", 4, tiled_slab_order="yx")
    timed("B=4 bm (batch-minor slab)", 4, tiled_slab_order="bm")
    timed("B=4 xy", 4, tiled_slab_order="xy")
