"""Round-5: tile geometry follow-ups around the (12,8) T=96 win."""
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
images = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
mask = jnp.zeros((1, H, W), bool)
variables = _init_variables(
    model, images, mask, jnp.zeros((1, G), jnp.int32),
    jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
)
print("init done", flush=True)


def timed(tag, B=1, **overrides):
    imgs = images if B == 1 else jnp.asarray(
        rng.randn(B, H, W, 3).astype(np.float32))
    msk = jnp.zeros((B, H, W), bool)
    with msda_defaults(**overrides):
        fwd = jax.jit(lambda v, x, m: jnp.sum(
            model.apply(v, x, m, train=False)["pred_logits"]))
        t0 = time.perf_counter()
        r0 = float(fwd(variables, imgs, msk))
        compile_s = time.perf_counter() - t0
        float(fwd(variables, imgs, msk))
        K = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fwd(variables, imgs, msk)
        float(out)
        per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": tag, "B": B, "ms": round(per * 1000, 2),
                      "img_s": round(B / per, 2),
                      "compile_s": round(compile_s, 1), "probe": r0}),
          flush=True)


timed("tile (14,8) T=112", tiled_tile_tokens=(14, 8))
timed("tile (12,8) + fast halos of0", tiled_tile_tokens=(12, 8),
      tiled_halos=(4, 3, 2, 2), tiled_overflow=0)
timed("tile (12,8) B=4 unrolled", B=4, tiled_tile_tokens=(12, 8),
      tiled_batch_unroll=True)
timed("tile (24,8) T=192", tiled_tile_tokens=(24, 8))
