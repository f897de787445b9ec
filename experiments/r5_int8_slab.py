"""Round-5: int8 patch slab — the last untried bytes lever (PERF.md).

The eval forward is bytes-bound (10.4 GB/fwd at 246 GB/s avg = 30% of the
v5e roofline). The patch slab + its dot-layout copies are the largest
single buffer family; storing the slab int8 with per-channel scales halves
their bytes vs bf16, at quantization error ~amax/254 per channel (beyond
the bf16 accuracy class — eval-only opt-in, never a default without an mAP
study). Queued timing per PERF.md; probe printed so numerics drift is
visible at a glance.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from relation_detr_tpu.models.detector import RelationDETR
from relation_detr_tpu.ops.msda import msda_defaults
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

H, W, G = 800, 1344, 8
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
mask = jnp.zeros((1, H, W), bool)

model = RelationDETR(
    num_classes=91, num_queries=900, hybrid_num_proposals=1500,
    denoising_nums=100, transformer_enc_layers=6,
    transformer_dec_layers=6, backbone_arch="resnet50",
)
variables = jax.jit(
    lambda: model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        images, mask, jnp.zeros((1, G), jnp.int32),
        jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
        train=True,
    )
)()
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
                      "compile_s": round(compile_s, 1), "probe": r0}),
          flush=True)


which = set(sys.argv[1:]) or {"base", "int8", "int8fast"}
if "base" in which:
    timed("default (bf16 slab, tile (12,8))")
if "int8" in which:
    timed("int8 slab + per-channel dequant", tiled_int8_slab=True)
if "int8fast" in which:
    # the trained-checkpoint fast profile: reduced halos shrink the slab
    # the int8 store then halves again
    timed("int8 slab + fast halos of0", tiled_int8_slab=True,
          tiled_halos=(4, 3, 2, 2), tiled_overflow=0)

if "b4" in which:
    # B=4: the regression's root cause was slab layout copies (~10 ms/img,
    # PERF.md round 5) — the int8 slab halves exactly those bytes
    images4 = jnp.asarray(
        np.random.RandomState(1).randn(4, H, W, 3).astype(np.float32))
    mask4 = jnp.zeros((4, H, W), bool)
    with msda_defaults(tiled_int8_slab=True, tiled_batch_unroll=True):
        fwd = jax.jit(lambda v, x, m: jnp.sum(
            model.apply(v, x, m, train=False)["pred_logits"]))
        t0 = time.perf_counter()
        r0 = float(fwd(variables, images4, mask4))
        compile_s = time.perf_counter() - t0
        float(fwd(variables, images4, mask4))
        K = 10
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fwd(variables, images4, mask4)
        float(out)
        per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": "int8 slab B=4 unrolled", "ms": round(per*1000, 2),
                      "img_s": round(4/per, 2), "compile_s": round(compile_s, 1),
                      "probe": r0}), flush=True)
