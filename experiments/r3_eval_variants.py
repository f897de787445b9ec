"""Round-3 experiment: flagship eval fwd timings across MSDA variants.

Measured with the relay-aware queued-dispatch method (PERF.md): K async
dispatches + ONE scalar fetch; per-iter = total/K.
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

variants = sys.argv[1:] or ["default", "fast_ovf8", "fast_ovf0", "noprepack"]
for v in variants:
    if v == "default":
        timed("default auto halos + prepack")
    elif v == "fast_ovf8":
        timed("halos 4322 + overflow 8", tiled_halos=(4, 3, 2, 2), tiled_overflow=8)
    elif v == "fast_ovf0":
        timed("halos 4322 overflow 0", tiled_halos=(4, 3, 2, 2), tiled_overflow=0)
    elif v == "noprepack":
        timed("auto halos, prepack OFF", decoder_prepack=False)
    elif v == "fast_ovf32":
        timed("halos 4322 + overflow 32", tiled_halos=(4, 3, 2, 2), tiled_overflow=32)
    elif v == "auto_ovf8":
        timed("auto halos + overflow 8", tiled_overflow=8)
    elif v == "m1":
        timed("auto halos margin1", tiled_margin=1)
    elif v == "m1_rel3":
        from relation_detr_tpu.ops.relation_pallas import set_fused_relation
        set_fused_relation(version=3)
        timed("auto halos margin1 + separable relation", tiled_margin=1)
        set_fused_relation(version=1)
    elif v == "m1_ovf8":
        timed("auto margin1 + ovf8 (vpu residual)", tiled_margin=1, tiled_overflow=8)
    elif v == "fast_ovf8_m1":
        timed("halos 4322 margin1 + ovf8 (vpu residual)",
              tiled_halos=(4, 3, 2, 2), tiled_margin=1, tiled_overflow=8)
    elif v == "m1_t58":
        timed("auto margin1 tile(5,8)", tiled_margin=1, tiled_tile_tokens=(5, 8))
    elif v == "slices_c":
        timed("auto halos + slices (compile check)", tiled_patch_mode="slices")
    elif v == "fast_slices":
        timed("fast halos + slices (new fast profile)",
              tiled_halos=(4, 3, 2, 2), tiled_overflow=0,
              tiled_patch_mode="slices")

def extra_variants(v):
    if v == "auto_m1":
        timed("auto halos margin 1", tiled_margin=1)
    elif v == "auto_m0":
        timed("auto halos margin 0", tiled_margin=0)
    elif v == "fast_m1_ovf8":
        timed("halos 4322 margin1 + ovf8", tiled_halos=(4,3,2,2), tiled_margin=1, tiled_overflow=8)
    elif v == "auto_m0_t58":
        timed("auto m0 tile(5,8)", tiled_margin=0, tiled_tile_tokens=(5,8))
    elif v == "auto_m0_t88":
        timed("auto m0 tile(8,8)", tiled_margin=0, tiled_tile_tokens=(8,8))
    # round-3d probes: post-separable-build the A einsum operand is the
    # dominant encoder HBM traffic (~780 MB/layer) and its (pw, T) minor
    # dims pad to (24, 128) sublane/lane tiles (~1.9x waste at T=80).
    elif v == "bf16A":
        timed("separable A + patch einsum in bf16", tiled_dtype=jnp.bfloat16)
    elif v == "t168":
        timed("tile(16,8): T=128 lane-exact A", tiled_tile_tokens=(16, 8))
    elif v == "t168_bf16A":
        timed("tile(16,8) + bf16 A", tiled_tile_tokens=(16, 8),
              tiled_dtype=jnp.bfloat16)
    elif v == "sepk":
        timed("fused separable-A Pallas kernel", tiled_sep_kernel=True)
    elif v == "sepk_t168":
        timed("fused sep kernel + tile(16,8)", tiled_sep_kernel=True,
              tiled_tile_tokens=(16, 8))
    else:
        return False
    return True

for v in variants:
    extra_variants(v)

def timed2(tag, model_kwargs=None, **overrides):
    m = _flagship(**(model_kwargs or {}))
    with msda_defaults(**overrides):
        fwd = jax.jit(lambda v, x, m_: jnp.sum(
            m.apply(v, x, m_, train=False)["pred_logits"]))
        v2 = _init_variables(
            m, images, mask, jnp.zeros((1, G), jnp.int32),
            jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
        )
        float(fwd(v2, images, mask)); float(fwd(v2, images, mask))
        K = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fwd(v2, images, mask)
        float(out)
        per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": tag, "ms": round(per * 1000, 2),
                      "img_s": round(1 / per, 2)}), flush=True)

for v in variants:
    if v == "dec1":
        timed2("auto halos dec_layers=1", {"dec_layers": 1})
    elif v == "enc1":
        timed2("auto halos enc_layers=1", {"enc_layers": 1})
    elif v == "norel":
        timed2("auto halos no relation bias")  # placeholder; see below


def timed3(tag, model=None, **overrides):
    m = model if model is not None else _flagship()
    with msda_defaults(**overrides):
        fwd = jax.jit(lambda v, x, mm: jnp.sum(
            m.apply(v, x, mm, train=False)["pred_logits"]))
        v2 = _init_variables(
            m, images, mask, jnp.zeros((1, G), jnp.int32),
            jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
        )
        float(fwd(v2, images, mask)); float(fwd(v2, images, mask))
        K = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fwd(v2, images, mask)
        float(out)
        per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": tag, "ms": round(per * 1000, 2),
                      "img_s": round(1 / per, 2)}), flush=True)

for v in variants:
    if v == "norel":
        timed3("no relation bias", _flagship().clone(decoder_use_relation=False))
    elif v == "slices":
        timed3("auto halos, patch static slices", tiled_patch_mode="slices")
    elif v == "slices_m0":
        timed3("auto m0, patch static slices", tiled_patch_mode="slices", tiled_margin=0)
