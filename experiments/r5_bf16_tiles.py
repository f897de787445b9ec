"""Round-5: (a) bf16 compute-dtype eval forward at the current default
(the model is now HBM-bound everywhere, so the round-2 'noise-level' verdict
on bf16 eval deserves a re-measure), (b) tile geometry (12,10)/(12,8)
(T=120/96: less lane padding on every T-minor A/out tensor vs (10,8)'s
80->128). Queued timing per PERF.md."""
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


def build(backbone_dtype=None, compute_dtype=None):
    model = RelationDETR(
        num_classes=91, num_queries=900, hybrid_num_proposals=1500,
        denoising_nums=100, transformer_enc_layers=6,
        transformer_dec_layers=6, backbone_arch="resnet50",
        backbone_dtype=backbone_dtype, compute_dtype=compute_dtype,
    )
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "denoising": jax.random.key(1)},
            images, mask, jnp.zeros((1, G), jnp.int32),
            jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
            train=True,
        )
    )()
    return model, variables


def timed(tag, model, variables, **overrides):
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


which = set(sys.argv[1:]) or {"bf16", "tiles"}
if "bf16" in which:
    m, v = build("bfloat16", "bfloat16")
    timed("bf16 backbone+transformer compute (fp32 islands)", m, v)
if "tiles" in which:
    m, v = build()
    timed("tile (12,10) T=120", m, v, tiled_tile_tokens=(12, 10))
    timed("tile (12,8) T=96", m, v, tiled_tile_tokens=(12, 8))
