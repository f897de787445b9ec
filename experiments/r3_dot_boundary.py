"""Round-3e: verify the bf16 dot-boundary cast on TPU.

Claim under test: XLA's DEFAULT dot precision already rounds f32 operands
to bf16 on the MXU, so explicitly casting the A matrix / patch slab at the
einsum boundary changes NOTHING numerically on TPU while halving the dot
operands' HBM traffic. Prints max|diff| of pred_logits/pred_boxes between
tiled_dot_bf16 off/on, and queued timings of both.
"""
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


def run(flag):
    with msda_defaults(tiled_dot_bf16=flag):
        fwd = jax.jit(lambda v, x, m: model.apply(v, x, m, train=False))
        out = fwd(variables, images, mask)
        logits = np.asarray(out["pred_logits"])
        boxes = np.asarray(out["pred_boxes"])
        # queued timing on a scalar-fetch variant
        fwd_s = jax.jit(
            lambda v, x, m: jnp.sum(model.apply(v, x, m, train=False)["pred_logits"])
        )
        float(fwd_s(variables, images, mask))
        float(fwd_s(variables, images, mask))
        K = 20
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = fwd_s(variables, images, mask)
        float(o)
        ms = (time.perf_counter() - t0) / K * 1000
    return logits, boxes, ms


log_off, box_off, ms_off = run(False)
print(f"tiled_dot_bf16=False: {ms_off:.1f} ms", flush=True)
log_on, box_on, ms_on = run(True)
print(f"tiled_dot_bf16=True:  {ms_on:.1f} ms", flush=True)
dl = np.abs(log_on - log_off)
db = np.abs(box_on - box_off)
print(f"max|dlogits|={dl.max():.3e} mean={dl.mean():.3e} "
      f"max|dboxes|={db.max():.3e} bitwise_logits={np.array_equal(log_on, log_off)} "
      f"bitwise_boxes={np.array_equal(box_on, box_off)}")
