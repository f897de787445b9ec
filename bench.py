"""Benchmark: RelationDETR-R50 inference at 800x1333 on one TPU chip.

Prints ONE JSON line: images/sec/chip at the best batch size, plus p50
latency at batch 1 in the payload.

Timing forces a device->host scalar fetch per iteration (this container's
axon platform does not block in block_until_ready; see PERF.md).

vs_baseline: the reference publishes no throughput numbers
(/root/reference/README.md has mAP only; tools/benchmark_model.py is ad hoc).
We use a documented proxy: DINO-class R50 detectors at 800x1333 run ~20-25
img/s on A100 with the CUDA MSDeformAttn op; vs_baseline is ours / 22.0.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_PROXY_IMG_PER_SEC = 22.0


def main():
    from __graft_entry__ import _flagship, _init_variables
    from relation_detr_tpu.ops.msda import set_msda_defaults

    set_msda_defaults(impl="corner_pack")  # fastest measured variant (PERF.md)
    model = _flagship()
    H, W, G = 800, 1344, 8

    def make_inputs(batch):
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randn(batch, H, W, 3).astype(np.float32))
        mask = jnp.zeros((batch, H, W), bool)
        return images, mask

    images1, mask1 = make_inputs(1)
    variables = _init_variables(
        model,
        images1,
        mask1,
        jnp.zeros((1, G), jnp.int32),
        jnp.full((1, G, 4), 0.5, jnp.float32),
        jnp.zeros((1, G), bool),
    )

    fwd = jax.jit(
        lambda v, x, m: jnp.sum(model.apply(v, x, m, train=False)["pred_logits"])
    )

    results = {}
    for batch in (1, 4):
        images, mask = make_inputs(batch)
        float(fwd(variables, images, mask))  # compile + warm
        float(fwd(variables, images, mask))
        times = []
        for _ in range(12):
            t0 = time.perf_counter()
            float(fwd(variables, images, mask))  # scalar fetch forces sync
            times.append(time.perf_counter() - t0)
        p50 = float(np.percentile(times, 50))
        results[batch] = {"p50_s": p50, "img_per_s": batch / p50}

    best = max(results.values(), key=lambda r: r["img_per_s"])
    payload = {
        "metric": "images_per_sec_per_chip",
        "value": round(best["img_per_s"], 3),
        "unit": "img/s",
        "vs_baseline": round(best["img_per_s"] / A100_PROXY_IMG_PER_SEC, 3),
        "p50_latency_ms_b1": round(results[1]["p50_s"] * 1000, 2),
        "per_batch": {str(k): {kk: round(vv, 4) for kk, vv in v.items()}
                      for k, v in results.items()},
        "model": "relation_detr_resnet50_800_1333 (eval forward, corner_pack msda)",
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
