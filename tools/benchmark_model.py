"""Model benchmark: params, FLOPs, per-image latency.

Mirrors /root/reference/tools/benchmark_model.py (fvcore FLOP table + timed
inference): FLOPs come from XLA's cost analysis of the compiled executable,
timing forces a device->host fetch per iteration (the axon platform's
block_until_ready is unreliable).

    python tools/benchmark_model.py --model-config configs/relation_detr/... \
        [--height 800 --width 1344 --batch 1 --reps 50]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config",
                   default="configs/relation_detr/relation_detr_resnet50_800_1333.py")
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--reps", type=int, default=50)
    return p.parse_args()


def main():
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    from relation_detr_tpu.utils.config import Config

    model = Config(args.model_config).model
    B, H, W, G = args.batch, args.height, args.width, 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    mask = jnp.zeros((B, H, W), bool)

    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0), "denoising": jax.random.key(1)},
            images, mask, jnp.zeros((B, G), jnp.int32),
            jnp.full((B, G, 4), 0.5, jnp.float32), jnp.zeros((B, G), bool),
            train=True,
        )
    )()
    n_params = sum(x.size for x in jax.tree.leaves(variables))
    print(f"params: {n_params / 1e6:.2f} M")

    fwd = jax.jit(lambda v, x, m: model.apply(v, x, m, train=False))
    lowered = fwd.lower(variables, images, mask)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = cost.get("flops", float("nan"))
        print(f"flops: {flops / 1e9:.1f} G (XLA cost analysis, batch {B})")
        print(f"bytes accessed: {cost.get('bytes accessed', float('nan')) / 1e9:.2f} G")
    except Exception as e:  # cost analysis may be unsupported on some backends
        print(f"cost analysis unavailable: {e}")

    out = compiled(variables, images, mask)
    _ = float(out["pred_logits"].sum())  # force completion
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = compiled(variables, images, mask)
        _ = float(out["pred_logits"].sum())
        times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50)) * 1000
    p90 = float(np.percentile(times, 90)) * 1000
    print(f"inference (single-fetch, incl. host round trip): "
          f"p50 {p50:.1f} ms  p90 {p90:.1f} ms")
    # queued timing amortizes the fetch round trip (~37 ms on the axon
    # relay, PERF.md) — this is the device-throughput number
    K = max(args.reps, 10)
    t0 = time.perf_counter()
    for _ in range(K):
        out = compiled(variables, images, mask)
    _ = float(out["pred_logits"].sum())
    per = (time.perf_counter() - t0) * 1000 / K
    print(f"inference (queued x{K}): {per:.1f} ms/iter  "
          f"({args.batch / (per / 1000):.2f} img/s)")


if __name__ == "__main__":
    main()
