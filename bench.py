"""Benchmark: RelationDETR-R50 inference at 800x1333 on one TPU chip.

Prints ONE JSON line: images/sec/chip at the best batch size, plus p50
latency at batch 1 in the payload.

Timing methodology (PERF.md "axon quirks"): this container's axon platform
adds a ~37 ms host<->device relay round trip per blocking fetch and does not
block in block_until_ready. Latency therefore uses K queued dispatches with
ONE scalar fetch at the end — dispatches are async, the device runs them
back to back, and the relay cost amortizes to ~37/K ms. p50_latency_ms_b1 is
additionally reported from single-fetch timing (upper bound incl. relay).

vs_baseline: the reference publishes no throughput numbers
(/root/reference/README.md has mAP only; tools/benchmark_model.py is ad hoc).
We use a documented proxy: DINO-class R50 detectors at 800x1333 run ~20-25
img/s on A100 with the CUDA MSDeformAttn op; vs_baseline is ours / 22.0.
Provenance + uncertainty band (~±20%): see BASELINE.md "Provenance ... A100
proxy" — values within ±0.2 of a threshold are inside the proxy's noise.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# documented proxy, NOT a measurement — see BASELINE.md "Provenance +
# uncertainty of the 22.0 img/s A100 proxy" for basis + uncertainty band
A100_PROXY_IMG_PER_SEC = 22.0
V5E_PEAK_BF16_FLOPS = 197e12  # per-chip MXU peak (bf16 multiply, f32 acc)


def main():
    from __graft_entry__ import _flagship, _init_variables
    from relation_detr_tpu.ops.msda import set_msda_defaults
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    # auto = tiled one-hot-matmul MSDA in the encoder (MXU path),
    # corner-packed gather in the decoder (PERF.md ladder)
    set_msda_defaults(impl="auto")
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

    from relation_detr_tpu.ops.msda import msda_defaults

    def _fwd(v, x, m):
        # single-chip eval: trace-time batch unroll of the tiled encoder
        # (B>1 slab layout copies; PERF.md round 5)
        with msda_defaults(tiled_batch_unroll=True):
            return jnp.sum(model.apply(v, x, m, train=False)["pred_logits"])

    fwd = jax.jit(_fwd)

    # XLA cost-analysis FLOPs for the B=1 eval forward -> MFU against the
    # v5e roofline (round-4 verdict item 9: anchor the gather-bound claim)
    flops_g = None
    try:
        cost = fwd.lower(variables, images1, mask1).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_g = float(cost.get("flops", float("nan"))) / 1e9
        if not np.isfinite(flops_g):  # missing key -> NaN would emit
            flops_g = None  # invalid JSON downstream (ADVICE r4)
    except Exception:
        import traceback

        traceback.print_exc()

    results = {}
    for batch in (1, 4):
        images, mask = make_inputs(batch)
        float(fwd(variables, images, mask))  # compile + warm
        float(fwd(variables, images, mask))
        # single-fetch p50 (includes the relay round trip)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(fwd(variables, images, mask))  # scalar fetch forces sync
            times.append(time.perf_counter() - t0)
        p50_single = float(np.percentile(times, 50))
        # queued: K dispatches, one fetch -> amortized device time
        K = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(K):
            out = fwd(variables, images, mask)
        float(out)
        per_iter = (time.perf_counter() - t0) / K
        results[batch] = {
            "p50_single_fetch_s": p50_single,
            "queued_s_per_iter": per_iter,
            "img_per_s": batch / per_iter,
        }

    # train step at the REAL loader capacity (MAX_GT=100 -> 600-row hybrid
    # buffer), B=1, shipped defaults (round-4 verdict item 2)
    train_ms = None
    train16_ms = None
    train_flops_g = None
    try:
        import optax

        from relation_detr_tpu.losses.criterion import CriterionConfig
        from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
        from relation_detr_tpu.parallel.train_step import (
            create_train_state,
            make_train_step,
        )

        GT = 100
        rng = np.random.RandomState(1)
        tb = {
            "images": images1,
            "mask": mask1,
            "gt_labels": jnp.asarray(rng.randint(0, 91, (1, GT)), jnp.int32),
            "gt_boxes": jnp.asarray(
                np.clip(rng.uniform(0.2, 0.6, (1, GT, 4)), 0.05, 0.95),
                jnp.float32,
            ),
            "gt_valid": jnp.asarray(rng.rand(1, GT) < 0.3),
        }
        from relation_detr_tpu.utils.param_groups import build_optimizer

        mesh = create_mesh()
        tx = build_optimizer(optax.constant_schedule(1e-4))
        state = create_train_state(dict(variables), tx, mesh)
        step = make_train_step(
            model, CriterionConfig(num_classes=91), tx, mesh, donate=False
        )
        sb = shard_batch(mesh, tb)
        key = jax.random.key(0)
        try:  # train-step FLOPs for the train MFU report (VERDICT r4 #3)
            tcost = step.lower(state, sb, key).compile().cost_analysis()
            if isinstance(tcost, (list, tuple)):
                tcost = tcost[0]
            v = float(tcost.get("flops", float("nan"))) / 1e9
            train_flops_g = v if np.isfinite(v) else None
        except Exception:
            train_flops_g = None
        state, m = step(state, sb, key)
        float(m["total_loss"])  # compile
        state, m = step(state, sb, key)
        float(m["total_loss"])  # warm (any one-time retrace lands here,
        # not in the timed loop — see create_train_state's mesh placement)
        K = 6
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, sb, key)
        float(m["total_loss"])
        train_ms = (time.perf_counter() - t0) / K * 1000

        # typical COCO step: the loader's GT-capacity bucketing pads ~92%
        # of B=1 batches to 16 rows, not 100 (data/loader.py::GT_BUCKETS;
        # matcher serial windows scale with padded rows, PERF.md round 5)
        GT2 = 16
        tb16 = dict(tb)
        tb16["gt_labels"] = tb["gt_labels"][:, :GT2]
        tb16["gt_boxes"] = tb["gt_boxes"][:, :GT2]
        tb16["gt_valid"] = tb["gt_valid"][:, :GT2]
        sb16 = shard_batch(mesh, tb16)
        state, m = step(state, sb16, key)
        float(m["total_loss"])  # compile the 16-bucket trace
        state, m = step(state, sb16, key)
        float(m["total_loss"])
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, sb16, key)
        float(m["total_loss"])
        train16_ms = (time.perf_counter() - t0) / K * 1000
    except Exception:
        import traceback

        traceback.print_exc()

    best = max(results.values(), key=lambda r: r["img_per_s"])
    payload = {
        "metric": "images_per_sec_per_chip",
        "value": round(best["img_per_s"], 3),
        "unit": "img/s",
        "vs_baseline": round(best["img_per_s"] / A100_PROXY_IMG_PER_SEC, 3),
        "p50_latency_ms_b1": round(results[1]["queued_s_per_iter"] * 1000, 2),
        "p50_single_fetch_ms_b1": round(
            results[1]["p50_single_fetch_s"] * 1000, 2
        ),
        "per_batch": {str(k): {kk: round(vv, 4) for kk, vv in v.items()}
                      for k, v in results.items()},
        "flops_g": round(flops_g, 1) if flops_g else None,
        "mfu": round(
            flops_g * 1e9 / results[1]["queued_s_per_iter"]
            / V5E_PEAK_BF16_FLOPS, 4,
        ) if flops_g else None,
        "train_step_ms_b1_gt100": round(train_ms, 1) if train_ms else None,
        "train_step_ms_b1_gt16_bucket": (
            round(train16_ms, 1) if train16_ms else None
        ),
        "train_flops_g": round(train_flops_g, 1) if train_flops_g else None,
        "train_mfu": round(
            train_flops_g * 1e9 / (train_ms / 1e3) / V5E_PEAK_BF16_FLOPS, 4
        ) if (train_ms and train_flops_g) else None,
        "model": "relation_detr_resnet50_800_1333 (eval forward at the "
                 "default settings: separable-A tiled-MXU msda, tile "
                 "(12,8), auto halos + margin 1 — zero clamped corners at "
                 "worst-case init offsets across a 6-canvas sweep — "
                 "decoder prepack, band-grid static-slice patches, fused "
                 "boxes-in relation bias kernel v4, bf16 A-build on TPU: "
                 "measured bitwise-equivalent at the dot, since XLA "
                 "DEFAULT precision rounds f32 MXU operands to bf16 "
                 "anyway; B>1 trace-time batch unroll — PERF.md rounds "
                 "3e/4/5)",
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
