"""Round-5 eval profiling: HLO self-times + bytes accounting at B=1 and B=4.

Usage: python experiments/r5_prof_eval.py [batches...]
Defaults to batches 1 and 4. For each batch B:
  - compiles the flagship eval forward (800x1344)
  - prints XLA cost_analysis (flops, bytes accessed) -> HBM roofline floor
  - profiles 5 queued iterations, writes /tmp/eval_hlo_stats_b{B}.json
Analyze with experiments/r4_hlo_breakdown.py and r4_hlo_diff.py.
"""
import sys

sys.path.insert(0, "/root/repo")
import glob
import time

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

batches = [int(a) for a in sys.argv[1:]] or [1, 4]

model = _flagship()
H, W, G = 800, 1344, 8
rng = np.random.RandomState(0)
variables = None

V5E_HBM_GBPS = 819e9  # v5e HBM bandwidth (16 GB @ ~819 GB/s)

for B in batches:
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    mask = jnp.zeros((B, H, W), bool)
    if variables is None:
        v1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
        m1 = jnp.zeros((1, H, W), bool)
        variables = _init_variables(
            model, v1, m1, jnp.zeros((1, G), jnp.int32),
            jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool),
        )
    fwd = jax.jit(lambda v, x, m: jnp.sum(
        model.apply(v, x, m, train=False)["pred_logits"]))

    t0 = time.perf_counter()
    compiled = fwd.lower(variables, images, mask).compile()
    print(f"B={B} compile {time.perf_counter()-t0:.1f}s", flush=True)
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    ba = float(cost.get("bytes accessed", float("nan")))
    # per-memory-space breakdown when present
    spaces = {k: v for k, v in cost.items() if k.startswith("bytes accessed")}
    print(f"B={B} cost_analysis: flops={flops/1e9:.1f} G  "
          f"bytes_accessed={ba/1e9:.2f} GB")
    for k, v in sorted(spaces.items()):
        print(f"    {k} = {float(v)/1e9:.3f} GB")
    if np.isfinite(ba):
        print(f"B={B} HBM roofline floor (bytes/819GBps): "
              f"{ba/V5E_HBM_GBPS*1e3:.1f} ms", flush=True)

    print("first", float(fwd(variables, images, mask)), flush=True)
    float(fwd(variables, images, mask))
    # queued timing
    K = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(K):
        out = fwd(variables, images, mask)
    float(out)
    per = (time.perf_counter() - t0) / K
    print(f"B={B} queued {per*1e3:.2f} ms/iter  {B/per:.2f} img/s", flush=True)

    jax.profiler.start_trace(f"/tmp/eval_trace_b{B}")
    out = None
    for _ in range(5):
        out = fwd(variables, images, mask)
    float(out)
    jax.profiler.stop_trace()
    xplanes = sorted(
        glob.glob(f"/tmp/eval_trace_b{B}/**/*.xplane.pb", recursive=True))
    assert xplanes, "no xplane written"
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    path = f"/tmp/eval_hlo_stats_b{B}.json"
    with open(path, "w") as f:
        f.write(data)
    print("wrote", path, len(data), flush=True)
