"""Warm-vs-cold eval wall (verdict item 4): run test.py-equivalent eval twice
in separate processes against the same compilation cache; the second run
should skip the multi-minute relay compiles."""
import json
import os
import subprocess
import sys
import time

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_coco_scale"
n = sys.argv[2] if len(sys.argv) > 2 else "400"
cache = os.path.expanduser("~/.cache/relation_detr_tpu/xla_wall_test")
env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cache)
walls = {}
for run in ("cold", "warm"):
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "test.py", "--coco-path", root,
         "--model-config", "configs/relation_detr/relation_detr_resnet50_800_1333.py",
         "--batch-size", "1", "--max-images", n, "--clamp-check", "off"],
        capture_output=True, text=True, env=env,
    )
    walls[run] = time.perf_counter() - t0
    assert r.returncode == 0, r.stderr[-3000:]
print(json.dumps({"cold_s": round(walls["cold"], 1),
                  "warm_s": round(walls["warm"], 1),
                  "saved_s": round(walls["cold"] - walls["warm"], 1),
                  "images": int(n)}))
