"""Round-4: profile the eval forward with the overflow-8 side channel on
(fast halos) and dump hlo_stats — name the ~25 ms the channel costs.
"""
import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.ops.msda import set_msda_defaults
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
set_msda_defaults(tiled_halos=(4, 3, 2, 2), tiled_overflow=8)

model = _flagship()
B, H, W, G = 1, 800, 1344, 8
rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
mask = jnp.zeros((B, H, W), bool)
variables = _init_variables(
    model, images, mask, jnp.zeros((B, G), jnp.int32),
    jnp.full((B, G, 4), 0.5, jnp.float32), jnp.zeros((B, G), bool),
)
fwd = jax.jit(lambda v, x, m: jnp.sum(
    model.apply(v, x, m, train=False)["pred_logits"]))
print("first", float(fwd(variables, images, mask)), flush=True)
float(fwd(variables, images, mask))

jax.profiler.start_trace("/tmp/eval_of_trace")
out = None
for _ in range(5):
    out = fwd(variables, images, mask)
float(out)
jax.profiler.stop_trace()
print("trace done", flush=True)

xplanes = sorted(glob.glob("/tmp/eval_of_trace/**/*.xplane.pb", recursive=True))
assert xplanes, "no xplane written"
from xprof.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data([xplanes[-1]], "hlo_stats", {})
if isinstance(data, bytes):
    data = data.decode()
with open("/tmp/eval_of_hlo_stats.json", "w") as f:
    f.write(data)
print("wrote /tmp/eval_of_hlo_stats.json", len(data))
