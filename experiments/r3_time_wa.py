import numpy as np, jax, sys, time
sys.path.insert(0, "/root/repo")
import jax.numpy as jnp
from relation_detr_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
import relation_detr_tpu.ops.patch_scatter as ps

rng = np.random.RandomState(0)
nt, ph, pw, C, h, w = 210, 21, 19, 256, 100, 168
g = jnp.asarray(rng.randn(nt, ph, pw, C).astype(np.float32))
y0 = rng.randint(0, h - ph + 1, nt).astype(np.int32)
x0 = rng.randint(0, w - pw + 1, nt).astype(np.int32)

f = jax.jit(lambda gg: ps.window_accumulate(gg, y0, x0, h, w))
t0 = time.perf_counter(); out = f(g); float(out.sum())
print("compile+first", time.perf_counter() - t0, flush=True)
K = 40; t0 = time.perf_counter()
for _ in range(K): out = f(g)
float(out.sum())
print(f"full: {(time.perf_counter()-t0)/K*1000:.3f} ms", flush=True)
