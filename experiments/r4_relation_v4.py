"""A/B: relation bias v3 (separable XLA) vs v4 (boxes-in Pallas) in-model."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np


def main():
    from __graft_entry__ import _flagship, _init_variables
    from relation_detr_tpu.ops.msda import set_msda_defaults
    from relation_detr_tpu.ops.relation_pallas import set_fused_relation
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    set_msda_defaults(impl="auto")
    model = _flagship()
    H, W, G = 800, 1344, 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    mask = jnp.zeros((1, H, W), bool)
    variables = _init_variables(
        model, images, mask, jnp.zeros((1, G), jnp.int32),
        jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool))

    outs = {}
    for ver in (3, 4):
        set_fused_relation(version=ver)
        fwd = jax.jit(lambda v, x, m: model.apply(v, x, m, train=False)["pred_logits"])
        out = fwd(variables, images, mask)
        float(out.sum())
        outs[ver] = np.asarray(out)
        K = 20
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = fwd(variables, images, mask)
        float(o.sum())
        dt = (time.perf_counter() - t0) / K
        print(f"v{ver}: {dt*1000:.2f} ms/iter ({1/dt:.2f} img/s)", flush=True)
    d = np.abs(outs[3] - outs[4])
    print("logits |diff| max", d.max(), "mean", d.mean())


if __name__ == "__main__":
    main()
