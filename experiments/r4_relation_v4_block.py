"""v4 block-size sweep in-model."""
import time
import jax, jax.numpy as jnp, numpy as np


def main():
    from __graft_entry__ import _flagship, _init_variables
    from relation_detr_tpu.ops.msda import set_msda_defaults
    from relation_detr_tpu.ops.relation_pallas import set_fused_relation
    from relation_detr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    set_msda_defaults(impl="auto")
    set_fused_relation(version=4)
    model = _flagship()
    H, W, G = 800, 1344, 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    mask = jnp.zeros((1, H, W), bool)
    variables = _init_variables(
        model, images, mask, jnp.zeros((1, G), jnp.int32),
        jnp.full((1, G, 4), 0.5, jnp.float32), jnp.zeros((1, G), bool))

    for blk in (64, 128):
        set_fused_relation(v4_block=blk)
        fwd = jax.jit(lambda v, x, m: jnp.sum(model.apply(v, x, m, train=False)["pred_logits"]))
        float(fwd(variables, images, mask))
        K = 20
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = fwd(variables, images, mask)
        float(o)
        dt = (time.perf_counter() - t0) / K
        print(f"v4 block {blk}: {dt*1000:.2f} ms/iter ({1/dt:.2f} img/s)", flush=True)


if __name__ == "__main__":
    main()
