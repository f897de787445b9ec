"""Round-3: flagship train-step timings (B=1, 800x1344) across variants.

Queued-dispatch timing (PERF.md): K steps dispatched async, one fetch.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from __graft_entry__ import _flagship, _init_variables
from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.ops.msda import msda_defaults
from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
from relation_detr_tpu.parallel.train_step import create_train_state, make_train_step
from relation_detr_tpu.utils.param_groups import build_optimizer
from relation_detr_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

B, H, W, G = 1, 800, 1344, 20
rng = np.random.RandomState(0)
batch = {
    "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
    "mask": jnp.zeros((B, H, W), bool),
    "gt_labels": jnp.asarray(rng.randint(0, 91, (B, G)), jnp.int32),
    "gt_boxes": jnp.asarray(np.clip(rng.uniform(0.2, 0.6, (B, G, 4)), 0.05, 0.95), jnp.float32),
    "gt_valid": jnp.asarray(rng.rand(B, G) < 0.8),
}
mesh = create_mesh()


def timed(tag, model_kwargs=None, msda=None, K=8):
    model = _flagship()
    if model_kwargs:
        model = model.clone(**model_kwargs)
    with msda_defaults(**(msda or {})):
        variables = _init_variables(model, batch["images"], batch["mask"],
                                    batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"])
        tx = build_optimizer(optax.constant_schedule(1e-4))
        state = create_train_state(variables, tx)
        step = make_train_step(model, CriterionConfig(num_classes=91), tx, mesh, donate=False)
        sb = shard_batch(mesh, batch)
        key = jax.random.key(0)
        t0 = time.perf_counter()
        state, m = step(state, sb, key)
        probe = float(m["total_loss"])
        compile_s = time.perf_counter() - t0
        state, m = step(state, sb, key)
        float(m["total_loss"])
        t0 = time.perf_counter()
        for _ in range(K):
            state, m = step(state, sb, key)
        float(m["total_loss"])
        per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": tag, "ms": round(per * 1000, 1),
                      "compile_s": round(compile_s, 1), "loss": round(probe, 3),
                      "grad_norm": round(float(m["grad_norm"]), 3)}), flush=True)


for v in (sys.argv[1:] or ["fp32"]):
    if v == "fp32":
        timed("fp32 default (prepack)")
    elif v == "fp32_dots":
        timed("fp32 + remat dots", {"remat_policy": "dots"})
    elif v == "save_all":
        timed("remat save_all (no recompute)", {"remat_policy": "save_all"})
    elif v == "bf16_dots":
        timed("bf16 + remat dots",
              {"remat_policy": "dots", "compute_dtype": "bfloat16",
               "backbone_dtype": "bfloat16"}, K=4)
    elif v == "bf16_none":
        timed("bf16 full remat",
              {"compute_dtype": "bfloat16", "backbone_dtype": "bfloat16"}, K=2)
    elif v == "fp32_fast":
        timed("fp32 fast halos ovf8",
              msda={"tiled_halos": (4, 3, 2, 2), "tiled_overflow": 8})
    elif v == "fp32_m0":
        timed("fp32 auto margin0", msda={"tiled_margin": 0})
    elif v == "fp32_g100":
        # real-loader GT capacity (data/loader.py MAX_GT=100): the padded
        # hybrid buffer is 600 rows; the fused matcher must stay
        # capacity-independent
        G2 = 100
        batch["gt_labels"] = jnp.asarray(rng.randint(0, 91, (B, G2)), jnp.int32)
        batch["gt_boxes"] = jnp.asarray(
            np.clip(rng.uniform(0.2, 0.6, (B, G2, 4)), 0.05, 0.95), jnp.float32)
        batch["gt_valid"] = jnp.asarray(np.arange(G2)[None] < 20)
        timed("fp32 MAX_GT=100 capacity (20 real)")
        batch["gt_labels"] = jnp.asarray(rng.randint(0, 91, (B, G)), jnp.int32)
        batch["gt_boxes"] = jnp.asarray(
            np.clip(rng.uniform(0.2, 0.6, (B, G, 4)), 0.05, 0.95), jnp.float32)
        batch["gt_valid"] = jnp.asarray(rng.rand(B, G) < 0.8)
    elif v == "nomatch":
        # matching-free ablation: residual matcher cost = fp32 - this
        import relation_detr_tpu.losses.criterion as crit
        orig_cm = crit.compute_matching
        def dummy_match(cfg, lg, bx, lb, tb, tv, row_group=None):
            g = lb.shape[1]
            idx = jnp.arange(g, dtype=jnp.int32)[None, :] % lg.shape[1]
            return jnp.where(tv, idx, -1)
        crit.compute_matching = dummy_match
        timed("fp32 matching-free ablation")
        crit.compute_matching = orig_cm
    elif v == "msda_bf16":
        # targeted bf16: only the tiled A/patch contraction (+ its custom-VJP
        # backward einsums) run in bf16; model stays fp32 (round 3d)
        timed("fp32 model + bf16 MSDA contraction",
              msda={"tiled_dtype": jnp.bfloat16})
    elif v.startswith("unroll"):
        from relation_detr_tpu.ops.hungarian import set_hungarian_unroll
        n = int(v[len("unroll"):])
        set_hungarian_unroll(n)
        timed(f"fp32 matcher unroll {n}")
        set_hungarian_unroll(1)

for v in sys.argv[1:]:
    if v == "dots_gatherpatch":
        timed("fp32 dots + patch gather", {"remat_policy": "dots"},
              msda={"tiled_patch_mode": "gather"})
    elif v == "dots_rel1":
        from relation_detr_tpu.ops.relation_pallas import set_fused_relation
        set_fused_relation(version=1)
        timed("fp32 dots + relation v1", {"remat_policy": "dots"})
        set_fused_relation(version=3)
    elif v == "dots_margin2":
        timed("fp32 dots + margin 2", {"remat_policy": "dots"},
              msda={"tiled_margin": 2})
    elif v == "dots_cornerpack":
        timed("fp32 dots + corner_pack encoder", {"remat_policy": "dots"},
              msda={"impl": "corner_pack"})

def timed_fwd_only(tag, model_kwargs=None, K=10):
    """Train-mode forward+loss only (no grad): isolates fwd from backward."""
    model = _flagship()
    if model_kwargs:
        model = model.clone(**model_kwargs)
    variables = _init_variables(model, batch["images"], batch["mask"],
                                batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"])
    from relation_detr_tpu.losses.criterion import relation_detr_loss

    @jax.jit
    def fwd(v, b, key):
        dn, dp = jax.random.split(key)
        outputs = model.apply(v, b["images"], b["mask"], b["gt_labels"],
                              b["gt_boxes"], b["gt_valid"], train=True,
                              rngs={"denoising": dn, "dropout": dp})
        total, _ = relation_detr_loss(
            CriterionConfig(num_classes=91), outputs, b["gt_labels"],
            b["gt_boxes"], b["gt_valid"], hybrid_assign=6)
        return total

    key = jax.random.key(0)
    t0 = time.perf_counter()
    probe = float(fwd(variables, batch, key))
    compile_s = time.perf_counter() - t0
    float(fwd(variables, batch, key))
    t0 = time.perf_counter()
    out = None
    for _ in range(K):
        out = fwd(variables, batch, key)
    float(out)
    per = (time.perf_counter() - t0) / K
    print(json.dumps({"tag": tag, "ms": round(per * 1000, 1),
                      "compile_s": round(compile_s, 1), "loss": round(probe, 3)}), flush=True)


for v in sys.argv[1:]:
    if v == "fwd_only":
        timed_fwd_only("train-mode fwd+loss only")
    elif v == "fwd_only_nohybrid":
        timed_fwd_only("fwd+loss, hybrid branch off", {"hybrid_assign_stop": True})
