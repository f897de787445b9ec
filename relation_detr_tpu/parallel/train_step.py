"""Sharded training/eval steps.

Replaces the reference's Accelerate/DDP engine loop body
(/root/reference/util/engine.py:43-66): forward + loss, backward, grad clip,
optimizer step — compiled as ONE XLA program over the mesh. Gradients reduce
over the data axis implicitly (batch is sharded, params replicated), which is
exactly DDP's all-reduce but fused by the compiler with the backward pass.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relation_detr_tpu.losses.criterion import CriterionConfig, relation_detr_loss


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # device-side non-finite tracking: count of skipped steps and the step id
    # of the first one (-1 = none). Lets the host detect divergence without a
    # per-step device->host sync (the reference syncs every step to check,
    # engine.py:72-75; we instead *skip* bad updates in-graph and report).
    nonfinite_count: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    first_nonfinite_step: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.full((), -1, jnp.int32)
    )

    def tree_flatten(self):
        return (
            self.step,
            self.params,
            self.batch_stats,
            self.opt_state,
            self.nonfinite_count,
            self.first_nonfinite_step,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(
    variables, tx: optax.GradientTransformation, mesh: Optional[Mesh] = None
) -> TrainState:
    """Build the initial TrainState; pass the training mesh to avoid a
    full second compile of the train step.

    Freshly initialized variables carry SingleDeviceSharding while the
    jitted step outputs NamedSharding(mesh, P()) — without placement the
    second step() call sees different input shardings and RECOMPILES the
    whole program (measured 177 s wasted on the flagship, PERF.md round 4).
    Replicated placement over the mesh matches the step's output sharding
    (params replicated, batch sharded = the DDP layout).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
    return state


def make_train_step(
    model,
    criterion_cfg: CriterionConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    hybrid_assign: int = 6,
    donate: bool = True,
):
    """Build the jitted, mesh-sharded train step.

    batch = dict(images (B,H,W,3), mask (B,H,W), gt_labels (B,G),
    gt_boxes (B,G,4), gt_valid (B,G)) — leading dim sharded over "data".
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def loss_fn(params, batch_stats, batch, rng):
        dn_rng, dropout_rng = jax.random.split(rng)
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            batch["mask"],
            batch["gt_labels"],
            batch["gt_boxes"],
            batch["gt_valid"],
            train=True,
            rngs={"denoising": dn_rng, "dropout": dropout_rng},
        )
        total, losses = relation_detr_loss(
            criterion_cfg,
            outputs,
            batch["gt_labels"],
            batch["gt_boxes"],
            batch["gt_valid"],
            hybrid_assign=hybrid_assign,
        )
        return total, losses

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, step_rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, **losses}
        grad_norm = optax.global_norm(grads)
        metrics["grad_norm"] = grad_norm

        # skip non-finite updates in-graph (no garbage step is ever applied;
        # parity+ vs the reference's per-step host check, engine.py:72-75)
        finite = jnp.isfinite(total) & jnp.isfinite(grad_norm)
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        nonfinite_count = state.nonfinite_count + jnp.where(finite, 0, 1)
        first_nonfinite = jnp.where(
            (~finite) & (state.first_nonfinite_step < 0),
            state.step,
            state.first_nonfinite_step,
        )
        metrics["nonfinite_count"] = nonfinite_count
        metrics["first_nonfinite_step"] = first_nonfinite
        new_state = TrainState(
            step=state.step + 1,
            params=keep(new_params, state.params),
            batch_stats=state.batch_stats,
            opt_state=keep(new_opt_state, state.opt_state),
            nonfinite_count=nonfinite_count,
            first_nonfinite_step=first_nonfinite,
        )
        return new_state, metrics

    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Mesh):
    """Jitted eval forward returning raw output heads (decode happens host-side
    or via models/post_process.py)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def eval_step(variables, images, mask):
        return model.apply(variables, images, mask, train=False)

    return jax.jit(eval_step, in_shardings=(repl, data, data), out_shardings=data)
