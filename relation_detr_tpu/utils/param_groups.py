"""Optimizer parameter groups (path-predicate based).

Mirrors /root/reference/optimizer/param_dict.py:81-148
(``finetune_backbone_and_linear_projection``, the default in
/root/reference/configs/train_config.py:46): backbone and the deformable
attention's ``sampling_offsets``/``reference_points`` projections train at
lr x 0.1; norm/bias params get no weight decay. Backbone stem + stage-1
freezing (/root/reference/models/backbones/resnet.py:454-462) is a zero-update
mask here instead of requires_grad flags.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax


def _path_names(path) -> tuple:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return tuple(names)


def make_mask(predicate: Callable[[tuple], bool]):
    """Returns fn(params) -> bool pytree using the param path."""

    def mask_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: predicate(_path_names(path)), params
        )

    return mask_fn


def is_low_lr(names: tuple) -> bool:
    """Backbone + linear projections train at lr*0.1 (param_dict.py:123-148)."""
    return (
        "backbone" in names
        or "sampling_offsets" in names
        or "reference_points" in names
    )


def is_no_weight_decay(names: tuple) -> bool:
    """Norm weights and all biases skip weight decay (param_dict.py:100-121)."""
    leaf = names[-1]
    if leaf == "bias":
        return True
    if leaf == "scale":  # LayerNorm / GroupNorm weight
        return True
    # embeddings follow torch AdamW (decayed) in the reference; keep them decayed
    return False


def is_frozen(names: tuple) -> bool:
    """ResNet stem + layer1 are frozen (freeze_indices=(0,) in the config)."""
    if "backbone" not in names:
        return False
    return any(
        n in ("conv1", "bn1") or n.startswith("layer1_") for n in names
    )


def build_optimizer(
    learning_rate_schedule,
    weight_decay: float = 1e-4,
    betas=(0.9, 0.999),
    max_norm: float = 0.1,
    low_lr_factor: float = 0.1,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with grad clipping, lr groups, wd mask, and frozen params.

    Matches /root/reference/configs/train_config.py:41-46 +
    /root/reference/util/engine.py:56-58 (clip_grad_norm 0.1).
    ``accumulate_steps`` > 1 mirrors accelerator.accumulate (engine.py:44)
    via optax.MultiSteps.
    """
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), make_mask(is_frozen)),
        optax.clip_by_global_norm(max_norm),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.add_decayed_weights(
            weight_decay, mask=make_mask(lambda n: not is_no_weight_decay(n))
        ),
        optax.masked(optax.scale(low_lr_factor), make_mask(is_low_lr)),
        optax.scale_by_learning_rate(learning_rate_schedule),
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def basic_param(learning_rate_schedule, **kwargs):
    """Uniform lr / wd for everything (param_dict.py:81-88)."""
    return build_optimizer(learning_rate_schedule, low_lr_factor=1.0, **kwargs)


def finetune_backbone_param(learning_rate_schedule, **kwargs):
    """Backbone at lr*0.1 only (param_dict.py:91-98)."""
    tx_kwargs = dict(kwargs)

    def backbone_only(names):
        return "backbone" in names

    return optax.chain(
        optax.masked(optax.set_to_zero(), make_mask(is_frozen)),
        optax.clip_by_global_norm(tx_kwargs.pop("max_norm", 0.1)),
        optax.scale_by_adam(),
        optax.add_decayed_weights(tx_kwargs.pop("weight_decay", 1e-4)),
        optax.masked(optax.scale(0.1), make_mask(backbone_only)),
        optax.scale_by_learning_rate(learning_rate_schedule),
    )


def finetune_backbone_and_linear_projection(learning_rate_schedule, **kwargs):
    """The reference default (param_dict.py:123-148) == build_optimizer."""
    return build_optimizer(learning_rate_schedule, **kwargs)


def warmup_multistep_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones_epochs=(10,),
    gamma: float = 0.1,
    warmup_steps: int = 1000,
    warmup_factor: float = 1e-3,
):
    """Epoch-0 linear warmup (engine.py:30-35) + MultiStepLR drops
    (train_config.py:43)."""
    warmup = min(warmup_steps, steps_per_epoch) if steps_per_epoch > 0 else warmup_steps

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step / max(warmup, 1), 1.0)
        lr = base_lr * (warmup_factor + (1 - warmup_factor) * frac)
        for m in milestones_epochs:
            lr = jnp.where(step >= m * steps_per_epoch, lr * gamma, lr)
        return lr

    return schedule
