"""Exponential moving average of parameters.

Mirrors /root/reference/util/utils.py:272-282 (torch AveragedModel with decay
averaging): ema = decay * ema + (1 - decay) * params, as a pure pytree op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # a real copy, not an aliasing identity map: the train step donates its
    # input state, which would delete aliased EMA buffers with it
    return jax.tree.map(jnp.copy, params)


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )
