"""ChannelMapper neck: per-level 1x1 conv + GroupNorm(32), extra stride-2 3x3
levels generated from the last input (C6 from C5).

Spec: /root/reference/models/necks/channel_mapper.py:8-89 (xavier_uniform conv
init, zero bias).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.layers import ConvNormActivation


class ChannelMapper(nn.Module):
    num_inputs: int
    out_channels: int = 256
    num_outs: int = 4
    kernel_size: int = 1

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        assert len(inputs) == self.num_inputs
        outs = [
            ConvNormActivation(
                self.out_channels,
                kernel_size=self.kernel_size,
                norm="group",
                name=f"convs_{i}",
            )(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(self.num_inputs, self.num_outs):
            src = inputs[-1] if i == self.num_inputs else outs[-1]
            outs.append(
                ConvNormActivation(
                    self.out_channels,
                    kernel_size=3,
                    stride=2,
                    norm="group",
                    name=f"convs_{i}",
                )(src)
            )
        return tuple(outs)
