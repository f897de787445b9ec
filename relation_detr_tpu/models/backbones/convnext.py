"""ConvNeXt backbone (NHWC).

Behavioral spec: /root/reference/models/backbones/convnext.py (CNBlock
:25-166 torchvision-style: 7x7 depthwise conv + LN + 4x MLP + layer-scale
1e-6 + stochastic depth; stem 4x4 s4 + LN; LN + 2x2 s2 downsample between
stages).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

trunc_normal_02 = nn.initializers.truncated_normal(0.02)

ARCH_SETTINGS = {
    # name: (dims, depths)
    "convnext_tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
    "convnext_small": ((96, 192, 384, 768), (3, 3, 27, 3)),
    "convnext_base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
    "convnext_large": ((192, 384, 768, 1536), (3, 3, 27, 3)),
    "convnext_xlarge": ((256, 512, 1024, 2048), (3, 3, 27, 3)),
}


class CNBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
            kernel_init=trunc_normal_02, name="dwconv",
        )(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, kernel_init=trunc_normal_02, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, kernel_init=trunc_normal_02, name="pwconv2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * h


class ConvNeXtBackbone(nn.Module):
    """ConvNeXt feature extractor returning NHWC stage outputs."""

    arch: str = "convnext_large"
    return_indices: Tuple[int, ...] = (1, 2, 3)

    @property
    def num_channels(self) -> Tuple[int, ...]:
        dims = ARCH_SETTINGS[self.arch][0]
        return tuple(dims[i] for i in self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        dims, depths = ARCH_SETTINGS[self.arch]
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    kernel_init=trunc_normal_02, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
        outputs = []
        for stage_idx, depth in enumerate(depths):
            if stage_idx > 0:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down_norm{stage_idx}")(x)
                x = nn.Conv(dims[stage_idx], (2, 2), strides=(2, 2), padding="VALID",
                            kernel_init=trunc_normal_02, name=f"down_conv{stage_idx}")(x)
            for i in range(depth):
                x = CNBlock(dims[stage_idx], name=f"stage{stage_idx}_block{i}")(x)
            if stage_idx in self.return_indices:
                outputs.append(
                    nn.LayerNorm(epsilon=1e-6, name=f"outnorm{stage_idx}")(x)
                )
        return tuple(outputs)
