"""ResNet backbone (NHWC, frozen BatchNorm).

Behavioral spec: /root/reference/models/backbones/resnet.py — a
torchvision-style ResNet with FrozenBatchNorm2d
(/root/reference/configs/relation_detr/relation_detr_resnet50_800_1333.py:36-38),
returning stages selected by ``return_indices`` (default (1, 2, 3) = C3..C5).
Stage freezing is an optimizer concern here (see
relation_detr_tpu/utils/param_groups.py) rather than requires_grad flags.

TPU-first: NHWC layout end-to-end (XLA's native conv layout on TPU); frozen
BN folds to a single fused multiply-add that XLA merges into the convolution.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.layers import FrozenBatchNorm

kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

ARCH_SETTINGS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _conv(features, kernel, stride=1, name=None, dtype=None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        kernel_init=kaiming_normal_out,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if self.downsample:
            identity = _conv(
                self.features, 1, self.stride, name="downsample_conv", dtype=self.dtype
            )(x)
            identity = FrozenBatchNorm(self.features, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        # stride on the 3x3 (torchvision v1.5 style, matching the reference)
        out = _conv(self.features, 3, self.stride, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.features * 4, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features * 4, name="bn3")(out)
        if self.downsample:
            identity = _conv(
                self.features * 4, 1, self.stride, name="downsample_conv",
                dtype=self.dtype,
            )(x)
            identity = FrozenBatchNorm(self.features * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet feature extractor returning a tuple of NHWC stage outputs.

    ``return_indices`` selects stages (0 = layer1/C2 ... 3 = layer4/C5),
    matching the reference factory's semantics
    (/root/reference/models/backbones/resnet.py:417-452).
    """

    arch: str = "resnet50"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    # compute dtype for the conv stack (params stay fp32; bf16 halves HBM
    # traffic and doubles MXU rate; stage outputs are cast back to fp32)
    dtype: Optional[jnp.dtype] = None

    @property
    def num_channels(self) -> Tuple[int, ...]:
        block, _ = ARCH_SETTINGS[self.arch]
        expansion = 4 if block == "bottleneck" else 1
        widths = (64, 128, 256, 512)
        return tuple(widths[i] * expansion for i in self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        block_name, stage_sizes = ARCH_SETTINGS[self.arch]
        block_cls = Bottleneck if block_name == "bottleneck" else BasicBlock

        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = []
        for stage_idx, num_blocks in enumerate(stage_sizes):
            features = 64 * (2**stage_idx)
            for block_idx in range(num_blocks):
                stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
                needs_down = block_idx == 0 and (
                    stride != 1 or stage_idx == 0 and block_name == "bottleneck"
                )
                x = block_cls(
                    features,
                    stride=stride,
                    downsample=needs_down,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x)
                if self.dtype is not None:
                    x = x.astype(self.dtype)
            if stage_idx in self.return_indices:
                outputs.append(x.astype(jnp.float32))
        return tuple(outputs)
