"""ResNet-family backbone (NHWC, frozen BatchNorm): ResNet / ResNeXt /
wide-ResNet, with optional per-stage modulated deformable conv (DCNv2).

Behavioral spec: /root/reference/models/backbones/resnet.py — a
torchvision-style ResNet with FrozenBatchNorm2d
(/root/reference/configs/relation_detr/relation_detr_resnet50_800_1333.py:36-38),
returning stages selected by ``return_indices`` (default (1, 2, 3) = C3..C5).
The arch table mirrors the reference's ``model_arch`` (resnet.py:367-414,
incl. resnext `groups`/`width_per_group` and wide variants); ``stage_with_dcn``
swaps each bottleneck's 3x3 conv2 for DeformConv2dPack exactly as
``conv3x3_dcn`` does (resnet.py:38-55, 145). Stage freezing is an optimizer
concern here (see relation_detr_tpu/utils/param_groups.py) rather than
requires_grad flags.

TPU-first: NHWC layout end-to-end (XLA's native conv layout on TPU); frozen
BN folds to a single fused multiply-add that XLA merges into the convolution;
grouped convs use XLA's feature_group_count.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.deform_conv import DeformConv2dPack
from relation_detr_tpu.models.layers import FrozenBatchNorm

kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

# arch -> (block, stage sizes, groups, width_per_group); mirrors the
# reference model_arch table (resnet.py:367-414)
ARCH_SETTINGS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1, 64),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 64),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 1, 64),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 1, 64),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), 32, 4),
    "resnext101_32x4d": ("bottleneck", (3, 4, 23, 3), 32, 4),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), 32, 8),
    "resnext101_64x4d": ("bottleneck", (3, 4, 23, 3), 64, 4),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), 1, 128),
}


def _conv(features, kernel, stride=1, name=None, dtype=None, groups=1):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=False,
        feature_group_count=groups,
        kernel_init=kaiming_normal_out,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        if self.with_dcn:
            # reference swaps conv2 only (resnet.py:89-90), bias-free
            out = DeformConv2dPack(
                self.features, 3, 1, use_bias=False, name="conv2"
            )(out)
        else:
            out = _conv(self.features, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if self.downsample:
            identity = _conv(
                self.features, 1, self.stride, name="downsample_conv", dtype=self.dtype
            )(x)
            identity = FrozenBatchNorm(self.features, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features_out = 64*2^stage * 4
    features_out: int = 0  # 0 => 4 * features (vanilla resnet)
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    with_dcn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out_features = self.features_out or self.features * 4
        out = _conv(self.features, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        # stride on the 3x3 (torchvision v1.5 style, matching the reference)
        if self.with_dcn:
            out = DeformConv2dPack(
                self.features, 3, self.stride, groups=self.groups,
                use_bias=False, name="conv2",
            )(out)
        else:
            out = _conv(
                self.features, 3, self.stride, name="conv2", dtype=self.dtype,
                groups=self.groups,
            )(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(out_features, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(out_features, name="bn3")(out)
        if self.downsample:
            identity = _conv(
                out_features, 1, self.stride, name="downsample_conv",
                dtype=self.dtype,
            )(x)
            identity = FrozenBatchNorm(out_features, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet feature extractor returning a tuple of NHWC stage outputs.

    ``return_indices`` selects stages (0 = layer1/C2 ... 3 = layer4/C5),
    matching the reference factory's semantics
    (/root/reference/models/backbones/resnet.py:417-452). ``stage_with_dcn``
    mirrors the reference's extra ResNet parameter (resnet.py:188-193).
    """

    arch: str = "resnet50"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    stage_with_dcn: Tuple[bool, bool, bool, bool] = (False, False, False, False)
    # compute dtype for the conv stack (params stay fp32; bf16 halves HBM
    # traffic and doubles MXU rate; stage outputs are cast back to fp32)
    dtype: Optional[jnp.dtype] = None

    @property
    def num_channels(self) -> Tuple[int, ...]:
        block, _, _, _ = ARCH_SETTINGS[self.arch]
        expansion = 4 if block == "bottleneck" else 1
        widths = (64, 128, 256, 512)
        return tuple(widths[i] * expansion for i in self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        block_name, stage_sizes, groups, width_per_group = ARCH_SETTINGS[self.arch]

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
            base = 64 * (2**stage_idx)
            # torchvision width rule (resnet.py:142): bottleneck 3x3 width
            width = int(base * (width_per_group / 64.0)) * groups
            with_dcn = self.stage_with_dcn[stage_idx]
            for block_idx in range(num_blocks):
                stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
                needs_down = block_idx == 0 and (
                    stride != 1 or stage_idx == 0 and block_name == "bottleneck"
                )
                if block_name == "bottleneck":
                    x = Bottleneck(
                        width,
                        features_out=base * 4,
                        stride=stride,
                        downsample=needs_down,
                        groups=groups,
                        with_dcn=with_dcn,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{block_idx}",
                    )(x)
                else:
                    x = BasicBlock(
                        base,
                        stride=stride,
                        downsample=needs_down,
                        with_dcn=with_dcn,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{block_idx}",
                    )(x)
                if self.dtype is not None:
                    x = x.astype(self.dtype)
            if stage_idx in self.return_indices:
                outputs.append(x.astype(jnp.float32))
        return tuple(outputs)
