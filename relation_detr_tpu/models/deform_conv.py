"""Modulated deformable convolution (DCNv2) pack.

Spec: /root/reference/models/bricks/deform_conv2d_pack.py:9-81 — a 3x3 conv
predicting per-position offsets (zero-init) and sigmoid masks (zero-init =>
0.5), driving a deformable 3x3 conv. Used by the optional DCN ResNet variant
(/root/reference/models/backbones/resnet.py:38-55).

TPU formulation: sample the 9 deformed taps with the shared bilinear gather,
then contract tap x channel with the kernel on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from relation_detr_tpu.models.layers import zeros_init
from relation_detr_tpu.ops.grid_sample import bilinear_sample

kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


class DeformConv2dPack(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel_size
        taps = k * k
        pad = (k - 1) // 2

        conv_args = dict(
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
        )
        offsets = nn.Conv(
            2 * taps, (k, k), kernel_init=zeros_init, bias_init=zeros_init,
            name="conv_offset", **conv_args,
        )(x)
        masks = nn.sigmoid(
            nn.Conv(
                taps, (k, k), kernel_init=zeros_init, bias_init=zeros_init,
                name="conv_mask", **conv_args,
            )(x)
        )
        oh, ow = offsets.shape[1:3]

        # base sampling grid: output position * stride + tap offset
        ys = (jnp.arange(oh) * self.stride)[:, None]
        xs = (jnp.arange(ow) * self.stride)[None, :]
        tap_dy, tap_dx = jnp.meshgrid(
            jnp.arange(k) - pad, jnp.arange(k) - pad, indexing="ij"
        )
        base_y = ys[None, :, :, None] + tap_dy.reshape(-1)[None, None, None, :]
        base_x = xs[None, :, :, None] + tap_dx.reshape(-1)[None, None, None, :]

        off = offsets.reshape(b, oh, ow, taps, 2)
        # torchvision DeformConv2d offset order is (dy, dx)
        sample_y = base_y + off[..., 0]
        sample_x = base_x + off[..., 1]
        points = jnp.stack([sample_x, sample_y], -1).reshape(b, oh * ow * taps, 2)
        sampled = bilinear_sample(x, points).reshape(b, oh, ow, taps, c)
        sampled = sampled * masks[..., None]

        # grouped tap-x-channel contraction on the MXU (groups match
        # torchvision DeformConv2d's `groups`; reference passes them through
        # conv3x3_dcn, resnet.py:38-55)
        g = self.groups
        kernel = self.param(
            "kernel", kaiming_normal_out, (taps, c // g, self.features)
        )
        if g == 1:
            out = jnp.einsum("bhwtc,tcf->bhwf", sampled, kernel)
        else:
            oh, ow = sampled.shape[1:3]
            sg = sampled.reshape(b, oh, ow, taps, g, c // g)
            kg = kernel.reshape(taps, c // g, g, self.features // g)
            out = jnp.einsum("bhwtgc,tcgf->bhwgf", sg, kg).reshape(
                b, oh, ow, self.features
            )
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.features,))
        return out
