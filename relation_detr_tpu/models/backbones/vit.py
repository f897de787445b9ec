"""ViT backbone with SimpleFeaturePyramid (ViTDet-style).

Behavioral spec: /root/reference/models/backbones/vit.py — plain ViT blocks
with optional windowed attention at most depths (window 14) and global
attention at a few, followed by SimpleFeaturePyramid (:684-741) building
strides 8/16/32 from the single stride-16 map via deconv/identity/pooling.
No shipped reference config uses it; provided for parity.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from relation_detr_tpu.models.layers import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)

trunc_normal_02 = nn.initializers.truncated_normal(0.02)

ARCH_SETTINGS = {
    # name: (embed_dim, depth, num_heads, global_attn_indices)
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
}


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        c = self.dim
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, kernel_init=torch_linear_kernel_init,
                       bias_init=torch_linear_bias_init(c), name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(*x.shape[:-1], 3, self.num_heads, head_dim),
                            3, axis=-3)
        q, k, v = (t.squeeze(-3) for t in (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape[:-1], c)
        return nn.Dense(c, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(c), name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0  # 0 = global attention
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            ws = self.window_size
            pad_h = int(np.ceil(h / ws)) * ws
            pad_w = int(np.ceil(w / ws)) * ws
            x = jnp.pad(x, ((0, 0), (0, pad_h - h), (0, pad_w - w), (0, 0)))
            nh, nw = pad_h // ws, pad_w // ws
            x = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b * nh * nw, ws * ws, c)
            x = Attention(self.dim, self.num_heads, name="attn")(x)
            x = x.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, pad_h, pad_w, c)[:, :h, :w]
        else:
            x = Attention(self.dim, self.num_heads, name="attn")(
                x.reshape(b, h * w, c)
            ).reshape(b, h, w, c)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(c), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(int(c * self.mlp_ratio)),
                     name="mlp_fc2")(y)
        return x + y


class VisionTransformerBackbone(nn.Module):
    """ViT + SimpleFeaturePyramid returning strides (8, 16, 32)."""

    arch: str = "vit_b"
    window_size: int = 14
    out_channels_scale: Tuple[float, ...] = (2.0, 1.0, 0.5)  # deconv, id, pool

    @property
    def num_channels(self) -> Tuple[int, ...]:
        dim = ARCH_SETTINGS[self.arch][0]
        # SimpleFeaturePyramid keeps the ViT dim per scale
        return (dim // 2, dim, dim)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        dim, depth, num_heads, global_idx = ARCH_SETTINGS[self.arch]
        x = nn.Conv(dim, (16, 16), strides=(16, 16), padding="VALID",
                    kernel_init=trunc_normal_02, name="patch_embed")(x)
        for i in range(depth):
            x = ViTBlock(
                dim, num_heads,
                window_size=0 if i in global_idx else self.window_size,
                name=f"block{i}",
            )(x)
        # SimpleFeaturePyramid (vit.py:684-741): stride 8 via deconv,
        # stride 16 identity, stride 32 via max-pool
        b, h, w, c = x.shape
        p8 = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                              kernel_init=trunc_normal_02, name="fpn_up")(x)
        p16 = x
        p32 = nn.max_pool(x, (2, 2), strides=(2, 2))
        return (p8, p16, p32)
