"""ViT backbone with SimpleFeaturePyramid (ViTDet-style) + EVA02 extras.

Behavioral spec: /root/reference/models/backbones/vit.py — plain ViT blocks
with optional windowed attention (window_block_indexes) and the EVA02
variants: 2D rotary position embedding on q/k
(VisionRotaryEmbeddingFast, :74-113), SwiGLU MLP with a hidden LayerNorm
(:115-145), separate q/k/v projections with q/v-only bias (:150-216), and a
ResBottleneckBlock (:220-281). SimpleFeaturePyramid (:684-741) builds
strides 4/8/16/32 from the single stride-16 map via deconv/identity/pool
followed by 1x1 and 3x3 Conv+LayerNorm projections to 256 channels.
No shipped reference config uses ViT; provided for parity.

TPU notes: blocks operate on NHWC maps; window partition is a reshape; the
RoPE cos/sin tables are static trace-time constants (rectangular grids
generalize the reference's square-only tables by normalizing each axis by
its own length).
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
    zeros_init,
)

trunc_normal_02 = nn.initializers.truncated_normal(0.02)
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

ARCH_SETTINGS = {
    # name: dict of block/arch parameters (reference model_arch, vit.py:788-876)
    "vit_b": dict(dim=768, depth=12, num_heads=12, mlp_dim=3072,
                  global_idx=(2, 5, 8, 11), rope=False, swiglu=False,
                  window_size=14),
    "vit_l": dict(dim=1024, depth=24, num_heads=16, mlp_dim=4096,
                  global_idx=(5, 11, 17, 23), rope=False, swiglu=False,
                  window_size=14),
    # EVA02 variants (rope + swiglu; window_block_indexes per reference)
    "eva_02_vit_b_4attn_1024": dict(
        dim=768, depth=12, num_heads=12, mlp_dim=2048,
        global_idx=(2, 5, 8, 11), rope=True, swiglu=True, window_size=16),
    "eva_02_vit_l_4attn_1024": dict(
        dim=1024, depth=24, num_heads=16, mlp_dim=2730,
        global_idx=(5, 11, 17, 23), rope=True, swiglu=True, window_size=16),
}


def _rope_tables(head_dim: int, pt_seq_len: int, grid_hw: Tuple[int, int]):
    """Static cos/sin tables for 2D rotary embedding.

    Mirrors VisionRotaryEmbeddingFast (reference vit.py:74-113): per-axis
    'lang' frequencies over half the head dim each, positions scaled to the
    pretraining sequence length, frequencies repeated in rotate-half pairs.
    Rectangular grids normalize each axis by its own length (the reference
    asserts square inputs; this is the natural generalization).
    """
    dim = head_dim // 2  # per-axis dim
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    gh, gw = grid_hw
    ty = np.arange(gh) / gh * pt_seq_len  # (gh,)
    tx = np.arange(gw) / gw * pt_seq_len
    fy = ty[:, None] * freqs[None, :]  # (gh, dim//2)
    fx = tx[:, None] * freqs[None, :]
    # per position (r, c): [row freqs, col freqs], each repeat_interleave(2)
    fy = np.repeat(fy, 2, axis=-1)  # (gh, dim)
    fx = np.repeat(fx, 2, axis=-1)
    full = np.concatenate(
        [np.broadcast_to(fy[:, None, :], (gh, gw, dim)),
         np.broadcast_to(fx[None, :, :], (gh, gw, dim))], axis=-1
    ).reshape(gh * gw, head_dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def _rotate_half(x):
    """(x0, x1) pairs -> (-x1, x0), interleaved (reference vit.py:67-71)."""
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def _apply_rope(t, cos, sin):
    return t * cos + _rotate_half(t) * sin


class Attention(nn.Module):
    """ViT attention. With ``rope_tables`` set, uses the EVA02 layout:
    separate q/k/v projections, bias on q/v only (reference vit.py:150-216).
    """

    dim: int
    num_heads: int
    use_rope: bool = False

    @nn.compact
    def __call__(self, x, rope_tables=None):  # (B, N, C)
        c = self.dim
        head_dim = c // self.num_heads
        if self.use_rope:
            q = nn.Dense(c, kernel_init=torch_linear_kernel_init,
                         bias_init=zeros_init, name="q_proj")(x)
            k = nn.Dense(c, use_bias=False,
                         kernel_init=torch_linear_kernel_init, name="k_proj")(x)
            v = nn.Dense(c, kernel_init=torch_linear_kernel_init,
                         bias_init=zeros_init, name="v_proj")(x)
            q = q.reshape(*x.shape[:-1], self.num_heads, head_dim)
            k = k.reshape(*x.shape[:-1], self.num_heads, head_dim)
            v = v.reshape(*x.shape[:-1], self.num_heads, head_dim)
            cos, sin = rope_tables  # (N, head_dim)
            q = _apply_rope(q, cos[:, None, :], sin[:, None, :])
            k = _apply_rope(k, cos[:, None, :], sin[:, None, :])
        else:
            qkv = nn.Dense(3 * c, kernel_init=torch_linear_kernel_init,
                           bias_init=torch_linear_bias_init(c), name="qkv")(x)
            q, k, v = jnp.split(
                qkv.reshape(*x.shape[:-1], 3, self.num_heads, head_dim), 3,
                axis=-3)
            q, k, v = (t.squeeze(-3) for t in (q, k, v))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape[:-1], c)
        return nn.Dense(c, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(c), name="proj")(out)


class SwiGLU(nn.Module):
    """SwiGLU FFN with hidden LayerNorm (reference vit.py:115-145)."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        x1 = nn.Dense(self.hidden_dim, kernel_init=torch_linear_kernel_init,
                      bias_init=torch_linear_bias_init(self.dim), name="w1")(x)
        x2 = nn.Dense(self.hidden_dim, kernel_init=torch_linear_kernel_init,
                      bias_init=torch_linear_bias_init(self.dim), name="w2")(x)
        hidden = nn.silu(x1) * x2
        hidden = nn.LayerNorm(epsilon=1e-6, name="ffn_ln")(hidden)
        return nn.Dense(self.dim, kernel_init=torch_linear_kernel_init,
                        bias_init=torch_linear_bias_init(self.hidden_dim),
                        name="w3")(hidden)


class ResBottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 conv residual block with LayerNorm + GELU, last
    norm zero-initialized (reference vit.py:220-281; ViTDet-style)."""

    features: int
    bottleneck: int

    @nn.compact
    def __call__(self, x):  # NHWC
        out = nn.Conv(self.bottleneck, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_out, name="conv1")(x)
        out = nn.LayerNorm(epsilon=1e-6, name="norm1")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(self.bottleneck, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, kernel_init=kaiming_normal_out,
                      name="conv2")(out)
        out = nn.LayerNorm(epsilon=1e-6, name="norm2")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_out, name="conv3")(out)
        out = nn.LayerNorm(
            epsilon=1e-6, scale_init=zeros_init, bias_init=zeros_init,
            name="norm3",
        )(out)
        return x + out


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 0  # 0 = global attention
    mlp_dim: int = 0  # 0 => 4 * dim
    use_rope: bool = False
    use_swiglu: bool = False
    pt_seq_len: int = 16

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        attn = Attention(self.dim, self.num_heads, use_rope=self.use_rope,
                         name="attn")
        if self.window_size > 0:
            ws = self.window_size
            pad_h = int(np.ceil(h / ws)) * ws
            pad_w = int(np.ceil(w / ws)) * ws
            x = jnp.pad(x, ((0, 0), (0, pad_h - h), (0, pad_w - w), (0, 0)))
            nh, nw = pad_h // ws, pad_w // ws
            x = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b * nh * nw, ws * ws, c)
            tables = None
            if self.use_rope:
                cos, sin = _rope_tables(
                    c // self.num_heads, self.pt_seq_len, (ws, ws))
                tables = (jnp.asarray(cos), jnp.asarray(sin))
            x = attn(x, tables)
            x = x.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, pad_h, pad_w, c)[:, :h, :w]
        else:
            tables = None
            if self.use_rope:
                cos, sin = _rope_tables(
                    c // self.num_heads, self.pt_seq_len, (h, w))
                tables = (jnp.asarray(cos), jnp.asarray(sin))
            x = attn(x.reshape(b, h * w, c), tables).reshape(b, h, w, c)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        mlp_dim = self.mlp_dim or int(c * 4)
        if self.use_swiglu:
            y = SwiGLU(c, mlp_dim, name="mlp")(y)
        else:
            y = nn.Dense(mlp_dim, kernel_init=torch_linear_kernel_init,
                         bias_init=torch_linear_bias_init(c), name="mlp_fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(c, kernel_init=torch_linear_kernel_init,
                         bias_init=torch_linear_bias_init(mlp_dim),
                         name="mlp_fc2")(y)
        return x + y


class VisionTransformerBackbone(nn.Module):
    """ViT + SimpleFeaturePyramid.

    ``return_indices`` selects pyramid stages 0-3 = strides 4/8/16/32 built
    from the stride-16 ViT map with scale factors 2^(2-idx) (reference
    vit.py:898-911); every output is 256 channels after the 1x1+3x3
    Conv+LayerNorm projections (:709-714).
    """

    arch: str = "vit_b"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    out_channels: int = 256

    @property
    def num_channels(self) -> Tuple[int, ...]:
        return (self.out_channels,) * len(self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cfg = ARCH_SETTINGS[self.arch]
        dim = cfg["dim"]
        patch = 16
        x = nn.Conv(dim, (patch, patch), strides=(patch, patch), padding="VALID",
                    kernel_init=trunc_normal_02, name="patch_embed")(x)
        for i in range(cfg["depth"]):
            x = ViTBlock(
                dim, cfg["num_heads"],
                window_size=0 if i in cfg["global_idx"] else cfg["window_size"],
                mlp_dim=cfg["mlp_dim"],
                use_rope=cfg["rope"],
                use_swiglu=cfg["swiglu"],
                pt_seq_len=patch,
                name=f"block{i}",
            )(x)

        def project(y, stage):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        kernel_init=kaiming_normal_out,
                        name=f"fpn{stage}_conv1")(y)
            y = nn.LayerNorm(epsilon=1e-6, name=f"fpn{stage}_norm1")(y)
            y = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=kaiming_normal_out,
                        name=f"fpn{stage}_conv2")(y)
            return nn.LayerNorm(epsilon=1e-6, name=f"fpn{stage}_norm2")(y)

        outputs = []
        for stage in self.return_indices:
            scale = 2.0 ** (2 - stage)
            if scale == 4.0:
                y = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     kernel_init=trunc_normal_02,
                                     name=f"fpn{stage}_up1")(x)
                y = nn.LayerNorm(epsilon=1e-6, name=f"fpn{stage}_upnorm")(y)
                y = nn.gelu(y, approximate=False)
                y = nn.ConvTranspose(dim // 4, (2, 2), strides=(2, 2),
                                     kernel_init=trunc_normal_02,
                                     name=f"fpn{stage}_up2")(y)
            elif scale == 2.0:
                y = nn.ConvTranspose(dim // 2, (2, 2), strides=(2, 2),
                                     kernel_init=trunc_normal_02,
                                     name=f"fpn{stage}_up1")(x)
            elif scale == 1.0:
                y = x
            else:  # 0.5
                y = nn.max_pool(x, (2, 2), strides=(2, 2))
            outputs.append(project(y, stage))
        return tuple(outputs)
