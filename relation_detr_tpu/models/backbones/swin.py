"""Swin Transformer backbone (v1, windowed attention, NHWC).

Behavioral spec: /root/reference/models/backbones/swin.py (torchvision-style
Swin with shifted_window_attention at :96-222, PatchMerging :48-94, arch table
:677-753). Swin-L returns stages 2-4 with channels (384, 768, 1536) for
detection.

TPU notes: window partition/merge are pure reshapes; the (nW, ws^2, ws^2)
attention runs as one batched MXU matmul; the shifted-window region mask and
relative-position-bias index are static constants folded at trace time.
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

ARCH_SETTINGS = {
    # name: (embed_dim, depths, num_heads, window_size, v2)
    # mirrors the reference model_arch table (swin.py:677-753)
    "swin_t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7, False),
    "swin_s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7, False),
    "swin_b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7, False),
    "swin_l": (192, (2, 2, 18, 2), (6, 12, 24, 48), 7, False),
    "swin_b_384": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12, False),
    "swin_l_384": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12, False),
    "swin_v2_t": (96, (2, 2, 6, 2), (3, 6, 12, 24), 8, True),
    # swin_v2_s is torchvision's table entry between v2_t and v2_b; the
    # reference's model_arch stops at v2_t/v2_b but the upstream family has it
    "swin_v2_s": (96, (2, 2, 18, 2), (3, 6, 12, 24), 8, True),
    "swin_v2_b": (128, (2, 2, 18, 2), (4, 8, 16, 32), 8, True),
}


def _log_coords_table(ws: int) -> np.ndarray:
    """Static (2ws-1)^2 x 2 log-spaced relative-coordinate table for the v2
    continuous position bias (reference swin.py:348-372)."""
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), -1)  # (2ws-1, 2ws-1, 2)
    table = table / max(ws - 1, 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0
    return table.reshape(-1, 2)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws^2, ws^2) index into the (2ws-1)^2 bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"), 0
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(pad_h: int, pad_w: int, ws: int, shift: int) -> np.ndarray:
    """Static (nW, ws^2, ws^2) additive mask blocking cross-region attention
    in shifted windows (swin.py:163-180)."""
    img = np.zeros((pad_h, pad_w), np.int32)
    h_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for wsl in w_slices:
            img[hs, wsl] = cnt
            cnt += 1
    img = img.reshape(pad_h // ws, ws, pad_w // ws, ws).transpose(0, 2, 1, 3)
    img = img.reshape(-1, ws * ws)  # (nW, ws^2)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    v2: bool = False  # cosine attention + continuous position bias

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift if min(h, w) > ws else 0
        pad_h = int(np.ceil(h / ws)) * ws
        pad_w = int(np.ceil(w / ws)) * ws
        x = jnp.pad(x, ((0, 0), (0, pad_h - h), (0, pad_w - w), (0, 0)))
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        nh, nw = pad_h // ws, pad_w // ws
        windows = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        windows = windows.reshape(b * nh * nw, ws * ws, c)

        head_dim = c // self.num_heads
        qkv_mod = nn.Dense(
            3 * c,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(c),
            name="qkv",
        )
        qkv = qkv_mod(windows)
        q, k, v = jnp.split(
            qkv.reshape(-1, ws * ws, 3, self.num_heads, head_dim), 3, axis=2
        )
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # (nB, n, H, d)

        if self.v2:
            # v2 zeroes the k bias (shifted_window_attention, torchvision
            # semantics mirrored by the reference swin.py:330-335): with
            # cosine attention a k offset does not cancel in softmax, so
            # subtract it back out of the gathered k
            k_bias = qkv_mod.variables["params"]["bias"][c:2 * c]
            k = k - k_bias.reshape(1, 1, self.num_heads, head_dim)
            qn = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
            )
            kn = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12
            )
            logit_scale = self.param(
                "logit_scale",
                lambda _key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
                (self.num_heads, 1, 1),
            )
            scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))
            logits = jnp.einsum("bqhd,bkhd->bhqk", qn, kn) * scale[None]
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)

        rel_index = _relative_position_index(ws)
        if self.v2:
            # continuous position bias: 2 -> 512 -> heads MLP over log-spaced
            # relative coords, squashed to (0, 16) (reference swin.py:374-381)
            coords = jnp.asarray(_log_coords_table(ws))
            hidden = nn.relu(
                nn.Dense(512, kernel_init=torch_linear_kernel_init,
                         bias_init=torch_linear_bias_init(2),
                         name="cpb_fc1")(coords)
            )
            bias_table = nn.Dense(
                self.num_heads, use_bias=False,
                kernel_init=torch_linear_kernel_init, name="cpb_fc2",
            )(hidden)  # ((2ws-1)^2, heads)
            rel_bias = bias_table[rel_index.reshape(-1)].reshape(
                ws * ws, ws * ws, self.num_heads
            )
            rel_bias = 16.0 * jax.nn.sigmoid(rel_bias)
        else:
            bias_table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * ws - 1) ** 2, self.num_heads),
            )
            rel_bias = bias_table[rel_index.reshape(-1)].reshape(
                ws * ws, ws * ws, self.num_heads
            )
        logits = logits + jnp.transpose(rel_bias, (2, 0, 1))[None]

        if shift:
            mask = jnp.asarray(_shift_attn_mask(pad_h, pad_w, ws, shift))
            logits = logits.reshape(b, nh * nw, self.num_heads, ws * ws, ws * ws)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(b * nh * nw, self.num_heads, ws * ws, ws * ws)

        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, ws * ws, c)
        out = nn.Dense(
            c,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(c),
            name="proj",
        )(out)

        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, pad_h, pad_w, c)
        if shift:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out[:, :h, :w]


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0  # stochastic depth — identity at inference
    v2: bool = False  # v2 applies the norms AFTER attn/MLP (swin.py:505-513)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_mod = WindowAttention(
            self.dim, self.num_heads, self.window_size, self.shift,
            v2=self.v2, name="attn",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        if self.v2:
            attn = norm1(attn_mod(x))
        else:
            attn = attn_mod(norm1(x))
        x = x + self._drop_path(attn, deterministic)

        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")

        def mlp(h):
            h = nn.Dense(
                int(self.dim * self.mlp_ratio),
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(self.dim),
                name="mlp_fc1",
            )(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(
                self.dim,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(int(self.dim * self.mlp_ratio)),
                name="mlp_fc2",
            )(h)

        h = norm2(mlp(x)) if self.v2 else mlp(norm2(x))
        return x + self._drop_path(h, deterministic)

    def _drop_path(self, x, deterministic):
        if deterministic or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
        return x * mask / keep


class PatchMerging(nn.Module):
    """2x2 patch merge. v1: LN(4C) then Linear(4C -> 2C); v2 reverses the
    order with LN on the 2C output (reference swin.py:48-94)."""

    dim: int
    v2: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        reduction = nn.Dense(
            2 * self.dim,
            use_bias=False,
            kernel_init=torch_linear_kernel_init,
            name="reduction",
        )
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        if self.v2:
            return norm(reduction(x))
        return reduction(norm(x))


class SwinTransformerBackbone(nn.Module):
    """Swin feature extractor returning NHWC stage outputs.

    ``return_indices`` defaults to stages 2-4 (strides 8/16/32), matching the
    reference factory (/root/reference/models/backbones/swin.py:756-796).
    """

    arch: str = "swin_l"
    return_indices: Tuple[int, ...] = (1, 2, 3)
    stochastic_depth_prob: float = 0.0

    @property
    def num_channels(self) -> Tuple[int, ...]:
        embed_dim = ARCH_SETTINGS[self.arch][0]
        return tuple(embed_dim * (2**i) for i in self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        embed_dim, depths, num_heads, ws, v2 = ARCH_SETTINGS[self.arch]
        x = nn.Conv(
            embed_dim, (4, 4), strides=(4, 4), padding="VALID",
            kernel_init=torch_linear_kernel_init, name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        total_blocks = sum(depths)
        block_idx = 0
        outputs = []
        for stage_idx, depth in enumerate(depths):
            dim = embed_dim * (2**stage_idx)
            if stage_idx > 0:
                x = PatchMerging(dim // 2, v2=v2, name=f"merge{stage_idx}")(x)
            for i in range(depth):
                dp = self.stochastic_depth_prob * block_idx / max(total_blocks - 1, 1)
                x = SwinBlock(
                    dim,
                    num_heads[stage_idx],
                    ws,
                    shift=0 if i % 2 == 0 else ws // 2,
                    drop_path=dp,
                    v2=v2,
                    name=f"stage{stage_idx}_block{i}",
                )(x, deterministic)
                block_idx += 1
            if stage_idx in self.return_indices:
                # raw stage output, no per-stage norm: the reference extracts
                # features.{2*idx+1} directly (swin.py:782-784)
                outputs.append(x)
        return tuple(outputs)
