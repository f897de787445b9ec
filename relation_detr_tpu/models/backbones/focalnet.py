"""FocalNet backbone (focal modulation, NHWC).

Behavioral spec: /root/reference/models/backbones/focalnet.py (FocalModulation
:45-136, block :140-199, conv patch embed :215-252, arch table :408-546).
The flagship detection variant is ``focalnet_large_lrf_fl4`` (63.5 AP config):
conv embed, post-LN blocks, layerscale 1e-4, normalized modulator, 4 focal
levels of window-3 depthwise convs.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

trunc_normal_02 = nn.initializers.truncated_normal(0.02)

ARCH_SETTINGS = {
    # name: (embed_dim, depths, focal_levels, focal_windows, conv_embed,
    #        postln, layerscale, normalize_modulator)
    "focalnet_tiny_srf": (96, (2, 2, 6, 2), (2,) * 4, (3,) * 4, False, False, False, False),
    "focalnet_small_lrf": (96, (2, 2, 18, 2), (3,) * 4, (3,) * 4, False, False, False, False),
    "focalnet_base_lrf": (128, (2, 2, 18, 2), (3,) * 4, (3,) * 4, False, False, False, False),
    "focalnet_large_lrf_fl4": (192, (2, 2, 18, 2), (4,) * 4, (3,) * 4, True, True, True, True),
}


class FocalModulation(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    focal_factor: int = 2
    normalize_modulator: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.dim
        f = nn.Dense(2 * c + self.focal_level + 1, kernel_init=trunc_normal_02, name="f")(x)
        q, ctx, gates = jnp.split(f, [c, 2 * c], axis=-1)

        ctx_all = jnp.zeros_like(q)
        for level in range(self.focal_level):
            k = self.focal_factor * level + self.focal_window
            ctx = nn.Conv(
                c, (k, k), padding=[(k // 2, k // 2)] * 2, feature_group_count=c,
                use_bias=False, kernel_init=trunc_normal_02, name=f"focal_{level}",
            )(ctx)
            ctx = nn.gelu(ctx, approximate=False)
            ctx_all = ctx_all + ctx * gates[..., level : level + 1]
        ctx_global = nn.gelu(
            jnp.mean(ctx, axis=(1, 2), keepdims=True), approximate=False
        )
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level :]
        if self.normalize_modulator:
            ctx_all = ctx_all / (self.focal_level + 1)

        modulator = nn.Conv(c, (1, 1), kernel_init=trunc_normal_02, name="h")(ctx_all)
        out = q * modulator
        return nn.Dense(c, kernel_init=trunc_normal_02, name="proj")(out)


class FocalBlock(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    mlp_ratio: float = 4.0
    use_postln: bool = False
    use_layerscale: bool = False
    normalize_modulator: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def scale(name):
            if not self.use_layerscale:
                return 1.0
            return self.param(name, nn.initializers.constant(1e-4), (self.dim,))

        mod = FocalModulation(
            self.dim, self.focal_level, self.focal_window,
            normalize_modulator=self.normalize_modulator, name="modulation",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")

        def mlp(h):
            h = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=trunc_normal_02,
                         name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.dim, kernel_init=trunc_normal_02, name="mlp_fc2")(h)

        if self.use_postln:  # focalnet.py:190-193
            x = x + scale("gamma_1") * norm1(mod(x))
            x = x + scale("gamma_2") * norm2(mlp(x))
        else:  # focalnet.py:195-198
            x = x + scale("gamma_1") * mod(norm1(x))
            x = x + scale("gamma_2") * mlp(norm2(x))
        return x


class PatchEmbed(nn.Module):
    features: int
    patch_size: int = 4
    use_conv_embed: bool = False
    is_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv_embed:
            k, s, p = (7, 4, 2) if self.is_stem else (3, 2, 1)
            x = nn.Conv(self.features, (k, k), strides=(s, s),
                        padding=[(p, p), (p, p)], kernel_init=trunc_normal_02,
                        name="proj")(x)
        else:
            ps = self.patch_size
            x = nn.Conv(self.features, (ps, ps), strides=(ps, ps), padding="VALID",
                        kernel_init=trunc_normal_02, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class FocalNetBackbone(nn.Module):
    """FocalNet feature extractor returning NHWC stage outputs (strides 8/16/32
    for the default ``return_indices=(1, 2, 3)``)."""

    arch: str = "focalnet_large_lrf_fl4"
    return_indices: Tuple[int, ...] = (1, 2, 3)

    @property
    def num_channels(self) -> Tuple[int, ...]:
        embed_dim = ARCH_SETTINGS[self.arch][0]
        return tuple(embed_dim * (2**i) for i in self.return_indices)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        (embed_dim, depths, focal_levels, focal_windows, conv_embed, postln,
         layerscale, norm_mod) = ARCH_SETTINGS[self.arch]
        x = PatchEmbed(embed_dim, 4, conv_embed, is_stem=True, name="patch_embed")(x)
        outputs = []
        for stage_idx, depth in enumerate(depths):
            dim = embed_dim * (2**stage_idx)
            for i in range(depth):
                x = FocalBlock(
                    dim,
                    focal_levels[stage_idx],
                    focal_windows[stage_idx],
                    use_postln=postln,
                    use_layerscale=layerscale,
                    normalize_modulator=norm_mod,
                    name=f"stage{stage_idx}_block{i}",
                )(x)
            if stage_idx in self.return_indices:
                outputs.append(
                    nn.LayerNorm(epsilon=1e-5, name=f"outnorm{stage_idx}")(x)
                )
            if stage_idx < len(depths) - 1:
                x = PatchEmbed(dim * 2, 2, conv_embed, name=f"downsample{stage_idx}")(x)
        return tuple(outputs)
