"""Small shared layers and torch-parity initializers.

Initializer fidelity matters for from-scratch training parity with the
reference, which overrides most layers with xavier_uniform weights and zero
or specialized biases (e.g. /root/reference/models/bricks/basic.py:17-20,
/root/reference/models/bricks/ms_deform_attn.py:266-284). Where the reference
relies on torch defaults (kaiming_uniform(a=sqrt(5)) weights, uniform
fan-in-scaled biases), `torch_linear_kernel_init` / `torch_linear_bias_init`
reproduce them.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros
normal_init = nn.initializers.normal(stddev=1.0)


def constant_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) on (out, in).

    flax kernels are (in, out); fan_in is shape[0] either way for Linear.
    """
    fan_in = shape[0]
    bound = math.sqrt(6.0 / ((1 + 5.0) * fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def prior_prob_bias_init(prior_prob: float = 0.01):
    """Focal-loss classification bias: -log((1-p)/p).

    Mirrors /root/reference/models/bricks/relation_transformer.py:49-51.
    """
    value = -math.log((1 - prior_prob) / prior_prob)
    return constant_init(value)


class MLP(nn.Module):
    """DETR-style MLP with ReLU between layers.

    Spec: /root/reference/models/bricks/basic.py:6-25 (xavier_uniform
    weights, zero biases).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    last_kernel_init: Callable = xavier_uniform
    last_bias_init: Callable = zeros_init

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            x = nn.Dense(
                self.output_dim if last else self.hidden_dim,
                kernel_init=self.last_kernel_init if last else xavier_uniform,
                bias_init=self.last_bias_init if last else zeros_init,
                name=f"layers_{i}",
            )(x)
            if not last:
                x = nn.relu(x)
        return x


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params.

    The reference freezes every backbone BN
    (/root/reference/models/bricks/misc.py:9-59); here scale/bias/mean/var are
    non-trainable variables in the "batch_stats" collection so optimizers skip
    them and checkpoint converters can fill them.
    """

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.variable(
            "batch_stats", "weight", lambda: jnp.ones((self.num_features,))
        ).value
        bias = self.variable(
            "batch_stats", "bias", lambda: jnp.zeros((self.num_features,))
        ).value
        mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((self.num_features,))
        ).value
        var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((self.num_features,))
        ).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class ConvNormActivation(nn.Module):
    """Conv2d (NHWC) + optional norm + optional activation.

    Mirrors /root/reference/models/bricks/misc.py:112-158 /
    torchvision's Conv2dNormActivation: bias defaults to (norm is None),
    xavier init when used inside ChannelMapper
    (/root/reference/models/necks/channel_mapper.py:63-69).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    norm: Optional[str] = "group"  # "group" | "frozen_bn" | None
    num_groups: int = 32
    activation: Optional[Callable] = None
    kernel_init: Callable = xavier_uniform
    use_bias: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_bias if self.use_bias is not None else self.norm is None
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=use_bias,
            kernel_init=self.kernel_init,
            bias_init=zeros_init,
            name="conv",
        )(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=self.num_groups, name="norm")(x)
        elif self.norm == "frozen_bn":
            x = FrozenBatchNorm(self.features, name="norm")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def with_pos_embed(tensor: jnp.ndarray, pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    return tensor if pos is None else tensor + pos


class SqueezeExcitation(nn.Module):
    """Channel SE block (misc.py SqueezeExcitation; unused by shipped configs)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # NHWC
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(max(self.channels // self.reduction, 1), name="fc1")(s))
        s = nn.sigmoid(nn.Dense(self.channels, name="fc2")(s))
        return x * s[:, None, None, :]


class ContextBlock(nn.Module):
    """GCNet global-context block (reference models/bricks/basic.py:77-188;
    unused by shipped configs).

    Full reference surface: pooling_type "attn" (1x1-conv softmax attention
    pool) or "avg" (global mean), fusion_types any subset of
    {"channel_add", "channel_mul"}; each fusion branch is a
    Dense->LayerNorm->ReLU->Dense bottleneck whose FINAL layer is
    zero-initialized so the block starts as identity (basic.py:136-141)."""

    channels: int
    ratio: float = 1.0 / 16
    pooling_type: str = "attn"
    fusion_types: tuple = ("channel_add",)

    def _bottleneck(self, context: jnp.ndarray, name: str) -> jnp.ndarray:
        hidden = max(int(self.channels * self.ratio), 1)
        t = nn.Dense(hidden, name=f"{name}_1")(context)
        t = nn.relu(nn.LayerNorm(name=f"{name}_norm")(t))
        # zero-init final projection: the block is an identity at init
        return nn.Dense(
            self.channels,
            name=f"{name}_2",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(t)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # NHWC
        assert self.pooling_type in ("attn", "avg")
        assert self.fusion_types and all(
            f in ("channel_add", "channel_mul") for f in self.fusion_types
        )
        b, h, w, c = x.shape
        if self.pooling_type == "attn":
            logits = nn.Dense(1, name="conv_mask")(x).reshape(b, h * w)
            attn = jax.nn.softmax(logits, axis=-1)
            context = jnp.einsum("bn,bnc->bc", attn, x.reshape(b, h * w, c))
        else:
            context = jnp.mean(x, axis=(1, 2))
        out = x
        if "channel_mul" in self.fusion_types:
            m = nn.sigmoid(self._bottleneck(context, "channel_mul"))
            out = out * m[:, None, None, :]
        if "channel_add" in self.fusion_types:
            out = out + self._bottleneck(context, "channel_add")[:, None, None, :]
        return out
