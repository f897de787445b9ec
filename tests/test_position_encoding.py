"""Golden tests: sine position embeddings vs inline torch oracles.

Oracles are independent implementations of the documented formulas at
/root/reference/models/bricks/position_encoding.py.
"""
import math

import numpy as np
import torch

import jax.numpy as jnp

from relation_detr_tpu.models.position_encoding import (
    get_sine_pos_embed,
    position_embedding_sine,
)


def torch_position_embedding_sine(mask, num_pos_feats=128, temperature=10000,
                                  scale=2 * math.pi, eps=1e-6, offset=-0.5):
    not_mask = (~mask).int()
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats // 2, dtype=torch.float32)
    dim_t = temperature ** (dim_t * 2 / num_pos_feats)
    pos_x = x_embed.unsqueeze(-1) / dim_t
    pos_y = y_embed.unsqueeze(-1) / dim_t
    pos_x = torch.stack((pos_x.sin(), pos_x.cos()), dim=-1).flatten(-2)
    pos_y = torch.stack((pos_y.sin(), pos_y.cos()), dim=-1).flatten(-2)
    return torch.cat((pos_y, pos_x), dim=3)  # NHWC (channel-last here)


def torch_get_sine_pos_embed(pos, num_pos_feats=128, temperature=10000,
                             scale=2 * math.pi, exchange_xy=True):
    dim_t = torch.arange(num_pos_feats // 2, dtype=torch.float32)
    dim_t = temperature ** (dim_t * 2 / num_pos_feats)
    pos_res = pos.unsqueeze(-1) * scale / dim_t
    pos_res = torch.stack((pos_res.sin(), pos_res.cos()), dim=-1).flatten(-2)
    if exchange_xy:
        index = torch.cat([
            torch.arange(1, -1, -1),
            torch.arange(2, pos_res.shape[-2]),
        ])
        pos_res = torch.index_select(pos_res, -2, index)
    return pos_res.flatten(-2)


def test_position_embedding_sine_matches_torch():
    mask = np.zeros((2, 10, 14), bool)
    mask[0, 7:, :] = True
    mask[0, :, 9:] = True
    ours = np.asarray(position_embedding_sine(jnp.asarray(mask)))
    ref = torch_position_embedding_sine(torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_get_sine_pos_embed_matches_torch_4d():
    rng = np.random.RandomState(0)
    pos = rng.rand(2, 7, 4).astype(np.float32)
    ours = np.asarray(get_sine_pos_embed(jnp.asarray(pos), 128))
    ref = torch_get_sine_pos_embed(torch.from_numpy(pos), 128).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_get_sine_pos_embed_relation_settings():
    # PositionRelationEmbedding settings: 16 feats, scale 100, no exchange
    rng = np.random.RandomState(1)
    pos = rng.randn(2, 5, 5, 4).astype(np.float32)
    ours = np.asarray(
        get_sine_pos_embed(jnp.asarray(pos), 16, 10000, 100.0, exchange_xy=False)
    )
    ref = torch_get_sine_pos_embed(
        torch.from_numpy(pos), 16, 10000, 100.0, exchange_xy=False
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_box_rel_encoding_matches_torch():
    from relation_detr_tpu.models.relation import box_rel_encoding

    rng = np.random.RandomState(2)
    src = np.concatenate([rng.rand(2, 6, 2), rng.rand(2, 6, 2) * 0.4 + 0.05], -1).astype(np.float32)
    tgt = np.concatenate([rng.rand(2, 9, 2), rng.rand(2, 9, 2) * 0.4 + 0.05], -1).astype(np.float32)
    ours = np.asarray(box_rel_encoding(jnp.asarray(src), jnp.asarray(tgt)))

    ts, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    xy1, wh1 = ts.split([2, 2], -1)
    xy2, wh2 = tt.split([2, 2], -1)
    delta_xy = torch.abs(xy1.unsqueeze(-2) - xy2.unsqueeze(-3))
    delta_xy = torch.log(delta_xy / (wh1.unsqueeze(-2) + 1e-5) + 1.0)
    delta_wh = torch.log((wh1.unsqueeze(-2) + 1e-5) / (wh2.unsqueeze(-3) + 1e-5))
    ref = torch.cat([delta_xy, delta_wh], -1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_position_embedding_learned_matches_reference_semantics():
    """PositionEmbeddingLearned (position_encoding.py:71-98): channels are
    [col(x) feats, row(y) feats], constant across batch, indexed by pixel."""
    import jax

    from relation_detr_tpu.models.position_encoding import (
        PositionEmbeddingLearned,
    )

    mod = PositionEmbeddingLearned(num_embeddings=50, num_pos_feats=8)
    mask = jnp.zeros((2, 5, 7), bool)
    v = mod.init(jax.random.key(0), mask)
    out = np.asarray(mod.apply(v, mask))
    assert out.shape == (2, 5, 7, 16)
    row = np.asarray(v["params"]["row_embed"])
    col = np.asarray(v["params"]["col_embed"])
    # torch oracle: cat([x_emb repeated over rows, y_emb repeated over cols])
    t_row, t_col = torch.from_numpy(row), torch.from_numpy(col)
    x_emb = t_col[torch.arange(7)]
    y_emb = t_row[torch.arange(5)]
    ref = torch.cat(
        [x_emb.unsqueeze(0).repeat(5, 1, 1), y_emb.unsqueeze(1).repeat(1, 7, 1)],
        dim=-1,
    ).numpy()
    np.testing.assert_allclose(out[0], ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out[1], ref, rtol=1e-6, atol=1e-6)
    # uniform[0,1) init, matching nn.init.uniform_ defaults
    assert 0.0 <= row.min() and row.max() < 1.0
