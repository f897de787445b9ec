"""End-to-end numeric parity: the full flax RelationTransformer forward vs
the torch oracle (tests/torch_oracle.py), with weights converted by
tools/convert_torch_weights.convert_state_dict.

This value-tests the converter (a transposed kernel or swapped q/k/v split
fails here) and the complete forward chain: encoder layers -> memory fusion
-> two-stage top-k -> CDN concat -> decoder with relation bias + iterative
refinement -> heads, plus the hybrid branch in train mode
(relation_transformer.py:59-159,320-383).
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.convert_torch_weights import convert_state_dict  # noqa: E402

from relation_detr_tpu.models.transformer import RelationTransformer  # noqa: E402
from tests.torch_oracle import (  # noqa: E402
    DetectorShell,
    RelationTransformer as TorchRelationTransformer,
)

SPATIAL = ((12, 16), (6, 8), (3, 4))
DIMS = dict(num_classes=7, embed_dim=32, d_ffn=64, num_heads=4,
            num_levels=3, num_points=4, num_encoder_layers=2,
            num_decoder_layers=2, two_stage_num_proposals=20,
            hybrid_num_proposals=30)


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


@pytest.fixture(scope="module")
def models_and_inputs():
    torch.manual_seed(0)
    oracle = DetectorShell(TorchRelationTransformer(**DIMS)).eval()

    params_flat, stats_flat, leftover = convert_state_dict(
        {k: v for k, v in oracle.state_dict().items()}
    )
    assert not stats_flat
    assert not [k for k in leftover if "position_relation" not in k], leftover
    # converter emits 'transformer/...' paths; the bare flax transformer
    # module tree starts below that prefix
    params = _unflatten(
        {k.split("/", 1)[1]: v for k, v in params_flat.items()}
    )

    model = RelationTransformer(
        num_classes=DIMS["num_classes"], embed_dim=DIMS["embed_dim"],
        d_ffn=DIMS["d_ffn"], num_heads=DIMS["num_heads"],
        num_feature_levels=DIMS["num_levels"], num_points=DIMS["num_points"],
        num_encoder_layers=DIMS["num_encoder_layers"],
        num_decoder_layers=DIMS["num_decoder_layers"],
        two_stage_num_proposals=DIMS["two_stage_num_proposals"],
        hybrid_num_proposals=DIMS["hybrid_num_proposals"],
    )

    rng = np.random.RandomState(0)
    B, C = 2, DIMS["embed_dim"]
    feats, masks, pos = [], [], []
    for h, w in SPATIAL:
        feats.append(rng.randn(B, h, w, C).astype(np.float32))
        m = np.zeros((B, h, w), bool)
        # image 1 occupies ~3/4 of the canvas (valid-ratio path exercised)
        m[1, (3 * h) // 4:, :] = True
        m[1, :, (3 * w) // 4:] = True
        masks.append(m)
        pos.append(rng.randn(B, h, w, C).astype(np.float32))

    # init to get the param-tree structure, then swap in converted weights
    # (train=True so the lazily-created hybrid branch params materialize)
    variables = model.init(
        jax.random.key(0),
        [jnp.asarray(f) for f in feats],
        [jnp.asarray(m) for m in masks],
        [jnp.asarray(p) for p in pos],
        train=True,
    )
    tmpl_paths = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert tmpl_paths == got_paths, (
        f"missing: {sorted(tmpl_paths - got_paths)[:6]} "
        f"extra: {sorted(got_paths - tmpl_paths)[:6]}"
    )
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(variables["params"])[0],
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0],
               key=lambda kv: str(kv[0])),
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)

    return oracle, model, {"params": params}, feats, masks, pos


def _to_torch(feats, masks, pos):
    tf = [torch.from_numpy(f).permute(0, 3, 1, 2).contiguous() for f in feats]
    tm = [torch.from_numpy(m) for m in masks]
    tp = [torch.from_numpy(p).permute(0, 3, 1, 2).contiguous() for p in pos]
    return tf, tm, tp


def test_eval_forward_parity(models_and_inputs):
    oracle, model, variables, feats, masks, pos = models_and_inputs
    tf, tm, tp = _to_torch(feats, masks, pos)
    with torch.no_grad():
        ref = oracle.transformer(tf, tm, tp, training=False)
    ours = model.apply(
        variables,
        [jnp.asarray(f) for f in feats],
        [jnp.asarray(m) for m in masks],
        [jnp.asarray(p) for p in pos],
        train=False,
    )
    # tolerance: fp32 op-ordering noise (XLA fusion vs torch kernels)
    # accumulates to ~5e-4 through stacked layernorm chains; converter
    # bugs (transposed kernel, swapped qkv) produce O(1) errors
    for name, idx in (("classes", 0), ("coords", 1), ("enc_class", 2),
                      ("enc_coord", 3)):
        np.testing.assert_allclose(
            np.asarray(ours[idx]), ref[idx].numpy(), rtol=6e-4, atol=6e-4,
            err_msg=name,
        )


def test_train_forward_parity_with_cdn(models_and_inputs):
    """Train mode: hybrid branch + injected CDN queries (identical noise on
    both sides) exercising the masked decoder path."""
    oracle, model, variables, feats, masks, pos = models_and_inputs
    rng = np.random.RandomState(1)
    B, C = feats[0].shape[0], DIMS["embed_dim"]
    n_dn, n_match = 8, DIMS["two_stage_num_proposals"]
    qt = n_dn + n_match
    noised_label = rng.randn(B, n_dn, C).astype(np.float32)
    noised_box = rng.randn(B, n_dn, 4).astype(np.float32)
    # CDN mask: matching part cannot see denoising part and dn groups are
    # mutually blind (denoising.py semantics)
    mask_bool = np.zeros((qt, qt), bool)
    mask_bool[n_dn:, :n_dn] = True
    mask_bool[:n_dn // 2, n_dn // 2:n_dn] = True
    mask_bool[n_dn // 2:n_dn, :n_dn // 2] = True

    tf, tm, tp = _to_torch(feats, masks, pos)
    with torch.no_grad():
        ref = oracle.transformer(
            tf, tm, tp,
            noised_label_query=torch.from_numpy(noised_label),
            noised_box_query=torch.from_numpy(noised_box),
            attn_mask=torch.from_numpy(mask_bool),
            training=True,
        )
    bias = jnp.where(jnp.asarray(mask_bool), -jnp.inf, 0.0)[None, None]
    ours = model.apply(
        variables,
        [jnp.asarray(f) for f in feats],
        [jnp.asarray(m) for m in masks],
        [jnp.asarray(p) for p in pos],
        jnp.asarray(noised_label),
        jnp.asarray(noised_box),
        bias,
        train=True,
    )
    names = ("classes", "coords", "enc_class", "enc_coord", "hybrid_classes",
             "hybrid_coords", "hybrid_enc_class", "hybrid_enc_coord")
    for idx, name in enumerate(names):
        assert ours[idx] is not None and ref[idx] is not None, name
        np.testing.assert_allclose(
            np.asarray(ours[idx]), ref[idx].numpy(), rtol=6e-4, atol=6e-4,
            err_msg=name,
        )
