"""Golden test: jnp MSDA vs a torch grid_sample implementation.

The torch oracle below is an independent implementation of the op's
documented semantics (per-level grid_sample with align_corners=False and
zero padding), matching the spec at
/root/reference/models/bricks/ms_deform_attn.py:159-212.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from relation_detr_tpu.ops.msda import multi_scale_deformable_attention


def torch_msda_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    bs, _, num_heads, head_dim = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    grids = 2 * sampling_locations - 1
    start = 0
    per_level = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start : start + h * w]  # (B, hw, H, D)
        start += h * w
        v = v.permute(0, 2, 3, 1).reshape(bs * num_heads, head_dim, h, w)
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4)  # (B, H, Q, P, 2)
        g = g.reshape(bs * num_heads, num_queries, num_points, 2)
        s = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*H, D, Q, P)
        per_level.append(s)
    stacked = torch.stack(per_level, dim=-2)  # (B*H, D, Q, L, P)
    attn = attention_weights.permute(0, 2, 1, 3, 4).reshape(
        bs * num_heads, 1, num_queries, num_levels, num_points
    )
    out = (stacked * attn).sum(dim=(-2, -1))  # (B*H, D, Q)
    out = out.reshape(bs, num_heads, head_dim, num_queries).permute(0, 3, 1, 2)
    return out.reshape(bs, num_queries, num_heads * head_dim)


def make_inputs(seed, bs=2, num_queries=17, num_heads=4, head_dim=8, num_points=3,
                spatial_shapes=((11, 13), (6, 7), (3, 4))):
    rng = np.random.RandomState(seed)
    total = sum(h * w for h, w in spatial_shapes)
    num_levels = len(spatial_shapes)
    value = rng.randn(bs, total, num_heads, head_dim).astype(np.float32)
    # include out-of-bounds locations to exercise zero padding
    locs = rng.uniform(-0.3, 1.3, (bs, num_queries, num_heads, num_levels, num_points, 2)).astype(np.float32)
    attn = rng.rand(bs, num_queries, num_heads, num_levels, num_points).astype(np.float32)
    attn = attn / attn.reshape(bs, num_queries, num_heads, -1).sum(-1).reshape(
        bs, num_queries, num_heads, 1, 1
    )
    return value, spatial_shapes, locs, attn


def make_encoder_inputs(seed, bs=2, num_heads=4, head_dim=8, num_points=4,
                        spatial_shapes=((13, 17), (7, 9), (4, 5), (2, 3)),
                        max_offset=2.5):
    """Encoder-layout inputs: Q == S tokens in raster order, sampling
    locations = token grid centers + per-level offsets <= max_offset texels
    (the locality regime the tiled kernel is exact in)."""
    rng = np.random.RandomState(seed)
    total = sum(h * w for h, w in spatial_shapes)
    num_levels = len(spatial_shapes)
    value = rng.randn(bs, total, num_heads, head_dim).astype(np.float32)
    refs = []
    for h, w in spatial_shapes:
        ys, xs = (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w
        refs.append(np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2))
    refs = np.concatenate(refs, 0)  # (S, 2) (x, y)
    norm = np.array([(w, h) for h, w in spatial_shapes], np.float32)
    off = rng.uniform(-max_offset, max_offset,
                      (bs, total, num_heads, num_levels, num_points, 2)).astype(np.float32)
    locs = (refs[None, :, None, None, None, :] + off / norm[None, None, None, :, None, :]
            ).astype(np.float32)
    attn = rng.rand(bs, total, num_heads, num_levels, num_points).astype(np.float32)
    attn = attn / attn.reshape(bs, total, num_heads, -1).sum(-1).reshape(
        bs, total, num_heads, 1, 1
    )
    return value, spatial_shapes, locs, attn


@pytest.mark.parametrize("impl", ["gather", "pair", "corner_pack"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_msda_matches_grid_sample_oracle(seed, impl):
    value, shapes, locs, attn = make_inputs(seed)
    ours = np.asarray(
        multi_scale_deformable_attention(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
            impl=impl,
        )
    )
    ref = torch_msda_oracle(
        torch.from_numpy(value),
        shapes,
        torch.from_numpy(locs),
        torch.from_numpy(attn),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_tiled_matches_grid_sample_oracle(seed):
    """Tiled MXU kernel vs the torch oracle in its exactness regime
    (encoder layout, offsets within the halo)."""
    value, shapes, locs, attn = make_encoder_inputs(seed)
    ours = np.asarray(
        multi_scale_deformable_attention(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
            impl="tiled",
        )
    )
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes,
        torch.from_numpy(locs), torch.from_numpy(attn),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_msda_auto_dispatch():
    """auto == tiled_xla for encoder layout (Q == S) on TPU; off-TPU the
    tiled route is slow to compile so auto keeps corner_pack; decoder
    layouts always go to corner_pack."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    value, shapes, locs, attn = make_encoder_inputs(3, bs=1)
    a = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn), impl="auto")
    t = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
        impl="tiled_xla" if on_tpu else "corner_pack")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(t))

    value, shapes, locs, attn = make_inputs(3, num_queries=9)
    a = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn), impl="auto")
    c = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
        impl="corner_pack")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_msda_tiled_out_of_image_zero_and_clamp():
    """Corners outside the level contribute exactly zero (grid_sample zeros
    padding); offsets far beyond the halo clamp to the patch border without
    producing non-finite output."""
    value, shapes, locs, attn = make_encoder_inputs(4, bs=1)
    locs_oob = np.asarray(locs).copy()
    locs_oob[:, ::3] = 1.7  # fully outside the image
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes,
        torch.from_numpy(locs_oob), torch.from_numpy(attn)).numpy()
    ours = np.asarray(multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs_oob), jnp.asarray(attn),
        impl="tiled"))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # in-image but far from the query: clamped (approximate), must be finite
    locs_far = np.asarray(locs).copy()
    locs_far[:, 1::3] = 1.0 - locs_far[:, 1::3]
    out = np.asarray(multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(locs_far), jnp.asarray(attn),
        impl="tiled"))
    assert np.isfinite(out).all()


def test_msda_tiled_grads_match_gather():
    value, shapes, locs, attn = make_encoder_inputs(5, bs=1, num_heads=2)

    def loss(v, l, a, i):
        return jnp.sum(
            multi_scale_deformable_attention(v, shapes, l, a, impl=i) ** 2
        )

    args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args, "gather")
    g_new = jax.grad(loss, argnums=(0, 1, 2))(*args, "tiled")
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("impl", ["pair", "corner_pack"])
def test_msda_impl_grads_match_gather(impl):
    value, shapes, locs, attn = make_inputs(5, bs=1, num_queries=6)

    def loss(v, l, a, i):
        return jnp.sum(
            multi_scale_deformable_attention(v, shapes, l, a, impl=i) ** 2
        )

    args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args, "gather")
    g_new = jax.grad(loss, argnums=(0, 1, 2))(*args, impl)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_msda_gradients_flow():
    value, shapes, locs, attn = make_inputs(3, bs=1, num_queries=5)

    def loss_fn(v, l, a):
        out = multi_scale_deformable_attention(v, shapes, l, a)
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(grads[0]).sum()) > 0


def test_msda_grad_matches_torch():
    value, shapes, locs, attn = make_inputs(4, bs=1, num_queries=7)

    vt = torch.from_numpy(value).requires_grad_(True)
    lt = torch.from_numpy(locs).requires_grad_(True)
    at = torch.from_numpy(attn).requires_grad_(True)
    torch_msda_oracle(vt, shapes, lt, at).pow(2).sum().backward()

    def loss_fn(v, l, a):
        out = multi_scale_deformable_attention(v, shapes, l, a)
        return jnp.sum(out**2)

    gv, gl, ga = jax.grad(loss_fn, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn)
    )
    np.testing.assert_allclose(np.asarray(gv), vt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), at.grad.numpy(), rtol=1e-3, atol=1e-4)
    # grad wrt sampling locations: exclude points sitting exactly on texel
    # boundaries (floor is non-differentiable there)
    np.testing.assert_allclose(np.asarray(gl), lt.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_tiled_clamp_fraction_diagnostic():
    """Exactness diagnostic: zero inside the halo regime, positive beyond."""
    from relation_detr_tpu.ops.msda import tiled_clamp_fraction

    _, shapes, locs, attn = make_encoder_inputs(0, max_offset=2.5)
    frac = float(tiled_clamp_fraction(
        shapes, jnp.asarray(locs), jnp.asarray(attn),
        tile_tokens=(10, 8), halos=(8, 6, 4, 3), margin=2))
    assert frac == 0.0, frac

    _, shapes, locs, attn = make_encoder_inputs(0, max_offset=8.0)
    frac = float(tiled_clamp_fraction(
        shapes, jnp.asarray(locs), jnp.asarray(attn),
        tile_tokens=(10, 8), halos=(1, 1, 1, 1), margin=2))
    assert frac > 0.05, frac


@pytest.mark.parametrize("dense_rows", [0, 10**6])
def test_msda_corner_pack_dense_and_gather_paths(dense_rows):
    """corner_pack's small-level one-hot matmul and large-level gather paths
    must agree with the oracle (the threshold only picks the faster route)."""
    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_inputs(3)
    with msda_defaults(dense_level_rows=dense_rows):
        ours = np.asarray(
            multi_scale_deformable_attention(
                jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
                impl="corner_pack",
            )
        )
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes,
        torch.from_numpy(locs), torch.from_numpy(attn),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_prepacked_matches_module_and_oracle(seed):
    """Decoder prepack: pack(mask(proj(V))) == blockdiag-proj(pack(mask(V))).

    The prepacked tables + msda_prepacked must reproduce the module's
    corner_pack output exactly (incl. padding mask, value_proj bias, and
    out-of-level zero padding), and both must match the torch oracle."""
    from relation_detr_tpu.models.attention import MultiScaleDeformableAttention
    from relation_detr_tpu.ops import msda as M

    rng = np.random.RandomState(seed)
    shapes = ((12, 16), (6, 8), (3, 4), (2, 2))
    total = sum(h * w for h, w in shapes)
    bs, embed, heads = 2, 64, 4
    mod = MultiScaleDeformableAttention(
        embed_dim=embed, num_levels=4, num_heads=heads, num_points=4
    )
    q = jnp.asarray(rng.randn(bs, 20, embed).astype(np.float32))
    # references deliberately straying outside [0,1]: zero-padding semantics
    ref = jnp.asarray((rng.rand(bs, 20, 4, 2) * 1.4 - 0.2).astype(np.float32))
    val = jnp.asarray(rng.randn(bs, total, embed).astype(np.float32))
    mask = jnp.asarray(rng.rand(bs, total) > 0.8)
    params = mod.init(jax.random.key(0), q, ref, val, shapes, mask)
    with M.msda_defaults(impl="corner_pack"):
        out_ref = mod.apply(params, q, ref, val, shapes, mask)
        tables = M.corner_pack_raw_tables(val, shapes, mask)
        out_pp = mod.apply(params, q, ref, val, shapes, mask,
                           packed_tables=tables)
    np.testing.assert_allclose(
        np.asarray(out_pp), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )

    def loss(p, v, prepack):
        t = M.corner_pack_raw_tables(v, shapes, mask) if prepack else None
        with M.msda_defaults(impl="corner_pack"):
            return jnp.sum(
                mod.apply(p, q, ref, v, shapes, mask, packed_tables=t) ** 2
            )

    g_ref = jax.grad(loss, argnums=(0, 1))(params, val, False)
    g_pp = jax.grad(loss, argnums=(0, 1))(params, val, True)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_msda_tiled_overflow_residual_exact():
    """Overflow residual: out-of-halo corners (even +-32-texel offsets) are
    computed exactly through the fixed-capacity side channel, so the tiled
    kernel matches the oracle at fast halos for offsets far beyond the halo."""
    from relation_detr_tpu.ops.msda import _msda_tiled, msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(0, max_offset=1.5)
    locs = np.array(locs)
    # a few scattered queries get adversarial +-32-texel offsets on level 0
    h0, w0 = shapes[0]
    norm = np.array([w0, h0], np.float32)
    rng = np.random.RandomState(3)
    for q in (5, 60, 140, 200):
        big = rng.uniform(24, 32, (2,)) * rng.choice([-1.0, 1.0], 2)
        locs[:, q, :, 0, 0, :] = locs[:, q, :, 0, 0, :] + big / norm
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes,
        torch.from_numpy(locs), torch.from_numpy(np.array(attn)),
    ).numpy()
    with msda_defaults(tiled_halos=(4, 3, 2, 2), tiled_overflow=64):
        ours = np.asarray(_msda_tiled(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
            jnp.float32, use_pallas=False,
        ))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # beyond capacity the kernel falls back to the border clamp: never
    # worse than the clamp-only kernel, no NaNs
    with msda_defaults(tiled_halos=(4, 3, 2, 2), tiled_overflow=1):
        partial = np.asarray(_msda_tiled(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
            jnp.float32, use_pallas=False,
        ))
    with msda_defaults(tiled_halos=(4, 3, 2, 2), tiled_overflow=0):
        clamped = np.asarray(_msda_tiled(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn),
            jnp.float32, use_pallas=False,
        ))
    assert np.isfinite(partial).all()
    assert np.abs(partial - ref).mean() <= np.abs(clamped - ref).mean() + 1e-7


def test_msda_tiled_overflow_residual_grads():
    """Gradients flow through the residual side channel (value + weights)."""
    from relation_detr_tpu.ops.msda import _msda_tiled, msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(1, max_offset=6.0)

    def f(v, a, overflow):
        with msda_defaults(tiled_halos=(2, 2, 2, 2), tiled_overflow=overflow):
            return jnp.sum(_msda_tiled(
                v, shapes, jnp.asarray(locs), a, jnp.float32, use_pallas=False,
            ) ** 2)

    gv, ga = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(value), jnp.asarray(attn), 1024
    )
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(ga)).all()
    # against the exact gather impl (capacity big enough to cover everything)
    def f_ref(v, a):
        return jnp.sum(multi_scale_deformable_attention(
            v, shapes, jnp.asarray(locs), a, impl="gather") ** 2)
    gv_ref, ga_ref = jax.grad(f_ref, argnums=(0, 1))(
        jnp.asarray(value), jnp.asarray(attn)
    )
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=2e-3, atol=2e-4)


def test_default_geometry_init_exact_across_canvases():
    """The DEFAULT tiled geometry (auto halos + default margin) must clamp
    exactly zero corners at worst-case radius-P init offsets (the
    reference's radial grid init, ms_deform_attn.py:266-278) on canvases
    with different fractional tile origins — the guarantee that makes the
    shipped profile init-exact (PERF.md round-3b margin sweep)."""
    from relation_detr_tpu.ops.msda import tiled_clamp_fraction

    strides = (8, 16, 32, 64)
    P, H = 4, 8
    th = 2 * np.pi * np.arange(H) / H
    dirs = np.stack([np.cos(th), np.sin(th)], -1)
    dirs = dirs / np.abs(dirs).max(-1, keepdims=True)
    for ch, cw in [(800, 1184), (608, 864)]:
        shapes = tuple((-(-ch // s), -(-cw // s)) for s in strides)
        refs = []
        for h, w in shapes:
            yy, xx = np.meshgrid(
                (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
            )
            refs.append(np.stack([xx, yy], -1).reshape(-1, 2))
        refs = np.concatenate(refs)
        wl = np.array([[w, h] for h, w in shapes], np.float32)
        off = (
            dirs[None, :, None, None, :]
            * (np.arange(1, P + 1))[None, None, None, :, None]
        )
        locs = refs[:, None, None, None, :] + off / wl[None, None, :, None, :]
        frac = float(
            tiled_clamp_fraction(shapes, jnp.asarray(locs[None], jnp.float32))
        )
        assert frac == 0.0, (ch, cw, frac)


def test_msda_tiled_xla_grads_slices_vs_gather_patches():
    """The static-slices patch path (custom scatter-add VJP via the Pallas
    window accumulator) must produce the same tiled gradients as the slab
    gather path."""
    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(6, bs=1, num_heads=2)

    def loss(v, l, a):
        return jnp.sum(
            multi_scale_deformable_attention(v, shapes, l, a, impl="tiled_xla") ** 2
        )

    args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))
    with msda_defaults(tiled_patch_mode="gather"):
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args)
    with msda_defaults(tiled_patch_mode="slices"):
        g_new = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_msda_sep_kernel_matches_xla_separable():
    """The fused separable-A Pallas kernel (ops/msda_sep_pallas.py — A built
    in VMEM, never in HBM) must match the XLA separable path bitwise-close,
    forward and gradients (its custom VJP reuses the XLA backward)."""
    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(7, bs=1, num_heads=2)
    args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))

    def loss(v, l, a):
        return jnp.sum(
            multi_scale_deformable_attention(v, shapes, l, a, impl="tiled_xla")
            ** 2
        )

    with msda_defaults(tiled_sep_kernel=False):
        ref = multi_scale_deformable_attention(*((args[0], shapes) + args[1:]),
                                               impl="tiled_xla")
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args)
    with msda_defaults(tiled_sep_kernel=True):
        ker = multi_scale_deformable_attention(*((args[0], shapes) + args[1:]),
                                               impl="tiled_xla")
        g_ker = jax.grad(loss, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ker),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_msda_tiled_bf16_grads_finite():
    """--msda-dtype bf16 must differentiate: _sep_contract's custom backward
    returns cotangents in the primal dtype (bf16), close to the fp32 grads."""
    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(9, bs=1, num_heads=2)
    args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))

    def loss(v, l, a):
        return jnp.sum(
            multi_scale_deformable_attention(v, shapes, l, a, impl="tiled_xla")
            ** 2
        )

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args)
    with msda_defaults(tiled_dtype=jnp.bfloat16):
        g_bf16 = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for a, b in zip(g_ref, g_bf16):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(b).all()
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(b / scale, a / scale, atol=0.05)


def test_msda_tiled_dot_boundary_bf16():
    """tiled_dot_bf16 resolves off on CPU (golden tests stay bitwise fp32);
    forced on, it rounds ONLY the MXU-dot operands — outputs and grads stay
    within bf16 rounding of fp32, tighter than full tiled_dtype=bf16 (the
    A-build itself stays fp32). On TPU this cast is a no-op numerically:
    XLA's DEFAULT dot precision feeds the MXU bf16-rounded operands either
    way (verified bitwise on hardware, PERF.md round-3e)."""
    from relation_detr_tpu.ops.msda import (
        _tiled_dot_bf16_enabled,
        msda_defaults,
    )

    assert jax.default_backend() == "cpu" and not _tiled_dot_bf16_enabled()
    with msda_defaults(tiled_dot_bf16=True):
        assert _tiled_dot_bf16_enabled()
    value, shapes, locs, attn = make_encoder_inputs(11, bs=1, num_heads=2)
    args = (jnp.asarray(value), jnp.asarray(locs), jnp.asarray(attn))

    def loss(v, l, a):
        return jnp.sum(
            multi_scale_deformable_attention(v, shapes, l, a, impl="tiled_xla")
            ** 2
        )

    out_ref = multi_scale_deformable_attention(
        args[0], shapes, args[1], args[2], impl="tiled_xla"
    )
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args)
    with msda_defaults(tiled_dot_bf16=True):
        out_b = multi_scale_deformable_attention(
            args[0], shapes, args[1], args[2], impl="tiled_xla"
        )
        g_b = jax.grad(loss, argnums=(0, 1, 2))(*args)
    scale = np.abs(np.asarray(out_ref)).max()
    np.testing.assert_allclose(
        np.asarray(out_b) / scale, np.asarray(out_ref) / scale, atol=2e-2
    )
    for a, b in zip(g_ref, g_b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.isfinite(b).all()
        s = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(b / s, a / s, atol=2e-2)


def test_msda_sep_kernel_matches_torch_oracle():
    """Fused kernel vs the torch grid_sample oracle in the exactness regime
    (offsets within the halo) — same bar as the XLA tiled path."""
    import torch

    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(8)
    with msda_defaults(tiled_sep_kernel=True):
        ours = np.asarray(
            multi_scale_deformable_attention(
                jnp.asarray(value), shapes, jnp.asarray(locs),
                jnp.asarray(attn), impl="tiled_xla",
            )
        )
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes,
        torch.from_numpy(locs), torch.from_numpy(attn),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_msda_tiled_overflow_tight_halos_exact():
    """Overflow side channel at VERY tight halos (2,2,1,1): out-of-halo
    corners stay exact given enough capacity. Capacity 128 covers all
    overflowing corners at these halos/offsets with margin — seed 13
    overflows more than 64 entries in some (tile, head, level), so a
    64-capacity version passed only because the token-order selection
    happened to drop near-zero-weight strays (found while A/B-ing a top_k
    compaction, round 5; the slab_dot kernel this case originally rode on
    was pruned as a measured-negative, PERF.md rounds 4-5)."""
    import torch

    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(13)
    with msda_defaults(tiled_halos=(2, 2, 1, 1), tiled_overflow=128):
        ours = np.asarray(
            multi_scale_deformable_attention(
                jnp.asarray(value), shapes, jnp.asarray(locs),
                jnp.asarray(attn), impl="tiled_xla",
            )
        )
    ref = torch_msda_oracle(
        torch.from_numpy(value), shapes,
        torch.from_numpy(locs), torch.from_numpy(attn),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_msda_tiled_int8_slab_matches_dequant_oracle():
    """int8 patch slab (eval-only opt-in, PERF.md round 5): the per-channel
    dequant is applied to the per-level contraction OUTPUT, which must
    exactly equal running the fp32 tiled path on the quantize-dequantized
    value (the scale is constant along the contracted token dim). Also
    bounds the quantization error vs the unquantized path."""
    from relation_detr_tpu.ops.msda import msda_defaults

    value, shapes, locs, attn = make_encoder_inputs(5)
    args = (jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn))
    with msda_defaults(impl="tiled_xla", tiled_int8_slab=True):
        q8 = np.asarray(multi_scale_deformable_attention(*args))

    # dequant oracle: quantize per level per channel on the host, then run
    # the standard fp32 tiled path
    bs, total, num_heads, head_dim = value.shape
    vq = value.reshape(bs, total, num_heads * head_dim).copy()
    start = 0
    for h, w in shapes:
        seg = vq[:, start:start + h * w]
        amax = np.abs(seg).max(axis=(0, 1))
        s = np.maximum(amax, 1e-12) / 127.0
        vq[:, start:start + h * w] = np.clip(np.round(seg / s), -127, 127) * s
        start += h * w
    with msda_defaults(impl="tiled_xla"):
        oracle = np.asarray(multi_scale_deformable_attention(
            jnp.asarray(vq.reshape(value.shape)), shapes,
            jnp.asarray(locs), jnp.asarray(attn)))
        base = np.asarray(multi_scale_deformable_attention(*args))
    np.testing.assert_allclose(q8, oracle, rtol=1e-5, atol=2e-5)
    err = np.abs(q8 - base).max()
    assert 0 < err < 0.05, err  # quantization bites, but stays bounded
