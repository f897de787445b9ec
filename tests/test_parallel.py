"""Sharding correctness: an 8-device data-parallel step equals 1-device math."""
import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from relation_detr_tpu.losses.criterion import CriterionConfig
from relation_detr_tpu.models.detector import RelationDETR
from relation_detr_tpu.parallel.mesh import create_mesh, shard_batch
from relation_detr_tpu.parallel.train_step import create_train_state, make_train_step
from relation_detr_tpu.utils.param_groups import build_optimizer, is_frozen, make_mask


@pytest.fixture(scope="module")
def setup():
    model = RelationDETR(num_classes=6, num_queries=20, hybrid_num_proposals=30,
                         denoising_nums=3, transformer_enc_layers=1,
                         transformer_dec_layers=1, backbone_arch="resnet18")
    cfg = CriterionConfig(num_classes=6)
    rng = np.random.RandomState(0)
    B, H, W, G = 8, 64, 64, 4
    batch = {
        "images": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "mask": jnp.zeros((B, H, W), bool),
        "gt_labels": jnp.asarray(rng.randint(0, 6, (B, G)), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.clip(rng.uniform(0.2, 0.6, (B, G, 4)), 0.05, 0.95), jnp.float32
        ),
        "gt_valid": jnp.asarray(rng.rand(B, G) < 0.8),
    }
    variables = model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        batch["images"], batch["mask"], batch["gt_labels"], batch["gt_boxes"],
        batch["gt_valid"], train=True,
    )
    return model, cfg, batch, variables


_STEP_CACHE = {}


def _get_step(model, cfg, n_devs):
    """One compiled train step per mesh size for the whole module — each
    make_train_step call builds a fresh jit closure (cache miss), and a full
    train-step compile costs minutes on this container's single CPU core."""
    key = n_devs
    if key not in _STEP_CACHE:
        mesh = create_mesh(jax.devices()[:n_devs])
        tx = build_optimizer(optax.constant_schedule(1e-4))
        step = make_train_step(model, cfg, tx, mesh, donate=False)
        _STEP_CACHE[key] = (mesh, tx, step)
    return _STEP_CACHE[key]


def _run_step(model, cfg, batch, variables, devices):
    mesh, tx, step = _get_step(model, cfg, len(devices))
    state = create_train_state(variables, tx)
    sharded = shard_batch(mesh, batch)
    new_state, metrics = step(state, sharded, jax.random.key(7))
    return new_state, metrics


def test_8dev_matches_1dev(setup):
    model, cfg, batch, variables = setup
    _, m1 = _run_step(model, cfg, batch, variables, jax.devices()[:1])
    _, m8 = _run_step(model, cfg, batch, variables, jax.devices()[:8])
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m8["total_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=1e-3
    )


def test_nonfinite_step_skipped(setup):
    """A batch that produces a non-finite loss must not update params, and the
    device-side counter must record the skipped step (train_step.py)."""
    model, cfg, batch, variables = setup
    bad = dict(batch)
    bad["images"] = batch["images"].at[0, 0, 0, 0].set(jnp.nan)
    mesh, tx, step = _get_step(model, cfg, 8)
    state = create_train_state(variables, tx)
    new_state, metrics = step(state, shard_batch(mesh, bad), jax.random.key(7))
    assert int(metrics["nonfinite_count"]) == 1
    assert int(metrics["first_nonfinite_step"]) == 0
    for old, new in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
    # a following good step proceeds normally and updates params
    state2, m2 = step(new_state, shard_batch(mesh, batch), jax.random.key(8))
    assert int(m2["nonfinite_count"]) == 1  # cumulative, no new skips
    assert int(m2["first_nonfinite_step"]) == 0
    assert np.isfinite(float(m2["total_loss"]))
    changed = sum(
        float(jnp.abs(n - o).max()) > 0
        for o, n in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(state2.params))
    )
    assert changed > 50


def test_sharded_eval_matches_single_device(setup):
    """make_eval_fwd shards the eval forward over the mesh when the batch
    divides the device count; results must equal single-device eval."""
    from relation_detr_tpu.utils.evaluation import make_eval_fwd

    model, _, batch, variables = setup
    fwd_sharded = make_eval_fwd(model, batch_size=8)
    fwd_single = jax.jit(lambda v, x, m: model.apply(v, x, m, train=False))
    out_s = fwd_sharded(variables, batch["images"], batch["mask"])
    out_1 = fwd_single(variables, batch["images"], batch["mask"])
    np.testing.assert_allclose(
        np.asarray(out_s["pred_logits"]), np.asarray(out_1["pred_logits"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["pred_boxes"]), np.asarray(out_1["pred_boxes"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("save_devs,restore_devs", [(8, 1), (1, 8)])
def test_cross_mesh_checkpoint_resume(setup, tmp_path, save_devs, restore_devs):
    """Save a training state on one mesh size and restore on another
    (orbax resharding) — the first thing a real user hits when moving between
    a pod slice and a single chip."""
    from relation_detr_tpu.utils.checkpoint import CheckpointManager

    model, cfg, batch, variables = setup

    def make_state(n_devs):
        mesh, tx_c, step = _get_step(model, cfg, n_devs)
        state = create_train_state(variables, tx_c)
        sub = {k: v[: max(n_devs, 1)] for k, v in batch.items()}
        state, _ = step(state, shard_batch(mesh, sub), jax.random.key(3))
        return state

    saved = make_state(save_devs)
    ckpt = CheckpointManager(str(tmp_path / f"ck_{save_devs}to{restore_devs}"))
    ckpt.save(0, saved)

    # fresh template laid out for the restore mesh
    restore_mesh, tx, step = _get_step(model, cfg, restore_devs)
    template = create_train_state(variables, tx)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(restore_mesh, P())
    template = jax.tree.map(lambda x: jax.device_put(x, repl), template)
    restored = ckpt.restore(template)
    for a, b in zip(jax.tree.leaves(saved.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(saved.step) == 1
    # restored state can take a step on the new mesh
    sub = {k: v[: max(restore_devs, 1)] for k, v in batch.items()}
    _, metrics = step(restored, shard_batch(restore_mesh, sub), jax.random.key(4))
    assert np.isfinite(float(metrics["total_loss"]))


def test_params_update_and_frozen_stay(setup):
    model, cfg, batch, variables = setup
    state_new, _ = _run_step(model, cfg, batch, variables, jax.devices()[:8])
    frozen_mask = make_mask(is_frozen)(variables["params"])
    flat_old = jax.tree_util.tree_leaves_with_path(variables["params"])
    changed = frozen_unchanged = 0
    for (path, old), new, frozen in zip(
        flat_old,
        jax.tree.leaves(state_new.params),
        jax.tree.leaves(frozen_mask),
    ):
        delta = float(jnp.abs(new - old).max())
        if frozen:
            assert delta == 0.0, path
            frozen_unchanged += 1
        elif delta > 0:
            changed += 1
    assert frozen_unchanged > 0
    assert changed > 50


def test_second_step_does_not_recompile(setup):
    """A train step on a mesh-placed state must reuse the compiled program.

    Freshly initialized variables carry SingleDeviceSharding; the step's
    outputs carry NamedSharding(mesh, P()). Without mesh placement in
    create_train_state the SECOND step() call misses the jit cache and
    recompiles the full program (measured 177 s wasted on the flagship TPU
    — PERF.md round 4, found via a 67 s/step bench artifact)."""
    model, cfg, batch, variables = setup
    mesh, tx, step = _get_step(model, cfg, 8)
    state = create_train_state(variables, tx, mesh)
    sharded = shard_batch(mesh, batch)
    state, _ = step(state, sharded, jax.random.key(7))
    n_compiles = step._cache_size()
    state, _ = step(state, sharded, jax.random.key(7))
    state, _ = step(state, sharded, jax.random.key(7))
    assert step._cache_size() == n_compiles, (
        f"train step retraced: cache {n_compiles} -> {step._cache_size()}"
    )
