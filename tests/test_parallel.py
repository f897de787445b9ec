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


def _run_step(model, cfg, batch, variables, devices):
    mesh = create_mesh(devices)
    tx = build_optimizer(optax.constant_schedule(1e-4))
    state = create_train_state(variables, tx)
    step = make_train_step(model, cfg, tx, mesh, donate=False)
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
