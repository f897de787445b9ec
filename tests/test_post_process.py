import numpy as np
import torch

import jax.numpy as jnp

from relation_detr_tpu.models.post_process import post_process
from relation_detr_tpu.utils.param_groups import warmup_multistep_schedule


def test_post_process_matches_torch_flat_topk():
    """Flat top-k over (queries x classes) + cxcywh->xyxy + size scaling
    (post_process.py:28-43)."""
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 10, 5).astype(np.float32)
    boxes = np.concatenate([
        rng.uniform(0.2, 0.8, (2, 10, 2)), rng.uniform(0.1, 0.3, (2, 10, 2))
    ], -1).astype(np.float32)
    sizes = np.asarray([[480.0, 640.0], [300.0, 500.0]], np.float32)

    det = post_process(jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(sizes), 7)

    t_logits = torch.from_numpy(logits)
    prob = t_logits.sigmoid().view(2, -1)
    topv, topi = torch.topk(prob, 7, dim=1)
    t_labels = topi % 5
    t_query = torch.div(topi, 5, rounding_mode="trunc")
    cx, cy, w, h = torch.from_numpy(boxes).unbind(-1)
    xyxy = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    t_boxes = torch.gather(xyxy, 1, t_query.unsqueeze(-1).repeat(1, 1, 4))
    ih, iw = torch.from_numpy(sizes).unbind(1)
    scale = torch.stack([iw, ih, iw, ih], 1)[:, None, :]
    t_boxes = t_boxes * scale

    np.testing.assert_allclose(np.asarray(det["scores"]), topv.numpy(), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(det["labels"]), t_labels.numpy())
    np.testing.assert_allclose(np.asarray(det["boxes"]), t_boxes.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_warmup_multistep_schedule_values():
    """Epoch-0 warmup 1/1000 -> 1 over <=1000 iters, x0.1 at milestone epochs
    (engine.py:30-35, train_config.py:43)."""
    sched = warmup_multistep_schedule(1e-4, steps_per_epoch=500,
                                      milestones_epochs=(10,), warmup_steps=1000)
    np.testing.assert_allclose(float(sched(0)), 1e-4 * 1e-3, rtol=1e-5)
    # warmup length = min(1000, steps_per_epoch) = 500
    np.testing.assert_allclose(float(sched(250)), 1e-4 * (1e-3 + (1 - 1e-3) * 0.5),
                               rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4999)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(5000)), 1e-5, rtol=1e-6)  # epoch 10
