"""Checkpoint save/load (orbax) with the reference's lenient-load semantics.

Mirrors the two reference formats (SURVEY.md §5): (a) full training state
saved per epoch with a keep-limit and best-metric copies
(/root/reference/main.py:102-103,198; util/utils.py:250-269), (b) bare weight
files loadable with shape-mismatch filtering
(/root/reference/util/utils.py:358-422).
"""
from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger("relation_detr_tpu")


class CheckpointManager:
    """Epoch-numbered training-state checkpoints with keep-limit + best copies."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self.best = {"ap": -1.0, "ap50": -1.0}

    def save(self, epoch: int, state: Any):
        self.manager.save(epoch, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def update_best(self, ap: float, ap50: float) -> Dict[str, bool]:
        """Track best metrics; returns which improved (caller saves the
        best_ap/best_ap50 weight files — HighestCheckpoint semantics,
        /root/reference/util/utils.py:250-269)."""
        improved = {"ap": ap > self.best["ap"], "ap50": ap50 > self.best["ap50"]}
        self.best["ap"] = max(self.best["ap"], ap)
        self.best["ap50"] = max(self.best["ap50"], ap50)
        return improved

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, epoch: Optional[int] = None) -> Any:
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self.manager.restore(
            epoch, args=ocp.args.StandardRestore(state_template)
        )


def save_weights(path: str, params: Any):
    """Bare weight checkpoint (numpy .npz of flattened param paths)."""
    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in p
        )
        flat[key] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_weights(path: str, params_template: Any, strict: bool = False) -> Any:
    """Lenient weight load: skip missing keys and shape mismatches with a
    report (mirrors /root/reference/util/utils.py:358-422)."""
    archive = np.load(path if path.endswith(".npz") else path + ".npz")
    flat_template, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    loaded, skipped, missing = 0, [], []
    leaves = []
    for p, leaf in flat_template:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in p
        )
        if key not in archive:
            missing.append(key)
            leaves.append(leaf)
            continue
        value = archive[key]
        if tuple(value.shape) != tuple(leaf.shape):
            skipped.append((key, value.shape, tuple(leaf.shape)))
            leaves.append(leaf)
            continue
        leaves.append(jax.numpy.asarray(value, dtype=leaf.dtype))
        loaded += 1
    if skipped:
        for key, got, want in skipped:
            logger.warning(f"shape mismatch for {key}: ckpt {got} vs model {want}")
    if missing:
        logger.warning(f"{len(missing)} params missing from checkpoint")
    if strict and (skipped or missing):
        raise ValueError(f"strict load failed: {len(skipped)} mismatched, "
                         f"{len(missing)} missing")
    logger.info(f"loaded {loaded}/{len(flat_template)} params from {path}")
    return jax.tree_util.tree_unflatten(treedef, leaves)
