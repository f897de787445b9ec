"""Device mesh + sharding helpers.

The reference parallelizes with DDP over NCCL (SURVEY.md §2.5 /
/root/reference/main.py:156-158). The TPU-native equivalent is a 1-D ``data``
mesh: batches shard over it, parameters replicate, and every cross-replica
reduction (loss normalizer num_boxes, metric means) becomes an XLA collective
inserted automatically when jit sees the shardings — no explicit all_reduce
calls anywhere in model code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host pytree so its leading dim is sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
