"""Device mesh + sharding helpers.

The reference's only training parallelism is NCCL data-parallel DDP
(reference: mmdet/utils/util_distribution.py:34-60). TPU-native equivalent:
one jit-compiled global-batch train step over a ``Mesh(('data',))`` —
XLA inserts the gradient psum; there is no separate communication layer.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_data_mesh(devices=None, axis_name: str = 'data') -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis_name: str = 'data') -> Dict:
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
