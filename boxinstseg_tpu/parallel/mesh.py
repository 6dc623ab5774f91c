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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Multi-host bring-up (reference capability: tools/dist_train.sh
    torch.distributed.launch -> here jax.distributed.initialize over
    ICI/DCN).

    Explicit args, or env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, also set by TPU pod runtimes automatically). No-op and
    returns False for single-process runs.
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    if num_processes is None and os.environ.get('JAX_NUM_PROCESSES'):
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and os.environ.get('JAX_PROCESS_ID'):
        process_id = int(os.environ['JAX_PROCESS_ID'])
    if coordinator_address is None or not num_processes \
            or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def get_data_mesh(devices=None, axis_name: str = 'data') -> Mesh:
    """Mesh over ALL devices (global across processes after
    init_distributed)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Leading-dim (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis_name: str = 'data') -> Dict:
    """Place a host batch dict onto the mesh, sharded along dim 0.

    Single-process: a plain sharded device_put. Multi-process: each process
    holds only its slice of the global batch (the loader is
    process-sharded), assembled into one global array via
    ``make_array_from_process_local_data`` — the multi-host analog of the
    reference's per-rank DataLoader shards (DistributedGroupSampler).
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh),
                                      batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
