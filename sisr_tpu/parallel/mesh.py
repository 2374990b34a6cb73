"""Device mesh + sharding helpers.

The reference app is single-device; its bundled toolkits scale with
DDP/NCCL (BasicSR basicsr/utils/dist_util.py:10-57).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with named axes and compiler-emitted
collectives: the train step is jit-compiled with batch inputs sharded on the
``data`` axis and parameters replicated — XLA inserts the gradient
all-reduce over ICI (no NCCL analog needed).

Axes:
  data   — data parallel (batch dimension)
  tile   — spatial-shard inference (image tiles across chips)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host NHWC batch (or pytree of them) sharded on the batch dim."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (parameters / optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host entry: call once per process before creating meshes.

    Counterpart of torch.distributed.init_process_group(backend='nccl')
    (reference BasicSR dist_util.py:10-25).  With no arguments
    jax.distributed discovers the TPU pod topology from the environment; the
    explicit (coordinator, num_processes, process_id) form serves manual
    launches — including the 2-process CPU harness
    (tests/test_multiprocess.py) that exercises this path hostside with
    gloo collectives, the analog of BasicSR dist_util.py:28-57's
    mp.spawn launcher.
    """
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def process_zero() -> bool:
    """Rank-0 guard for I/O (the reference's @master_only decorator analog)."""
    return jax.process_index() == 0
