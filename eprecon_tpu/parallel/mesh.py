"""Device mesh / sharding helpers.

TPU-native replacement for the reference's NCCL DDP machinery
(reference main.py:67-77, ops/comm.py:9-41): a 1-D `data` mesh over ICI
(or DCN across slices), params replicated, fragment streams sharded.
Each device carries its own scene stream + recurrent global-map state —
the exact analogue of the reference's per-rank DDP model with the custom
contiguous-block DistributedSampler (datasets/sampler.py:56-76).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def is_main_process() -> bool:
    """reference ops/comm.py:22-27 equivalent."""
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def synchronize():
    """Blocking barrier (reference ops/comm.py:29-41): a tiny all-reduce."""
    import jax.numpy as jnp

    x = jnp.ones(jax.local_device_count())
    jax.block_until_ready(
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x))


def initialize_distributed():
    """Multi-host init (reference main.py:73-75 dist.init_process_group).
    No-op on a single host; uses JAX's coordination service otherwise."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
