"""Device-mesh helpers for data-parallel CV training.

The reference is single-process/single-device (SURVEY.md §2.3); the scaling
dimension of this workload is the *batch of trajectory frames* (parameters
are KB-scale and stay replicated). The TPU-native design is therefore a 1D
``('data',)`` mesh over all chips: frame batches shard over ICI, gradients
all-reduce with XLA collectives, and ``jax.distributed.initialize()`` + the
same code scales to multi-host (DCN) transparently.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "batch_sharding", "replicated_sharding"]

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1D ``('data',)`` mesh over the first ``n_devices`` devices
    (default: all available)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (frame-batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (for model parameters — KB-scale here)."""
    return NamedSharding(mesh, P())
