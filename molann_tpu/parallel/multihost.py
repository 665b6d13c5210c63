"""Multi-host (DCN) support: distributed init + global batch construction.

A TPU pod slice spans hosts; each process addresses only its local chips.
The same ``('data',)`` mesh code works there — the two things that change
are (1) every process must call :func:`initialize_multihost` before first
JAX use so XLA forms one global runtime over DCN, and (2) per-host batch
shards must be assembled into GLOBAL arrays (a plain ``device_put`` of a
host array only knows local devices) — :func:`global_batch` does that via
``jax.make_array_from_process_local_data``.

The reference is strictly single-process (SURVEY.md §2.3: no
torch.distributed anywhere); this subsystem is the SURVEY §5.8 mandate.
Validated by tests/test_multihost.py: two coordinated CPU processes (4
virtual devices each) run the real training step over an 8-device global
mesh and reproduce the single-process result bit-for-bit.
"""

from __future__ import annotations

import os

import jax

from .mesh import DATA_AXIS, batch_sharding

__all__ = ["initialize_multihost", "global_batch", "process_local_slice"]


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Form the global JAX runtime across hosts (call before first JAX op).

    On cloud TPU pods all three arguments auto-detect (pass nothing). For
    manual launches (e.g. MPI, SLURM, or the CPU-based test harness) give
    ``coordinator_address="host0:port"``, ``num_processes``, and this
    process's ``process_id`` — or set the standard env vars
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``.
    """
    kwargs = {}
    ca = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if ca is not None:
        kwargs["coordinator_address"] = ca
    np_ = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if np_ is not None:
        kwargs["num_processes"] = int(np_)
    pid = process_id if process_id is not None else os.environ.get(
        "JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def global_batch(local_batch, mesh, axis: str = DATA_AXIS):
    """Assemble per-process batch shards into global mesh-sharded arrays.

    ``local_batch``: this process's frames (pytree of arrays whose leading
    dim is the LOCAL batch). The global leading dim is
    ``local * process_count`` — every process must contribute the same
    local size (the data loader's ``multiple_of`` handles that). On a
    single process this degrades to a plain sharded ``device_put``
    (identical to :func:`shard_batch`).
    """
    sharding = batch_sharding(mesh, axis)

    def put(a):
        if jax.process_count() == 1:
            return jax.device_put(a, sharding)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, a, global_shape
        )

    return jax.tree_util.tree_map(put, local_batch)


def process_local_slice(n_total: int):
    """(start, stop) of this process's contiguous shard of ``n_total``
    frames (even split; ``n_total`` must divide by ``process_count``)."""
    pc, pi = jax.process_count(), jax.process_index()
    if n_total % pc:
        raise ValueError(
            f"global batch {n_total} does not divide over {pc} processes"
        )
    per = n_total // pc
    return pi * per, (pi + 1) * per
