"""Data parallelism over frame batches — shard_map + psum on ICI.

Two interchangeable mechanisms (both tested on a virtual 8-device CPU mesh,
both production paths on a TPU pod slice):

- :func:`make_data_parallel_fn` — explicit SPMD via ``jax.shard_map``: the
  wrapped per-shard function sees its local slice of the batch and reduces
  results/gradients with ``jax.lax.psum`` / ``pmean`` over the ``'data'``
  axis. This is the kernel-control path (collectives ride ICI).
- GSPMD via ``jax.jit`` with ``in_shardings`` (used by
  :mod:`molann_tpu.train.loop`): annotate the batch as sharded and the model
  as replicated; XLA inserts the same all-reduces automatically.
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, batch_sharding

__all__ = ["make_data_parallel_fn", "shard_batch", "psum_mean_grads"]


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place a host array onto the mesh, sharded along its leading dim.

    The leading dimension must divide evenly by the mesh size (static
    shapes — pad or crop upstream; the data loader handles this).
    """
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), batch
    )


def psum_mean_grads(grads, axis: str = DATA_AXIS):
    """Mean-reduce gradients over the data axis (inside shard_map)."""
    return jax.tree_util.tree_map(
        lambda g: jax.lax.pmean(g, axis_name=axis), grads
    )


def make_data_parallel_fn(per_shard_fn, mesh: Mesh, *,
                          axis: str = DATA_AXIS,
                          reduce_output: str | None = "mean"):
    """Wrap ``per_shard_fn(model, batch) -> value`` into an SPMD function.

    The returned function takes the same ``(model, batch)`` but executes one
    program per device via ``shard_map``: ``batch`` is split on its leading
    dim over ``axis``, ``model`` is replicated (parameters are KB-scale —
    sharding them would only add collectives), and the scalar/array output
    is ``psum``/``pmean``-reduced across devices (``reduce_output``:
    ``'mean'``, ``'sum'`` or ``None`` to keep per-shard outputs stacked).
    """
    model_spec = P()
    out_spec = P() if reduce_output else P(axis)

    def spmd_fn(model, batch):
        value = per_shard_fn(model, batch)
        if reduce_output == "mean":
            value = jax.tree_util.tree_map(
                lambda v: jax.lax.pmean(v, axis_name=axis), value
            )
        elif reduce_output == "sum":
            value = jax.tree_util.tree_map(
                lambda v: jax.lax.psum(v, axis_name=axis), value
            )
        return value

    mapped = jax.shard_map(
        spmd_fn,
        mesh=mesh,
        in_specs=(model_spec, P(axis)),
        out_specs=out_spec,
        check_vma=False,
    )
    return jax.jit(mapped)
