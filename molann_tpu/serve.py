"""High-level multi-device trajectory serving (Python side).

The in-process counterpart of the C++ container (native/serve_pjrt.cpp):
stream a trajectory through the fused serving kernels over ALL devices
of a data mesh, producing CV values and (optionally) coordinate
gradients for biased MD. Where the C++ container targets no-Python
engine embedding, this API targets analysis pipelines and training
loops that already live in Python:

    from molann_tpu.serve import evaluate_trajectory
    cvs, grads = evaluate_trajectory(model, "traj.xtc", forces=True)

Design: batches are padded (with their last frame) to a multiple of the
mesh size x kernel tile, `shard_map`ped over the ``('data',)`` mesh —
each device runs the fused Pallas kernel on its frame shard, no
collectives needed (frames are independent) — and trimmed on the host.
Everything compiles once per batch shape; the scheduler reuses one
fixed batch size plus a single tail batch, exactly like the container's
bucket scheduling.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .ops.fused import fused_cv_forces, fused_model_forward
from .parallel import data_mesh
from .parallel.mesh import DATA_AXIS

__all__ = ["make_serving_fn", "evaluate_trajectory"]


def make_serving_fn(model, mesh=None, *, forces=True, mode="auto",
                    tile=None, interpret=False, precision="exact",
                    component=None, c_mat=None):
    """Build a jitted ``fn(x [l, n, 3]) -> cvs [l, d]`` (or
    ``(cvs, grads)`` with ``forces=True``) sharded over ``mesh``.

    ``l`` must divide by the mesh size; :func:`evaluate_trajectory`
    handles padding/trimming and streaming. ``mesh=None`` = all local
    devices on a ``('data',)`` mesh (size 1 falls back to a plain jit —
    no shard_map overhead).

    Each shard runs the fused Pallas kernel on TPU (or anywhere under
    ``interpret=True``); on CPU/GPU backends — which cannot execute
    compiled Mosaic kernels — it falls back to the plain-XLA model +
    ``jax.grad`` path (same policy as the single-device CLI), where
    ``mode``/``tile``/``precision`` do not apply.

    ``c_mat``: chunk matrix of a blocked model's chunked coordination
    features (:func:`molann_tpu.ops.fused.model_chunk_matrix`), closed
    over here but marked as a jit operand via ``device_put`` — the
    returned fn still takes ``(model, x)``. It is replicated across the
    mesh (every shard reads the same pair table).
    """
    if mesh is None:
        mesh = data_mesh()
    if c_mat is not None:
        c_mat = jax.device_put(jnp.asarray(c_mat, jnp.bfloat16))

    use_fused = interpret or jax.default_backend() in ("tpu", "axon")
    if use_fused:
        def per_shard(m, x, c):
            if forces:
                return fused_cv_forces(
                    m, x, component=component, tile=tile,
                    interpret=interpret, mode=mode, precision=precision,
                    c_mat=c,
                )
            return fused_model_forward(
                m, x, tile=tile, interpret=interpret, mode=mode,
                precision=precision, c_mat=c,
            )
    else:
        from .train.forces import coordinate_gradients

        def per_shard(m, x, c):
            if forces:
                return m(x), coordinate_gradients(m, x, component)
            return m(x)

    if np.prod(list(mesh.shape.values())) == 1:
        jitted = jax.jit(per_shard)
        return lambda m, x: jitted(m, x, c_mat)

    mapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)) if forces else P(DATA_AXIS),
        check_vma=False,
    )
    jitted = jax.jit(mapped)
    return lambda m, x: jitted(m, x, c_mat)


def evaluate_trajectory(model, traj, *, mesh=None, batch_size=None,
                        forces=False, mode="auto", tile=None,
                        interpret=False, precision="exact",
                        component=None, cvs_out=None, grads_out=None,
                        grads_transform=None, backend="auto",
                        c_mat="auto"):
    """Stream a trajectory through the fused serving path over all mesh
    devices; returns ``cvs [n_frames, d]`` (and ``grads [n_frames, n,
    3]`` with ``forces=True``) as numpy arrays.

    ``traj``: a ``[l, n, 3]`` array, or a path to any supported format
    (.npy / .dcd / .trr / .xtc — read via the native loader when
    available). Batches are padded with their final frame up to the
    batch size, so only one tail batch pays padding (same contract as
    the C++ container); ``batch_size`` defaults to
    ``min(n_frames_rounded, 65536)`` rounded to mesh x 8 frames.

    ``cvs_out`` / ``grads_out``: optional preallocated output buffers
    (e.g. disk-backed memmaps, so trajectory-sized results never sit in
    host RAM); shapes ``[n_frames, d]`` and ``[n_frames, n, 3]``.
    ``grads_transform``: optional per-batch transform applied to each
    gradient block before it is stored (e.g. ``np.negative`` for the
    force convention — applied in-flight, so a memmapped ``grads_out``
    never needs a second whole-file pass).
    ``backend``: trajectory reader choice forwarded to
    :func:`molann_tpu.io.reader.open_frame_reader` ('auto'/'native'/
    'numpy').
    ``c_mat``: ``"auto"`` (default) resolves the chunk matrix of a
    blocked model with chunked coordination features automatically so
    condensed-phase pair tables ride as ONE device buffer instead of an
    HLO constant; pass an explicit array, or ``None`` to disable.
    """
    from .io.reader import open_frame_reader
    from .models.ann import model_dims

    if mesh is None:
        mesh = data_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))
    read, n_frames, n_atoms = open_frame_reader(traj, backend=backend)

    quantum = n_dev * 8
    if batch_size is None:
        batch_size = min(-(-n_frames // quantum) * quantum, 65536)
    batch_size = max(quantum, (batch_size // quantum) * quantum)

    if isinstance(c_mat, str) and c_mat == "auto":
        from .ops.fused import model_chunk_matrix, model_select_mode

        c_mat = (model_chunk_matrix(model)
                 if model_select_mode(model) == "blocked" else None)
    fn = make_serving_fn(
        model, mesh, forces=forces, mode=mode, tile=tile,
        interpret=interpret, precision=precision, component=component,
        c_mat=c_mat,
    )

    if cvs_out is None:
        cvs_out = np.empty((n_frames, model_dims(model)[1]), np.float32)
    if forces and grads_out is None:
        grads_out = np.empty((n_frames, n_atoms, 3), np.float32)
    for start in range(0, n_frames, batch_size):
        take = min(batch_size, n_frames - start)
        chunk = read(start, take)
        if take < batch_size:  # pad the tail with its last frame
            pad = np.broadcast_to(
                chunk[-1:], (batch_size - take, n_atoms, 3)
            )
            chunk = np.concatenate([chunk, pad])
        out = fn(model, jnp.asarray(chunk))
        if forces:
            y, g = out
            gb = np.asarray(g)[:take]
            if grads_transform is not None:
                gb = grads_transform(gb)
            grads_out[start:start + take] = gb
        else:
            y = out
        cvs_out[start:start + take] = np.asarray(y)[:take]
    return (cvs_out, grads_out) if forces else cvs_out
