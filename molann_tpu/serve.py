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
                    component=None):
    """Build a jitted ``fn(x [l, n, 3]) -> cvs [l, d]`` (or
    ``(cvs, grads)`` with ``forces=True``) sharded over ``mesh``.

    ``l`` must divide by the mesh size; :func:`evaluate_trajectory`
    handles padding/trimming and streaming. ``mesh=None`` = all local
    devices on a ``('data',)`` mesh (size 1 falls back to a plain jit —
    no shard_map overhead).
    """
    if mesh is None:
        mesh = data_mesh()

    def per_shard(m, x):
        if forces:
            return fused_cv_forces(
                m, x, component=component, tile=tile, interpret=interpret,
                mode=mode, precision=precision,
            )
        return fused_model_forward(
            m, x, tile=tile, interpret=interpret, mode=mode,
            precision=precision,
        )

    if np.prod(list(mesh.shape.values())) == 1:
        return jax.jit(per_shard)

    mapped = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)) if forces else P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def _open_traj(traj):
    """-> (reader fn(start, count) -> [count, n, 3] f32, n_frames,
    n_atoms)."""
    if isinstance(traj, np.ndarray) or hasattr(traj, "shape"):
        arr = np.asarray(traj, dtype=np.float32)
        if arr.ndim == 2:  # packed [l, 3n] — keep as frames x atoms x 3
            arr = arr.reshape(arr.shape[0], -1, 3)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(f"expected [l, n, 3] frames, got {arr.shape}")
        return (lambda s, c: arr[s:s + c]), arr.shape[0], arr.shape[1]
    # path: prefer the native loader (mmap + threaded gather, any format)
    try:
        from .io.native_loader import NativeTrajLoader

        ldr = NativeTrajLoader(traj)
        n_atoms = ldr.n_atoms

        def read(s, c):
            return ldr.read_range(s, c).reshape(c, n_atoms, 3)

        return read, ldr.n_frames, n_atoms
    except Exception:
        pass
    low = str(traj).lower()
    if low.endswith(".dcd"):
        from .io.dcd import read_dcd

        frames = read_dcd(traj)[0]
    elif low.endswith(".trr"):
        from .io.xdr import read_trr

        frames = read_trr(traj)[0]
    elif low.endswith(".xtc"):
        from .io.xdr import read_xtc

        frames = read_xtc(traj)[0]
    else:
        frames = np.load(traj, mmap_mode="r")
        if frames.ndim == 2:
            frames = frames.reshape(frames.shape[0], -1, 3)
    return ((lambda s, c: np.asarray(frames[s:s + c], np.float32)),
            frames.shape[0], frames.shape[1])


def evaluate_trajectory(model, traj, *, mesh=None, batch_size=None,
                        forces=False, mode="auto", tile=None,
                        interpret=False, precision="exact",
                        component=None, cvs_out=None, grads_out=None):
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
    """
    if mesh is None:
        mesh = data_mesh()
    n_dev = int(np.prod(list(mesh.shape.values())))
    read, n_frames, n_atoms = _open_traj(traj)

    quantum = n_dev * 8
    if batch_size is None:
        batch_size = min(-(-n_frames // quantum) * quantum, 65536)
    batch_size = max(quantum, (batch_size // quantum) * quantum)

    fn = make_serving_fn(
        model, mesh, forces=forces, mode=mode, tile=tile,
        interpret=interpret, precision=precision, component=component,
    )

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
            grads_out[start:start + take] = np.asarray(g)[:take]
        else:
            y = out
        y = np.asarray(y)
        if cvs_out is None:
            cvs_out = np.empty((n_frames, y.shape[1]), np.float32)
        cvs_out[start:start + take] = y[:take]
    return (cvs_out, grads_out) if forces else cvs_out
