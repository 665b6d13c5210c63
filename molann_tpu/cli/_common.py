"""Shared plumbing of the CLI command modules: model/trajectory
loading + validation, the grid grammar, and the per-extension trajectory
writer dispatch."""

from __future__ import annotations

import numpy as np

def _load_model(path):
    from ..io import load_model

    return load_model(path)


def _parse_grid(gridspec, d, *, subject=None):
    """Parse a ``lo:hi:n[,lo:hi:n...]`` grid option into ``d`` ``(lo, hi,
    n)`` triples, broadcasting a single spec to all dimensions — the one
    grammar shared by the fes/mep/msm/pmf subcommands (callers decide
    whether ``n`` means grid points or bins)."""
    specs = gridspec.split(",")
    if len(specs) == 1 and d > 1:
        specs = specs * d
    if len(specs) != d:
        prefix = f"{subject}; " if subject else ""
        raise SystemExit(f"error: {prefix}--grid needs 1 or {d} "
                         "lo:hi:n specs")
    out = []
    for spec in specs:
        try:
            lo, hi, n = spec.split(":")
            out.append((float(lo), float(hi), int(n)))
        except ValueError:
            raise SystemExit(f"error: bad --grid spec {spec!r} "
                             "(want lo:hi:n)")
    return out


def _open_traj_writer(out, *, xtc_precision=1000.0, with_box=False):
    """Incremental writer (context manager with ``append([c, n, 3])``) for
    ``.dcd``/``.trr``/``.xtc``/``.nc`` outputs, or None for ``.npy``
    paths — the
    single home of the per-extension writer dispatch ('convert',
    'sample' and 'unwrap' all write trajectories). With ``with_box``
    the returned writer's ``append`` takes ``(frames, box=[k, 3, 3])``
    regardless of format (DCD cell conversion handled here)."""
    low = str(out).lower()
    if low.endswith(".dcd"):
        from ..io.dcd import DCDWriter

        if with_box:
            from ..pbc import box_to_dcd_cell

            class _DCDBoxWriter(DCDWriter):
                def append(self, frames, box=None):
                    super().append(frames, cell=box_to_dcd_cell(box))

            return _DCDBoxWriter(out, has_cell=True)
        return DCDWriter(out)
    if low.endswith(".trr"):
        from ..io.xdr import TRRWriter

        return TRRWriter(out)
    if low.endswith(".xtc"):
        from ..io.xdr import XTCWriter

        return XTCWriter(out, precision=xtc_precision)
    if low.endswith(".nc") or low.endswith(".ncdf"):
        from ..io.netcdf import NetCDFWriter

        return NetCDFWriter(out, with_box=with_box)
    return None


def _model_dims(model):
    """(n_input_atoms, d_out) of a saved model."""
    from ..models.ann import model_dims

    return model_dims(model)


def _load_ref_positions(path, traj, n_atoms):
    """Reference coordinates ``[n_atoms, 3]`` for neighbor culling: an
    explicit ``--cull-ref`` file (.npy array, or any topology format the
    front-end reads — PDB/GRO/XYZ), else the trajectory's first frame."""
    if path:
        low = str(path).lower()
        if low.endswith(".npy"):
            ref = np.load(path)
            ref = ref[0] if ref.ndim == 3 else ref
        else:
            from ..topology import Universe

            ref = Universe(path).atoms.positions
    else:
        from ..io.reader import open_frame_reader

        read, n_frames, na = open_frame_reader(traj)
        if n_frames < 1:
            raise SystemExit(f"error: {traj} has no frames to cull against")
        ref = read(0, 1)[0]
    ref = np.asarray(ref, dtype=np.float32)
    if ref.shape != (n_atoms, 3):
        raise SystemExit(
            f"error: cull reference has shape {ref.shape}; the model "
            f"takes [{n_atoms}, 3]")
    return ref


def _apply_cull(args, model, traj=None):
    """Apply the ``--cull`` CLI flags to a loaded model and resolve the
    chunk-matrix jit-boundary operand.

    Returns ``(model, c_mat, report)``: the (possibly culled) model, the
    device-resident chunk matrix to pass as ``c_mat=`` into the blocked
    fused entry points (None when nothing is chunked — e.g. after a cull
    shrank every pair table to residency), and the
    :class:`~molann_tpu.ops.neighbor.CullReport` (None without
    ``--cull``). The c_mat routing is automatic for every blocked-mode
    model: without it the pair table is baked into each executable as an
    HLO constant (multi-GB at condensed-phase pair counts) and
    re-uploaded per eager call."""
    report = None
    if getattr(args, "cull", False):
        from ..ops.neighbor import cull_model

        n_atoms = _model_dims(model)[0]
        ref = _load_ref_positions(getattr(args, "cull_ref", None),
                                  traj if traj is not None
                                  else getattr(args, "traj", None), n_atoms)
        model, report = cull_model(
            model, ref, tol=getattr(args, "cull_tol", 1e-6),
            skin=getattr(args, "skin", 1.0))
        print(report)
    c_mat = None
    from ..ops.fused import model_chunk_matrix, model_select_mode

    if model_select_mode(model) == "blocked":
        C = model_chunk_matrix(model)
        if C is not None:
            import jax

            c_mat = jax.device_put(C)
    return model, c_mat, report


def add_cull_args(sp):
    """The shared ``--cull`` option group (evaluate/forces/export/sample)."""
    sp.add_argument("--cull", action="store_true",
                    help="cull coordination pair tables to r_cut+skin at "
                         "the reference frame (exact for d_max-truncated "
                         "features; see molann_tpu.ops.neighbor)")
    sp.add_argument("--cull-ref", default=None, metavar="FILE",
                    help="reference coordinates for --cull (.npy or a "
                         "topology file; default: the trajectory's first "
                         "frame)")
    sp.add_argument("--skin", type=float, default=1.0,
                    help="cull skin: the result is valid while no atom "
                         "moves more than skin/2 from the reference "
                         "(default 1.0)")
    sp.add_argument("--cull-tol", type=float, default=1e-6,
                    help="per-pair switching tolerance defining r_cut for "
                         "features without d_max (default 1e-6)")


def _traj_dims(path):
    """(n_frames, floats_per_frame) of a .npy/.dcd/.trr/.xtc/.nc trajectory."""
    from ..io.reader import open_frame_reader

    try:
        _, n_frames, n_atoms = open_frame_reader(path)
    except ValueError as e:
        raise SystemExit(f"error: {e}")
    return n_frames, 3 * n_atoms


def _check_traj(path, n_atoms):
    """Validate trajectory shape against the model (explicit errors — the
    layer-level asserts vanish under ``python -O``)."""
    n_frames, fpf = _traj_dims(path)
    if fpf != 3 * n_atoms:
        raise SystemExit(
            f"error: trajectory {path} has {fpf // 3} atoms per frame; the "
            f"model takes {n_atoms}"
        )
    return n_frames
