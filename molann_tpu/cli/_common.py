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
