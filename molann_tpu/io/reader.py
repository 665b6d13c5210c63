"""Unified trajectory reading: one dispatch for every supported input.

Three call sites used to carry near-identical copies of the "native
loader preferred, pure-python per-extension fallback" logic (the CLI's
convert/evaluate paths and the mesh serving module); this is now the
single home. The reference has no trajectory IO at all (SURVEY.md §2.3
— its forward takes an in-memory tensor); trajectory formats exist here
because that is how MD users' frames arrive.
"""

from __future__ import annotations

import numpy as np

__all__ = ["open_frame_reader", "read_traj_boxes"]


def read_traj_boxes(traj):
    """Per-frame box matrices of a trajectory PATH without decoding any
    coordinates: ``-> [n_frames, 3, 3] float32 or None`` (None for
    formats/files that carry no cell — .npy, cell-less DCD, box-less
    TRR, cell-less Amber .nc; an all-zero XTC box also counts as none).
    The light companion
    to :func:`open_frame_reader` — 'convert' streams coordinates chunk
    by chunk while the boxes ride this one cheap header scan."""
    low = str(traj).lower()
    if low.endswith(".xtc"):
        from .xdr import scan_xtc_boxes

        boxes = scan_xtc_boxes(traj)
        return None if not boxes.size or not boxes.any() else boxes
    if low.endswith(".trr"):
        from .xdr import scan_trr_boxes

        return scan_trr_boxes(traj)
    if low.endswith(".nc") or low.endswith(".ncdf"):
        from .netcdf import scan_netcdf_boxes

        boxes = scan_netcdf_boxes(traj)
        if boxes is None or not boxes.size or not boxes.any():
            return None  # all-zero cells count as "no box", like XTC
        return boxes
    if low.endswith(".dcd"):
        from .dcd import scan_dcd_cells

        cells = scan_dcd_cells(traj)
        if cells is None or not len(cells):
            return None
        from ..pbc import dcd_cell_to_box

        return dcd_cell_to_box(cells)
    return None


def _with_close(read, closer=None):
    """Attach a ``close`` attribute to a read callable (no-op when the
    underlying source holds no OS resources)."""
    read.close = closer if closer is not None else (lambda: None)
    return read


def open_frame_reader(traj, *, backend="auto"):
    """-> ``(read, n_frames, n_atoms)`` with
    ``read(start, count) -> [count, n_atoms, 3] float32``.

    Every returned ``read`` carries a ``read.close()`` attribute that
    releases any fd/mmap the reader holds (a no-op for in-memory
    arrays). Long-lived processes opening many trajectories (serving)
    should call it rather than rely on GC; a ``weakref.finalize``
    backstop closes NetCDF readers at collection time regardless.

    ``traj``: an in-memory ``[l, n, 3]`` (or packed ``[l, 3n]``) array,
    or a path to ``.npy`` / ``.dcd`` / ``.trr`` / ``.xtc`` /
    ``.nc`` (Amber NetCDF). Paths prefer the native loader (mmap +
    threaded gather; .nc is python-only); pure-python decoders keep
    everything working without a compiler. ``.npy`` and ``.nc`` files
    are memory-mapped, so opening is cheap regardless of size.
    ``backend``: 'auto' (native loader preferred), 'native' (required —
    raises if it cannot open), or 'numpy' (pure-python decoders only,
    the escape hatch for a broken native build).
    """
    if backend not in ("auto", "native", "numpy"):
        raise ValueError(f"backend must be auto/native/numpy, "
                         f"got {backend!r}")
    if isinstance(traj, np.ndarray) or hasattr(traj, "shape"):
        arr = np.asarray(traj, dtype=np.float32)
        if arr.ndim == 2:  # packed [l, 3n]
            arr = arr.reshape(arr.shape[0], -1, 3)
        if arr.ndim != 3 or arr.shape[-1] != 3:
            raise ValueError(f"expected [l, n, 3] frames, got {arr.shape}")
        return (
            _with_close(lambda s, c: arr[s : s + c]),
            arr.shape[0],
            arr.shape[1],
        )

    if backend in ("auto", "native"):
        try:
            from .native_loader import NativeTrajLoader

            ldr = NativeTrajLoader(traj)
            n_atoms = ldr.floats_per_frame // 3

            def read(s, c):
                return ldr.read_range(s, c).reshape(c, n_atoms, 3)

            return (
                _with_close(read, getattr(ldr, "close", None)),
                ldr.n_frames,
                n_atoms,
            )
        except Exception:
            if backend == "native":
                raise

    low = str(traj).lower()
    if low.endswith(".nc") or low.endswith(".ncdf"):
        from .netcdf import NetCDFReader

        import weakref

        r = NetCDFReader(traj)  # mmap-backed: lazy random access

        def read(s, c, _r=r):
            return _r.read(s, c)

        # Deterministic close for callers that use it; finalize backstop
        # so a dropped callable still releases the fd/mmap at GC.
        weakref.finalize(read, r.close)
        return _with_close(read, r.close), r.n_frames, r.n_atoms
    if low.endswith(".dcd"):
        from .dcd import read_dcd

        frames = read_dcd(traj)[0]
    elif low.endswith(".trr"):
        from .xdr import read_trr

        frames = read_trr(traj)[0]
    elif low.endswith(".xtc"):
        from .xdr import read_xtc

        frames = read_xtc(traj)[0]
    else:
        frames = np.load(traj, mmap_mode="r")
        if frames.ndim == 2:
            frames = frames.reshape(frames.shape[0], -1, 3)
        if frames.ndim != 3 or frames.shape[-1] != 3:
            raise ValueError(
                f"trajectory {traj} has shape {np.shape(frames)}; expected "
                "[n_frames, n_atoms, 3] or packed [n_frames, 3n]"
            )
    return (
        _with_close(lambda s, c: np.asarray(frames[s : s + c], np.float32)),
        frames.shape[0],
        frames.shape[1],
    )
