"""Pure-Python DCD support: a writer (for conversion/tests) and a reader
(fallback oracle for the native loader).

DCD is the CHARMM/NAMD/X-PLOR binary trajectory format: Fortran
sequential-access records (``[int32 len][payload][int32 len]``), a 84-byte
``CORD`` control record, a title record, a NATOM record, then per frame an
optional unit-cell record (6 doubles, CHARMM) and X/Y/Z coordinate planes
of NATOM float32 each. The native loader (native/traj_loader.cpp) mmaps
and gathers these at C speed; this module is the slow-but-dependency-free
counterpart. Fixed-atom (NAMNF != 0) and big-endian files are rejected,
matching the native reader.

The reference has no trajectory IO at all (its forward takes an in-memory
tensor); DCD support exists because MD users' trajectories arrive in it.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["write_dcd", "read_dcd"]


def _rec(payload: bytes) -> bytes:
    n = struct.pack("<i", len(payload))
    return n + payload + n


def write_dcd(path, frames, *, title="written by molann_tpu", cell=None):
    """Write ``[n_frames, n_atoms, 3]`` float32 frames as a CHARMM DCD.

    cell: optional ``[n_frames, 6]`` unit-cell doubles (CHARMM convention);
    when given the CHARMM unit-cell flag is set and one cell record is
    written per frame.
    """
    arr = np.ascontiguousarray(frames, dtype=np.float32)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        raise ValueError(f"expected [n_frames, n_atoms, 3], got {arr.shape}")
    n_frames, n_atoms = arr.shape[0], arr.shape[1]
    if cell is not None:
        cell = np.ascontiguousarray(cell, dtype=np.float64)
        if cell.shape != (n_frames, 6):
            raise ValueError(f"cell must be [n_frames, 6], got {cell.shape}")

    icntrl = [0] * 20
    icntrl[0] = n_frames          # NSET
    icntrl[1] = 1                 # ISTART
    icntrl[2] = 1                 # NSAVC
    icntrl[3] = n_frames          # NSTEP
    icntrl[10] = 1 if cell is not None else 0  # unit-cell flag
    icntrl[19] = 24               # CHARMM version
    header = b"CORD" + struct.pack("<20i", *icntrl)
    assert len(header) == 84

    tpad = title.encode()[:80].ljust(80)
    title_rec = struct.pack("<i", 1) + tpad

    with open(path, "wb") as fh:
        fh.write(_rec(header))
        fh.write(_rec(title_rec))
        fh.write(_rec(struct.pack("<i", n_atoms)))
        for f in range(n_frames):
            if cell is not None:
                fh.write(_rec(cell[f].tobytes()))
            for c in range(3):
                fh.write(_rec(np.ascontiguousarray(arr[f, :, c]).tobytes()))
    return path


def read_dcd(path):
    """Read a (little-endian, no-fixed-atoms) DCD: returns
    ``(frames [n_frames, n_atoms, 3] float32, cell or None)``."""
    with open(path, "rb") as fh:
        data = fh.read()

    def rec(off):
        (n,) = struct.unpack_from("<i", data, off)
        payload = data[off + 4 : off + 4 + n]
        (n2,) = struct.unpack_from("<i", data, off + 4 + n)
        if n2 != n:
            raise ValueError(f"corrupt record at offset {off}")
        return payload, off + 8 + n

    header, off = rec(0)
    if header[:4] != b"CORD":
        raise ValueError("not a coordinate DCD")
    icntrl = struct.unpack("<20i", header[4:84])
    if icntrl[8] != 0:
        raise ValueError("fixed-atom DCD files are not supported")
    has_cell = icntrl[19] != 0 and icntrl[10] != 0
    _, off = rec(off)  # title
    natoms_rec, off = rec(off)
    (n_atoms,) = struct.unpack("<i", natoms_rec)

    frames, cells = [], []
    while off + 8 <= len(data):
        try:
            if has_cell:
                c, off = rec(off)
                cells.append(np.frombuffer(c, dtype="<f8"))
            planes = []
            for _ in range(3):
                p, off = rec(off)
                planes.append(np.frombuffer(p, dtype="<f4"))
            frames.append(np.stack(planes, axis=1))
        except (ValueError, struct.error):
            break
    out = np.asarray(frames, dtype=np.float32)
    return out, (np.asarray(cells) if has_cell else None)
