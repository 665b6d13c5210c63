"""Periodic-boundary-condition utilities: wrap, minimum image, and
making molecules whole.

The reference library (zwpku/molann) computes features from raw
Cartesian coordinates and silently assumes molecules are whole
(reference molann/ann.py:288-356 — plain coordinate differences, no box
anywhere). Real production trajectories (GROMACS XTC/TRR, CHARMM DCD)
come *wrapped* into the periodic cell, so a bond crossing the boundary
spans ~a box length and every feature built from it is garbage; GROMACS
users run ``trjconv -pbc whole`` before any analysis. This module makes
that preprocessing a native capability, so trajectories go straight from
the codecs (:mod:`molann_tpu.io.xdr`, which return per-frame box
matrices) into the feature/serving path:

- :func:`minimum_image` / :func:`wrap` — the core triclinic lattice
  reductions, batched ``jnp`` (jit/vmap/grad-friendly).
- :func:`guess_bonds` — covalent-radius bond detection on the topology's
  reference coordinates (PDB positions are whole).
- :func:`make_whole` — per-frame molecule reassembly: every atom is
  placed at the minimum image relative to its bond-tree parent (one
  vectorized update per tree depth level, compiled; equivalent to
  ``trjconv -pbc whole``).
- :func:`unwrap_time` — temporal continuity unwrap (``lax.scan``):
  removes box jumps between consecutive frames so diffusing molecules
  trace continuous paths (``trjconv -pbc nojump``).

Box convention: GROMACS row matrices — ``box[i]`` is the i-th lattice
vector, lower-triangular (``a = (ax,0,0)``, ``b = (bx,by,0)``,
``c = (cx,cy,cz)``), the exact layout the XTC/TRR codecs return. The
row-by-row reduction used here is GROMACS's own nearest-image scheme: it
is the exact minimum image for orthorhombic cells and for any
displacement shorter than half the inscribed-sphere diameter of a
reduced triclinic cell (i.e. every physical bond/contact); only
pathological near-half-box displacements in extreme skew can pick a
non-minimal image, same as GROMACS.

After :func:`make_whole`, every intramolecular feature (bond / angle /
dihedral) is image-independent, and alignment/position features behave
exactly as on unwrapped data — no kernel changes needed, the fused
Pallas path consumes the repaired coordinates as-is.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

__all__ = [
    "wrap",
    "minimum_image",
    "unwrap_time",
    "guess_bonds",
    "bond_tree_levels",
    "make_whole",
    "dcd_cell_to_box",
    "box_to_dcd_cell",
]

# Covalent radii (Angstrom), Cordero et al., Dalton Trans. 2008 — the
# standard table (same source MDAnalysis uses for bond guessing).
_COVALENT_RADII = {
    "H": 0.31, "HE": 0.28, "LI": 1.28, "BE": 0.96, "B": 0.84, "C": 0.76,
    "N": 0.71, "O": 0.66, "F": 0.57, "NE": 0.58, "NA": 1.66, "MG": 1.41,
    "AL": 1.21, "SI": 1.11, "P": 1.07, "S": 1.05, "CL": 1.02, "AR": 1.06,
    "K": 2.03, "CA": 1.76, "MN": 1.39, "FE": 1.32, "CO": 1.26, "NI": 1.24,
    "CU": 1.32, "ZN": 1.22, "BR": 1.20, "I": 1.39,
}


def _check_box_arg(box):
    box = jnp.asarray(box, jnp.float32)
    if box.shape[-2:] != (3, 3):
        raise ValueError(f"box must be [..., 3, 3], got {box.shape}")
    return box


def minimum_image(dx, box):
    """Nearest-image displacement(s) under a (possibly triclinic) box.

    dx: ``[..., 3]`` displacement vectors. box: ``[3, 3]`` lattice
    row-matrix, or ``[l, 3, 3]`` with ``dx = [l, ..., 3]`` for per-frame
    boxes. Lower-triangular GROMACS convention (see module docstring).
    Returns the reduced displacements, same shape as ``dx``.

    Example:
        >>> import jax.numpy as jnp
        >>> box = jnp.diag(jnp.array([10.0, 10.0, 10.0]))
        >>> minimum_image(jnp.array([9.0, 0.2, -9.5]), box).tolist()
        [-1.0, 0.20000000298023224, 0.5]
    """
    dx = jnp.asarray(dx, jnp.float32)
    box = _check_box_arg(box)
    if box.ndim == 3:  # per-frame boxes: broadcast over mid axes of dx
        mid = dx.ndim - 2  # dx [l, <mid axes>, 3]
        if mid < 0 or dx.shape[0] != box.shape[0]:
            raise ValueError(
                f"per-frame boxes {box.shape} need dx [l, ..., 3], "
                f"got {dx.shape}"
            )
        bshape = (box.shape[0],) + (1,) * mid + (3,)
        rows = [box[:, i].reshape(bshape) for i in range(3)]
        diag = [box[:, i, i].reshape(bshape[:-1]) for i in range(3)]
    else:
        rows = [box[i] for i in range(3)]
        diag = [box[i, i] for i in range(3)]
    # row-by-row reduction, c then b then a: each row only has components
    # on its own and earlier axes (lower-triangular), so later axes are
    # finalized first — the GROMACS put_atoms_in_triclinic_unitcell walk
    for i in (2, 1, 0):
        shift = jnp.round(dx[..., i] / diag[i])
        dx = dx - shift[..., None] * rows[i]
    return dx


def wrap(x, box):
    """Wrap coordinates into the primary cell.

    x: ``[..., 3]``; box: ``[3, 3]`` or ``[l, 3, 3]`` (with
    ``x = [l, ..., 3]``), lower-triangular (module docstring). Row-by-row
    floor reduction into the GROMACS brick cell (every Cartesian
    component lands in ``[0, box[i][i])`` — for orthorhombic boxes the
    usual ``[0, L)`` wrap; for triclinic, a region congruent to the
    cell, exactly GROMACS ``put_atoms_in_triclinic_unitcell``).
    Deliberately NO matmul: coordinates through a reduced-precision
    (bf16-default) matmul would be destroyed, and the lattice shifts
    here are exact f32 multiples instead.

    Example:
        >>> import jax.numpy as jnp
        >>> box = jnp.diag(jnp.array([4.0, 5.0, 6.0]))
        >>> wrap(jnp.array([-1.0, 5.5, 17.0]), box).tolist()
        [3.0, 0.5, 5.0]
    """
    x = jnp.asarray(x, jnp.float32)
    box = _check_box_arg(box)
    if box.ndim == 3:
        mid = x.ndim - 2  # x [l, <mid axes>, 3]
        if mid < 0 or x.shape[0] != box.shape[0]:
            raise ValueError(
                f"per-frame boxes {box.shape} need x [l, ..., 3], "
                f"got {x.shape}"
            )
        bshape = (box.shape[0],) + (1,) * mid + (3,)
        rows = [box[:, i].reshape(bshape) for i in range(3)]
        diag = [box[:, i, i].reshape(bshape[:-1]) for i in range(3)]
    else:
        rows = [box[i] for i in range(3)]
        diag = [box[i, i] for i in range(3)]
    # later axes first (lower-triangular: row i only touches axes <= i),
    # so each floor sees its axis already final
    for i in (2, 1, 0):
        shift = jnp.floor(x[..., i] / diag[i])
        x = x - shift[..., None] * rows[i]
    return x


def unwrap_time(frames, box):
    """Temporal continuity unwrap (``trjconv -pbc nojump``).

    Each frame's atoms are moved to the periodic image nearest their own
    position in the PREVIOUS (already unwrapped) frame, so trajectories
    of diffusing molecules become continuous paths instead of box jumps.
    Frame 0 is kept as-is — run :func:`make_whole` on it (or the whole
    trajectory) first if molecules may start broken. Valid when no atom
    moves more than half a box between saved frames (any normal output
    interval).

    frames: ``[l, n, 3]``; box: ``[3, 3]`` or ``[l, 3, 3]``. One
    compiled ``lax.scan``; returns ``[l, n, 3]``.
    """
    frames = jnp.asarray(frames, jnp.float32)
    if frames.ndim != 3:
        raise ValueError(f"frames must be [l, n, 3], got {frames.shape}")
    box = _check_box_arg(box)
    boxes = (jnp.broadcast_to(box, (frames.shape[0], 3, 3))
             if box.ndim == 2 else box)
    if boxes.shape[0] != frames.shape[0]:
        raise ValueError(
            f"{boxes.shape[0]} boxes for {frames.shape[0]} frames"
        )

    def step(prev, fb):
        xt, bt = fb
        cur = prev + minimum_image(xt - prev, bt)
        return cur, cur

    _, out = lax.scan(step, frames[0], (frames[1:], boxes[1:]))
    return jnp.concatenate([frames[:1], out], axis=0)


def _radii_for(universe):
    from .topology import guess_atom_type

    radii = []
    for atom in universe.atoms:
        t = getattr(atom, "type", "") or guess_atom_type(
            getattr(atom, "name", ""))
        radii.append(_COVALENT_RADII.get(str(t).upper(), 0.0))
    return np.asarray(radii, np.float64)


def guess_bonds(universe, *, tolerance=0.45):
    """Covalent bonds from the topology's reference coordinates.

    Two atoms are bonded when their reference distance is below
    ``r_cov(i) + r_cov(j) + tolerance`` (Angstrom; Cordero covalent
    radii). The PDB's coordinates must be whole — PDB files are.
    Unknown elements get radius 0 and only bond within ``tolerance``.
    Returns ``[n_bonds, 2]`` 0-based int64 pairs (i < j), lexicographic.

    Example (alanine dipeptide has 21 covalent bonds):
        >>> from molann_tpu.systems import alanine_universe
        >>> len(guess_bonds(alanine_universe()))
        21
    """
    pos = np.asarray(universe.atoms.positions, np.float64)
    radii = _radii_for(universe)
    n = pos.shape[0]
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    cut = radii[:, None] + radii[None, :] + float(tolerance)
    adj = (d < cut) & (d > 1e-3)
    i, j = np.nonzero(np.triu(adj, 1))
    return np.stack([i, j], axis=1).astype(np.int64)


def bond_tree_levels(n_atoms, bonds):
    """BFS spanning forest of the bond graph as depth levels.

    Returns a list of ``(children [k], parents [k])`` int arrays: level
    ``d`` holds every atom first reached at BFS depth ``d+1`` together
    with the atom it was reached from. Applying levels in order visits
    each atom after its parent — the static schedule :func:`make_whole`
    compiles. Isolated atoms (ions, single waters' O) appear in no level
    and are left where they are.
    """
    bonds = np.asarray(bonds, np.int64).reshape(-1, 2)
    if bonds.size and (bonds.min() < 0 or bonds.max() >= n_atoms):
        raise ValueError(f"bond indices outside [0, {n_atoms})")
    neigh = [[] for _ in range(n_atoms)]
    for a, b in bonds:
        neigh[int(a)].append(int(b))
        neigh[int(b)].append(int(a))
    seen = np.zeros(n_atoms, bool)
    levels = []
    for root in range(n_atoms):
        if seen[root]:
            continue
        seen[root] = True
        frontier = [root]
        depth = 0
        while frontier:
            nxt, parents = [], []
            for p in frontier:
                for c in neigh[p]:
                    if not seen[c]:
                        seen[c] = True
                        nxt.append(c)
                        parents.append(p)
            if nxt:
                if len(levels) <= depth:
                    levels.append(([], []))
                levels[depth][0].extend(nxt)
                levels[depth][1].extend(parents)
            frontier = nxt
            depth += 1
    return [
        (np.asarray(c, np.int64), np.asarray(p, np.int64))
        for c, p in levels
    ]


def make_whole(frames, box, *, bonds=None, universe=None, levels=None):
    """Reassemble molecules broken across the periodic boundary
    (``trjconv -pbc whole``).

    Every atom is placed at the minimum image relative to its parent in
    a BFS spanning tree of the bond graph — one vectorized
    minimum-image update per tree depth, all inside ``jit``. Provide
    connectivity as ``bonds [nb, 2]``, a ``universe`` (bonds guessed via
    :func:`guess_bonds`), or precomputed ``levels``
    (:func:`bond_tree_levels` — cheapest when calling repeatedly).

    frames: ``[l, n, 3]`` or ``[n, 3]``; box: ``[3, 3]`` or
    ``[l, 3, 3]``. Returns the repaired coordinates, same shape.
    """
    frames = jnp.asarray(frames, jnp.float32)
    single = frames.ndim == 2
    if single:
        frames = frames[None]
    if frames.ndim != 3:
        raise ValueError(f"frames must be [l, n, 3], got {frames.shape}")
    n = frames.shape[1]
    if levels is None:
        if bonds is None:
            if universe is None:
                raise ValueError(
                    "make_whole needs bonds=, universe=, or levels="
                )
            bonds = guess_bonds(universe)
        levels = bond_tree_levels(n, bonds)
    box = _check_box_arg(box)
    x = frames
    for children, parents in levels:
        c = jnp.asarray(children)
        p = jnp.asarray(parents)
        dx = minimum_image(x[:, c] - x[:, p], box)
        x = x.at[:, c].set(x[:, p] + dx)
    return x[0] if single else x


def dcd_cell_to_box(cell):
    """CHARMM DCD unit-cell records -> GROMACS-style lower-triangular
    box matrices.

    cell: ``[l, 6]`` (or ``[6]``) records as stored in DCD frames:
    ``(A, gamma', B, beta', alpha', C)`` where the angle slots hold
    either cosines (CHARMM >= c24, values in [-1, 1]) or degrees —
    auto-detected per record, like MDAnalysis. Returns ``[l, 3, 3]``
    (or ``[3, 3]``) float32 box matrices usable with every function in
    this module.
    """
    cell = np.asarray(cell, np.float64)
    single = cell.ndim == 1
    cells = cell[None] if single else cell
    if cells.ndim != 2 or cells.shape[1] != 6:
        raise ValueError(f"cell must be [l, 6], got {cell.shape}")
    a, g_, b, b_, a_, c = (cells[:, i] for i in range(6))
    angles = np.stack([a_, b_, g_], axis=1)  # alpha, beta, gamma
    is_cos = (np.abs(angles) <= 1.0).all(axis=1)
    rad = np.where(is_cos[:, None], np.arccos(np.clip(angles, -1, 1)),
                   np.deg2rad(angles))
    ca, cb, cg = np.cos(rad[:, 0]), np.cos(rad[:, 1]), np.cos(rad[:, 2])
    sg = np.sin(rad[:, 2])
    out = np.zeros((cells.shape[0], 3, 3))
    out[:, 0, 0] = a
    out[:, 1, 0] = b * cg
    out[:, 1, 1] = b * sg
    out[:, 2, 0] = c * cb
    cy = (ca - cb * cg) / np.where(sg == 0, 1.0, sg)
    out[:, 2, 1] = c * cy
    out[:, 2, 2] = c * np.sqrt(np.maximum(1.0 - cb**2 - cy**2, 0.0))
    out = out.astype(np.float32)
    return out[0] if single else out


def box_to_dcd_cell(box):
    """GROMACS-style lower-triangular box matrices -> CHARMM DCD
    unit-cell records (inverse of :func:`dcd_cell_to_box`).

    box: ``[l, 3, 3]`` (or ``[3, 3]``) lower-triangular matrices.
    Returns ``[l, 6]`` (or ``[6]``) float64 records in the on-disk
    order ``(A, gamma', B, beta', alpha', C)`` with the angle slots
    holding cosines (the CHARMM >= c24 convention
    :func:`dcd_cell_to_box` auto-detects).
    """
    box = np.asarray(box, np.float64)
    single = box.ndim == 2
    boxes = box[None] if single else box
    if boxes.ndim != 3 or boxes.shape[1:] != (3, 3):
        raise ValueError(f"box must be [l, 3, 3], got {box.shape}")
    a = np.linalg.norm(boxes[:, 0], axis=1)
    b = np.linalg.norm(boxes[:, 1], axis=1)
    c = np.linalg.norm(boxes[:, 2], axis=1)
    safe = lambda x: np.where(x == 0, 1.0, x)  # noqa: E731 — degenerate
    # rows (zero box) produce cos=0, matching the zero record GROMACS
    # writes for "no cell"
    cg = np.einsum("li,li->l", boxes[:, 0], boxes[:, 1]) / safe(a * b)
    cb = np.einsum("li,li->l", boxes[:, 0], boxes[:, 2]) / safe(a * c)
    ca = np.einsum("li,li->l", boxes[:, 1], boxes[:, 2]) / safe(b * c)
    out = np.stack([a, cg, b, cb, ca, c], axis=1)
    return out[0] if single else out
