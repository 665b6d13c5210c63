"""Fused align+feature+MLP Pallas TPU kernels.

THE performance component of this framework (SURVEY.md §7 step 5). The
reference evaluates features in a per-feature Python loop of tiny torch ops
(reference molann/ann.py:473) — a kernel-launch chain per feature. Here the
whole model — Kabsch alignment (QCP), every feature, and the MLP — runs as
ONE Pallas kernel per frame tile: one HBM read of the coordinates (in their
NATURAL [l, n, 3] layout), one HBM write of the outputs, everything else in
VMEM/registers.

Layout strategy (the part that matters on TPU):

- Coordinates arrive frame-major ``[TILE, 3n]``; the kernel transposes the
  tile ONCE in VMEM and folds the frame axis into full vector tiles, so
  every per-frame scalar of the math (a bond length, a quaternion
  component, one entry of the 3x3 covariance) lives as an ``[8, TILE/8]``
  f32 tile — 8 sublanes × 128 lanes, 100% VPU utilization. The natural
  layout would waste ~97% of each vector register (trailing dims of 3),
  and unfolded ``[1, TILE]`` rows would use 1 of 8 sublanes. A host-side
  XLA transpose of the full trajectory measured ~8 GB/s; the in-kernel
  VMEM transpose amortizes to noise.
- 3-vectors are Python tuples of three such tiles; cross/dot products and
  the whole QCP chain (Horn 4x4, Newton iteration, adjugate eigenvector)
  are unrolled elementwise tile ops.
- The MLP runs as unrolled scalar-weight multiply-adds (dims are ~10; an
  MXU matmul would waste the 128x128 systolic array, madds ride the VPU).

Gather indices and the output permutation are compile-time constants baked
into the kernel (the construction-time/run-time split of SURVEY.md §1 taken
to its conclusion); MLP weights and the alignment reference ``ref_x`` are
tensor inputs, so the fused path composes with ``jax.jit``/``jax.grad`` over
the model pytree exactly like the jnp path.

Backward: a second Pallas kernel evaluates ``jax.vjp`` of the SAME tile
math *inside* the kernel body — exact gradients with no hand-derived
formulas, fused in VMEM. Parameter/ref_x gradients accumulate across the
(sequential) TPU grid into revisited output blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import CompiledFeatures

__all__ = [
    "fused_apply",
    "fused_model_forward",
    "fused_cv_forces",
    "fused_train_grads",
    "select_mode",
    "active_atom_indices",
    "model_chunk_matrix",
    "qcp_rotation",
]

DEFAULT_TILE = 2048
DEFAULT_BWD_TILE = 1024  # backward holds vjp residuals in VMEM
_NEWTON_ITERS = 12
_SUB = 8  # max sublane fold of the frame axis

# Envelope of the unrolled (fully-immediate) kernels: past this the Mosaic
# op count (and compile time) grows too large and the blocked formulation
# (ops/fused_blocked.py, O(1) op count) takes over. Coordination pairs are
# unrolled one switching function at a time (~10 ops each), so large pair
# lists blow the op count just like large feature sets do.
UNROLLED_MAX_ATOMS = 64
UNROLLED_MAX_COLS = 96
UNROLLED_MAX_COORD_PAIRS = 96


def select_mode(spec, n_atoms: int) -> str:
    """Pick the fused formulation for a system size: ``"unrolled"`` bakes
    everything in as immediates (fastest for small systems), ``"blocked"``
    keeps the kernel op count O(1) in atoms/features (coordination pair
    differences ride the edge matmul; their switching sums are per-feature
    tile reductions) — compiles fast at any scale."""
    n_pairs = sum(np_ for _, np_ in getattr(spec, "coord_slices", ()))
    if (spec.out_dim <= UNROLLED_MAX_COLS and n_atoms <= UNROLLED_MAX_ATOMS
            and n_pairs <= UNROLLED_MAX_COORD_PAIRS):
        return "unrolled"
    return "blocked"


def model_select_mode(model) -> str:
    """:func:`select_mode` applied to a model: which fused formulation
    its system size gets under ``mode="auto"``."""
    import jax.numpy as jnp

    spec, _, _, _, _ = _extract_model(model, jnp.float32)
    return select_mode(spec, spec.n_input_atoms)


def model_chunk_matrix(model):
    """The chunked-coordination pair matrix of a model as a bf16 numpy
    array, or None when no feature is chunked. For condensed-phase pair
    counts, pass it THROUGH your jit boundary into
    ``fused_cv_forces(..., c_mat=...)`` / ``fused_train_grads(...,
    c_mat=...)`` so the (potentially multi-GB) table rides as one device
    buffer instead of an HLO constant per executable::

        C = jax.device_put(model_chunk_matrix(model))
        f = jax.jit(lambda m, v, c: fused_cv_forces(m, v, c_mat=c))
        y, g = f(model, x, C)
    """
    import jax.numpy as jnp

    spec, align_idx, _, _, _ = _extract_model(model, jnp.float32)
    from .fused_blocked import chunk_matrix

    return chunk_matrix(spec, align_idx)


def active_atom_indices(model):
    """0-based input-group indices of the atoms any feature (or the align
    subset) references — the rows of a ``compact_grads=True`` gradient
    from :func:`fused_cv_forces`. All other atoms have exactly-zero
    gradients. ``None`` means every atom is active (the gradient is
    already full-width)."""
    import jax.numpy as jnp

    spec, align_idx, _, _, _ = _extract_model(model, jnp.float32)
    from .fused_blocked import blocked_layout

    lay = blocked_layout(spec, align_idx)
    return None if lay.active_idx is None else lay.active_idx.copy()


def _sub_for(tile: int) -> int:
    """Sublane fold for a tile: folded lanes must stay >= 128 (Mosaic
    cannot shape-cast below a full lane tile), so small tiles fold less."""
    return max(1, min(_SUB, tile // 128))


def _check_tile(tile: int, interpret: bool, backward: bool = False,
                remat: bool = False):
    """Compiled Mosaic kernels need the full (8, 128) fold — reshapes with
    fewer than 128 folded lanes fail layout inference. Backward/CV-forces
    kernels take vjp through the TILE MATH only (fold/unfold of the
    cotangents is done manually with bulk 3D reshapes), so any multiple
    of 1024 compiles. The interleaved-remat variant still re-slices
    feature rows via ``(1, tile) -> (8, tile/8)`` reshapes, which Mosaic
    only lowers at exactly 128 folded lanes — remat stays tile==1024.
    Interpret mode (and therefore the CPU tests) is unrestricted."""
    if interpret:
        return
    if tile % (128 * _SUB):
        raise ValueError(
            f"fused kernels require tile to be a multiple of 1024 when "
            f"compiled (got {tile}); small tiles work with interpret=True"
        )
    if backward and remat and tile != 128 * _SUB:
        raise ValueError(
            f"the interleaved-remat CV-forces kernel requires tile == 1024 "
            f"when compiled (got {tile}): its per-row re-slicing reshape "
            f"only lowers at 128 folded lanes"
        )


# ---------------------------------------------------------------------------
# Tile math. A "scalar" is an [S, C] array (one value per frame, frames
# folded over sublanes x lanes); a "vector" is a tuple of three scalars.
# Used inside the Pallas kernels and (reshaped) by parity tests.
# ---------------------------------------------------------------------------


def _dot3(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def _norm3(u):
    return jnp.sqrt(_dot3(u, u))


def _cross3(u, v):
    return (
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    )


def _sub3(u, v):
    return (u[0] - v[0], u[1] - v[1], u[2] - v[2])


def qcp_rotation(H):
    """Horn/QCP optimal rotation from a per-frame covariance.

    H: 3x3 nested list of same-shaped arrays (any tile shape — one
    covariance entry per frame). Returns the 3x3 nested list R such that
    row-vector application ``aligned_i = Σ_j v_j * R[j][i]`` reproduces the
    reference Kabsch semantics (molann/ann.py:157-199): largest-eigenvalue
    quaternion of Horn's symmetric 4x4 via Newton on the characteristic
    polynomial + adjugate eigenvector, fully differentiable (one
    differentiable Newton step composed on a stop-gradient fixed point).
    Shared by the unrolled and blocked fused kernels.
    """
    Sxx, Sxy, Sxz = H[0]
    Syx, Syy, Syz = H[1]
    Szx, Szy, Szz = H[2]

    # Horn's symmetric 4x4 K
    k = [[None] * 4 for _ in range(4)]
    k[0][0] = Sxx + Syy + Szz
    k[0][1] = Syz - Szy
    k[0][2] = Szx - Sxz
    k[0][3] = Sxy - Syx
    k[1][1] = Sxx - Syy - Szz
    k[1][2] = Sxy + Syx
    k[1][3] = Szx + Sxz
    k[2][2] = -Sxx + Syy - Szz
    k[2][3] = Syz + Szy
    k[3][3] = -Sxx - Syy + Szz
    for i in range(4):
        for j in range(i):
            k[i][j] = k[j][i]

    # characteristic polynomial λ⁴ + c2 λ² + c1 λ + c0  (tr K = 0)
    frob2 = sum(H[i][j] * H[i][j] for i in range(3) for j in range(3))
    c2 = -2.0 * frob2
    det_h = (
        Sxx * (Syy * Szz - Syz * Szy)
        - Sxy * (Syx * Szz - Syz * Szx)
        + Sxz * (Syx * Szy - Syy * Szx)
    )
    c1 = -8.0 * det_h
    # c0 = det K = p2²/8 - p4/4 with p2 = tr K², p4 = tr K⁴
    k2 = [
        [sum(k[i][m] * k[m][j] for m in range(4)) for j in range(i, 4)]
        for i in range(4)
    ]

    def K2(i, j):
        return k2[i][j - i] if j >= i else k2[j][i - j]

    p2 = sum(K2(i, i) for i in range(4))
    p4 = sum(K2(i, j) * K2(i, j) for i in range(4) for j in range(4))
    c0 = p2 * p2 / 8.0 - p4 / 4.0

    def newton_step(lam):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        return lam - p / jnp.where(jnp.abs(dp) < 1e-30, 1e-30, dp)

    # Converge with gradients stopped, then take ONE differentiable step:
    # at a simple root the Newton map has zero derivative in λ, so the
    # one-step composite has the exact fixed-point gradient at 1/NITERS of
    # the backward cost of an unrolled chain.
    lam = jax.lax.stop_gradient(
        functools.reduce(
            lambda l, _: newton_step(l), range(_NEWTON_ITERS),
            jnp.sqrt(3.0 * frob2),
        )
    )
    lam = newton_step(lam)

    # adjugate of M = K - λI (symmetric): columns ∝ top eigenvector
    m = [[k[i][j] for j in range(4)] for i in range(4)]
    for i in range(4):
        m[i][i] = m[i][i] - lam

    def det3(rows, cols):
        (a, b, cc), (d, e, f), (g, h, i_) = (
            [m[r][c] for c in cols] for r in rows
        )
        return a * (e * i_ - f * h) - b * (d * i_ - f * g) + cc * (d * h - e * g)

    cols = []
    norms = []
    for j in range(4):
        rows_j = [r for r in range(4) if r != j]
        col = []
        for i in range(4):
            cols_i = [c for c in range(4) if c != i]
            sign = -1.0 if (i + j) % 2 else 1.0
            # adj[i][j] = sign * minor with row j / col i removed
            # (cofactor transpose); M symmetric => adj symmetric.
            col.append(sign * det3(rows_j, cols_i))
        cols.append(col)
        norms.append(sum(x * x for x in col))

    # branchless priority select of the largest-norm adjugate column
    best_n = norms[0]
    q = list(cols[0])
    for jcol in range(1, 4):
        take = norms[jcol] > best_n
        q = [jnp.where(take, cols[jcol][i], q[i]) for i in range(4)]
        best_n = jnp.where(take, norms[jcol], best_n)

    qn = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    w, x_, y_, z_ = (qi / qn for qi in q)

    # row-vector rotation R = Rot(q)ᵀ: aligned_i = Σ_j v_j * R[j][i]
    xx, yy, zz = x_ * x_, y_ * y_, z_ * z_
    xy, xz, yz = x_ * y_, x_ * z_, y_ * z_
    wx, wy, wz = w * x_, w * y_, w * z_
    return [
        [1 - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy)],
        [2 * (xy - wz), 1 - 2 * (xx + zz), 2 * (yz + wx)],
        [2 * (xz + wy), 2 * (yz - wx), 1 - 2 * (xx + yy)],
    ]


def _align_tiles(atoms, align_idx, ref_rows, needed=None):
    """Kabsch-align folded frames.

    atoms: list of n vectors (tuples of [S, C] tiles).
    align_idx: static local indices of the align atoms.
    ref_rows: ``[3*n_align, 1]`` centered reference coordinates (tensor
    input; entry (n, j) at row 3n+j).
    needed: optional set of atom indices — only these are transformed
    (others come back as None). Rotation-invariant features don't need
    aligned coordinates, so the kernel only rotates atoms that feed
    position features.
    Returns the aligned list of vectors. Same math as
    :func:`molann_tpu.ops.alignment.align_frames` with the QCP solver
    (reference semantics: molann/ann.py:157-199), unrolled per component.
    """
    idx = align_idx
    n_a = float(len(idx))

    def ref(n, j):
        # 0-d scalar extract: Mosaic lowers scalar*vector as a splat
        # (a [1,1]->[S,C] vector.broadcast is not implemented)
        return ref_rows[3 * n + j, 0]

    c = tuple(
        sum(atoms[a][i] for a in idx) / n_a for i in range(3)
    )

    # covariance H[i][j] = sum_n (sub_n_i - c_i) * ref[n][j]
    H = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            acc = None
            for n, a in enumerate(idx):
                term = (atoms[a][i] - c[i]) * ref(n, j)
                acc = term if acc is None else acc + term
            H[i][j] = acc

    R = qcp_rotation(H)

    out = []
    for a, atom in enumerate(atoms):
        if needed is not None and a not in needed:
            out.append(None)
            continue
        v = tuple(atom[i] - c[i] for i in range(3))
        out.append(
            tuple(
                v[0] * R[0][i] + v[1] * R[1][i] + v[2] * R[2][i]
                for i in range(3)
            )
        )
    return out


def _angle_row(atoms, idx, use_angle_value):
    a0, a1, a2 = idx
    r21 = _sub3(atoms[a0], atoms[a1])
    r23 = _sub3(atoms[a2], atoms[a1])
    cos_angle = _dot3(r21, r23) / (_norm3(r21) * _norm3(r23))
    return jnp.arccos(cos_angle) if use_angle_value else cos_angle


def _bond_row(atoms, idx):
    a0, a1 = idx
    return _norm3(_sub3(atoms[a1], atoms[a0]))


def _dihedral_rows(atoms, idx, use_angle_value):
    a0, a1, a2, a3 = idx
    r12 = _sub3(atoms[a1], atoms[a0])
    r23 = _sub3(atoms[a2], atoms[a1])
    r34 = _sub3(atoms[a3], atoms[a2])
    n1 = _cross3(r12, r23)
    n2 = _cross3(r23, r34)
    cos_phi = _dot3(n1, n2)
    sin_phi = _dot3(n1, r34) * _norm3(r23)
    if use_angle_value:
        return [jnp.arctan2(sin_phi, cos_phi)]
    radius = jnp.sqrt(cos_phi * cos_phi + sin_phi * sin_phi)
    return [cos_phi / radius, sin_phi / radius]


def _coordination_row(atoms, pairs, r0, nn, mm, box=None, dmax=None):
    """One coordination feature on folded frames: sum of rational
    switching functions over its (static, baked-in) pair list, with
    optional static-box minimum-image distances and optional exact
    ``d_max`` truncation. Delegates the switching
    math and the minimum image to the shared helpers in
    :mod:`molann_tpu.ops.features` (ONE implementation of the
    numerically critical geometric-sum formulation)."""
    from .features import min_image_components, switching_function

    acc = None
    for i, j in pairs:
        d = _sub3(atoms[j], atoms[i])
        if box is not None:
            d = min_image_components(d, box)
        s = switching_function(_norm3(d), r0, nn, mm, dmax)
        acc = s if acc is None else acc + s
    return acc


def _coord_specs(spec: CompiledFeatures):
    """Per-coordination-feature (pairs, r0, nn, mm, box, dmax) views of
    the flat spec tables."""
    boxes = getattr(spec, "coord_boxes", None) or (None,) * len(
        spec.coord_slices)
    dmaxes = getattr(spec, "coord_dmax", None) or (None,) * len(
        spec.coord_slices)
    return [
        (spec.coord_pairs[start:start + npairs], r0, nn, mm, box, dmax)
        for (start, npairs), (r0, nn, mm), box, dmax
        in zip(spec.coord_slices, spec.coord_params, boxes, dmaxes)
    ]


def _feature_blocks(spec: CompiledFeatures, align_idx):
    """Independent feature blocks in intermediate (type-grouped) row order.

    Each block is ``(n_rows, fn(atoms, ref_rows) -> rows)`` computable on
    its own — the unit of the interleaved-remat backward (one block's
    intermediates live at a time). The position block embeds the Kabsch
    alignment when present.
    """
    blocks = []
    for idx in spec.angle_idx:
        blocks.append((
            1,
            lambda atoms, ref, idx=idx: [
                _angle_row(atoms, idx, spec.use_angle_value)
            ],
        ))
    for idx in spec.bond_idx:
        blocks.append((1, lambda atoms, ref, idx=idx: [_bond_row(atoms, idx)]))
    d_width = 1 if spec.use_angle_value else 2
    for idx in spec.dihedral_idx:
        blocks.append((
            d_width,
            lambda atoms, ref, idx=idx: _dihedral_rows(
                atoms, idx, spec.use_angle_value
            ),
        ))
    for pairs, r0, nn, mm, box, dmax in _coord_specs(spec):
        blocks.append((
            1,
            lambda atoms, ref, pairs=pairs, r0=r0, nn=nn, mm=mm, box=box,
            dmax=dmax: [
                _coordination_row(atoms, pairs, r0, nn, mm, box, dmax)
            ],
        ))
    if spec.position_idx:
        def f_pos(atoms, ref_rows):
            if align_idx is not None:
                src = _align_tiles(
                    atoms, align_idx, ref_rows, set(spec.position_idx)
                )
            else:
                src = atoms
            rows = []
            for a in spec.position_idx:
                rows.extend(src[a])
            return rows

        blocks.append((3 * len(spec.position_idx), f_pos))
    return blocks


def _features_tiles(atoms, spec: CompiledFeatures, pos_atoms=None):
    """All features on folded frames: list of vectors -> list of scalar
    tiles in feature-list column order (reference column semantics:
    type-grouped blocks + static perm, molann/ann.py:473/:351/:354).

    pos_atoms: optional per-atom override used for position features
    (aligned coordinates); bond/angle/dihedral are rotation+translation
    invariant and always read ``atoms``.
    """
    if pos_atoms is None:
        pos_atoms = atoms
    rows = []
    for idx in spec.angle_idx:
        rows.append(_angle_row(atoms, idx, spec.use_angle_value))
    for idx in spec.bond_idx:
        rows.append(_bond_row(atoms, idx))
    for idx in spec.dihedral_idx:
        rows.extend(_dihedral_rows(atoms, idx, spec.use_angle_value))
    for pairs, r0, nn, mm, box, dmax in _coord_specs(spec):
        rows.append(_coordination_row(atoms, pairs, r0, nn, mm, box, dmax))
    for a in spec.position_idx:
        rows.extend(pos_atoms[a])

    if spec.perm is not None:
        rows = [rows[p] for p in spec.perm]
    return rows


def _mlp_tiles(rows, params, activation):
    """MLP as unrolled scalar-weight madds: list of d tiles -> list of
    d_out tiles. params: tuple of (Wt [d_out, d_in], b [d_out, 1])."""
    h = rows
    n = len(params)
    for li, (wt, b) in enumerate(params):
        d_out, d_in = wt.shape
        nxt = []
        for j in range(d_out):
            # 0-d scalar weights -> splat broadcasts (see _align_tiles.ref)
            acc = b[j, 0] + wt[j, 0] * h[0]
            for kk in range(1, d_in):
                acc = acc + wt[j, kk] * h[kk]
            nxt.append(acc)
        if li < n - 1:
            nxt = [activation(t) for t in nxt]
        h = nxt
    return h


def _forward_tiles(atoms, tensors, spec, align_idx, activation):
    """Complete fused math on one folded tile (list-of-vectors in,
    list-of-scalar-tiles out).

    Alignment only changes position features (the rest are rigid-motion
    invariant — that's their point), so the QCP solve + rotation runs only
    for atoms that feed position features, and is skipped entirely when
    there are none. Outputs and gradients are mathematically identical to
    the literal compose-then-evaluate order (parity-tested)."""
    pos_atoms = None
    if align_idx is not None:
        ref_rows, rest = tensors[0], tensors[1:]
        if spec.position_idx:
            needed = set(spec.position_idx)
            pos_atoms = _align_tiles(atoms, align_idx, ref_rows, needed)
    else:
        rest = tensors
    rows = _features_tiles(atoms, spec, pos_atoms)
    if rest:
        params = tuple(
            (rest[2 * i], rest[2 * i + 1]) for i in range(len(rest) // 2)
        )
        rows = _mlp_tiles(rows, params, activation)
    return rows


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fold_block(x_blk, n_atoms):
    """[TILE, 3n] natural block -> list of n vectors of [S, C] tiles.

    One in-VMEM transpose + reshape per tile; everything downstream is
    full-tile elementwise math.
    """
    tile = x_blk.shape[0]
    sub = _sub_for(tile)
    xt = x_blk.T.reshape(3 * n_atoms, sub, tile // sub)
    return [
        (xt[3 * a], xt[3 * a + 1], xt[3 * a + 2]) for a in range(n_atoms)
    ]


def _unfold_rows(rows, tile):
    """List of k scalar [S, C] tiles -> [TILE, k] natural block."""
    stacked = jnp.concatenate(
        [r.reshape(1, tile) for r in rows], axis=0
    )  # [k, TILE]
    return stacked.T


def _fwd_kernel(spec, align_idx, activation, n_atoms, x_ref, *rest):
    y_ref = rest[-1]
    tensors = [r[:] for r in rest[:-1]]
    atoms = _fold_block(x_ref[:], n_atoms)
    rows = _forward_tiles(atoms, tensors, spec, align_idx, activation)
    y_ref[:] = _unfold_rows(rows, x_ref.shape[0])


def _bwd_kernel(spec, align_idx, activation, n_atoms, x_ref, gy_ref, *rest):
    # rest = (*tensor_in_refs, gx_ref, *gtensor_out_refs)
    n_t = (len(rest) - 1) // 2
    tensor_in = [r[:] for r in rest[:n_t]]
    gx_ref = rest[n_t]
    gtensor_refs = rest[n_t + 1 :]
    tile = x_ref.shape[0]
    sub = _sub_for(tile)

    # vjp through the TILE MATH only: the fold/unfold reshapes stay
    # outside autodiff (their reverse — a (1, tile) -> (sub, C) reshape —
    # doesn't lower in Mosaic past 128 folded lanes; the manual bulk 3D
    # reshapes below lower at any 1024-multiple tile)
    atoms = _fold_block(x_ref[:], n_atoms)

    def f(atoms_in, tensors):
        return _forward_tiles(atoms_in, tensors, spec, align_idx,
                              activation)

    rows, vjp = jax.vjp(f, atoms, tensor_in)
    gyf = gy_ref[:].T.reshape(len(rows), sub, tile // sub)
    grows = [gyf[i] for i in range(len(rows))]
    gatoms, gtensors = vjp(grows)
    gx_ref[:] = _unfold_rows(
        [c for vec in gatoms for c in vec], tile
    )

    is_first = pl.program_id(0) == 0
    for ref, g in zip(gtensor_refs, gtensors):
        @pl.when(is_first)
        def _(ref=ref, g=g):
            ref[:] = g

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, g=g):
            ref[:] = ref[:] + g


def _out_dim(spec, params):
    return params[-1][0].shape[0] if params else spec.out_dim


def _tensor_list(align_idx, params, ref_x):
    tensors = []
    if align_idx is not None:
        tensors.append(ref_x.reshape(-1, 1))
    for (w, b) in params:
        tensors.append(w)
        tensors.append(b)
    return tensors


def _full_spec(p):
    return pl.BlockSpec(
        p.shape, lambda i: (0,) * p.ndim, memory_space=pltpu.VMEM
    )


def _as_packed(x):
    """Accept [l, n, 3] or packed [l, 3n]; return ([l, 3n], n_atoms, packed).

    IMPORTANT: on TPU a resident [l, n, 3] f32 array is tiled T(8,128) on
    its minor dims — the trailing 3 pads to 128 lanes, a ~42x HBM blowup.
    The packed [l, 3n] form (and this kernel's outputs) avoid that; keep
    trajectories packed end-to-end on the hot path.
    """
    if x.ndim == 3:
        return x.reshape(x.shape[0], x.shape[1] * 3), x.shape[1], False
    return x, x.shape[1] // 3, True


def _prep_input(xm, tile):
    """Pad packed frames to a tile multiple (edge-mode keeps padded frames
    numerically tame; they are sliced off afterwards)."""
    l = xm.shape[0]
    l_p = ((l + tile - 1) // tile) * tile
    if l_p != l:
        xm = jnp.pad(xm, ((0, l_p - l), (0, 0)), mode="edge")
    return xm, l_p


def _fwd_impl(spec, align_idx, activation, tile, interpret, params, ref_x, x):
    _check_tile(tile, interpret)
    xm0, n_atoms, _ = _as_packed(x)
    l = xm0.shape[0]
    d_out = _out_dim(spec, params)
    xm, l_p = _prep_input(xm0, tile)

    tensors = _tensor_list(align_idx, params, ref_x)
    grid = (l_p // tile,)
    in_specs = [
        pl.BlockSpec(
            (tile, 3 * n_atoms), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    ] + [_full_spec(t) for t in tensors]
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, align_idx, activation, n_atoms),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((l_p, d_out), x.dtype),
        interpret=interpret,
    )(xm, *tensors)
    return y[:l]


def _bwd_impl(spec, align_idx, activation, tile, interpret, params, ref_x,
              x, gy):
    _check_tile(tile, interpret, backward=True, remat=False)
    xm0, n_atoms, packed = _as_packed(x)
    l = xm0.shape[0]
    d_out = _out_dim(spec, params)
    xm, l_p = _prep_input(xm0, tile)
    # zero-pad the cotangent so padded frames contribute nothing
    gym = jnp.pad(gy, ((0, l_p - l), (0, 0))) if l_p != l else gy

    tensors = _tensor_list(align_idx, params, ref_x)
    grid = (l_p // tile,)
    in_specs = [
        pl.BlockSpec(
            (tile, 3 * n_atoms), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((tile, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [_full_spec(t) for t in tensors]
    out_shapes = [jax.ShapeDtypeStruct((l_p, 3 * n_atoms), x.dtype)] + [
        jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tensors
    ]
    out_specs = [
        pl.BlockSpec(
            (tile, 3 * n_atoms), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    ] + [_full_spec(t) for t in tensors]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, align_idx, activation, n_atoms),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xm, gym, *tensors)
    gxm, *gtensors = outs
    gx = gxm[:l] if packed else gxm[:l].reshape(l, n_atoms, 3)

    if align_idx is not None:
        gref = gtensors[0].reshape(ref_x.shape)
        grest = gtensors[1:]
    else:
        gref = jnp.zeros_like(ref_x)
        grest = gtensors
    gparams = tuple(
        (grest[2 * i], grest[2 * i + 1]) for i in range(len(grest) // 2)
    )
    return gparams, gref, gx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_apply(spec, align_idx, activation, tiles, interpret,
                params, ref_x, x):
    """Fused align+feature+MLP forward: ``x [l, n, 3] -> [l, d_out]``.

    spec: :class:`~molann_tpu.spec.CompiledFeatures` (static).
    align_idx: static tuple of local align-atom indices, or None.
    activation: elementwise activation callable (static).
    tiles: (fwd_tile, bwd_tile) frames per kernel invocation.
    params: tuple of (Wt [d_out, d_in], b [d_out, 1]) — TRANSPOSED weights
    relative to :class:`~molann_tpu.models.ann.SequentialNN`. Empty tuple
    -> returns the features themselves.
    ref_x: [n_align, 3] centered reference coordinates (pass a dummy
    (0, 3) array when align_idx is None).

    x may be [l, n, 3] (reference convention) or PACKED [l, 3n]; gradients
    come back in the same form. Prefer packed on TPU: resident [l, n, 3]
    arrays are lane-padded 3 -> 128 (~42x HBM waste).
    """
    return _fwd_impl(
        spec, align_idx, activation, tiles[0], interpret, params, ref_x, x
    )


def _fused_fwd(spec, align_idx, activation, tiles, interpret,
               params, ref_x, x):
    y = _fwd_impl(
        spec, align_idx, activation, tiles[0], interpret, params, ref_x, x
    )
    return y, (params, ref_x, x)


def _fused_bwd(spec, align_idx, activation, tiles, interpret, res, gy):
    params, ref_x, x = res
    return _bwd_impl(
        spec, align_idx, activation, tiles[1], interpret, params, ref_x, x, gy
    )


fused_apply.defvjp(_fused_fwd, _fused_bwd)


def _extract_model(model, dtype):
    """Decompose a model into (spec, align_idx, ref_x, params, activation)
    for the fused kernels."""
    from ..models.ann import (
        FeatureLayer,
        Identity,
        MolANN,
        PreprocessingANN,
        SequentialNN,
    )

    nn = None
    if isinstance(model, MolANN):
        pp = model.preprocessing_layer
        nn = model.ann_layers
    elif isinstance(model, (PreprocessingANN, FeatureLayer)):
        pp = model
    else:
        raise TypeError(f"cannot run {type(model).__name__} via the fused path")

    if isinstance(pp, FeatureLayer):
        flayer, align_layer = pp, None
    else:
        flayer = pp.feature_layer
        align_layer = pp.align_layer
        if isinstance(align_layer, Identity):
            align_layer = None

    spec = flayer.spec
    if align_layer is not None:
        align_idx = tuple(align_layer._local_align_atom_indices)
        ref_x = align_layer.ref_x
    else:
        align_idx = None
        ref_x = jnp.zeros((0, 3), dtype=dtype)

    params = ()
    activation = jnp.tanh
    if nn is not None:
        if not isinstance(nn, SequentialNN):
            raise TypeError("fused path requires a SequentialNN head")
        activation = nn.activation
        params = tuple((w.T, b.reshape(-1, 1)) for (w, b) in nn.params)
    return spec, align_idx, ref_x, params, activation


def resolve_precision(precision: str, *, training: bool) -> str:
    """The shipped precision policy (VERDICT r2 next #4; error budget in
    docs/design.md): ``"auto"`` resolves to ``"tf32"`` on TRAINING paths
    (fused_train_grads / make_fused_train_step — the measured ~5e-3
    relative coordinate-gradient error sits beneath SGD noise, for +21%
    throughput on blocked systems; convergence pinned by
    tests/test_train.py::test_tf32_policy_convergence) and to ``"exact"``
    on SERVING paths (forward / cv+forces — biased-MD consumers get
    f32-faithful values). Explicit names pass through unchanged."""
    if precision == "auto":
        return "tf32" if training else "exact"
    if precision not in ("exact", "tf32", "bf16"):
        raise ValueError(
            f"unknown precision {precision!r}: "
            "choose 'auto', 'exact', 'tf32', or 'bf16'"
        )
    return precision


def fused_model_forward(model, x, *, tile=None, bwd_tile=None,
                        interpret=False, mode="auto", precision="exact",
                        c_mat=None):
    """Run a ``MolANN`` (or ``PreprocessingANN``/``FeatureLayer``) through
    the fused Pallas path. Equivalent to ``model(x)`` to float32 tolerance
    (parity-tested); one kernel per frame tile instead of an XLA op graph.
    Fully differentiable w.r.t. x, the MLP parameters, and ref_x.

    mode: ``"auto"`` (size-based — see :func:`select_mode`), ``"unrolled"``
    (immediates kernel), or ``"blocked"`` (O(1)-op-count kernel for large
    systems). Tiles default per mode (blocked auto-sizes from a VMEM
    model). precision (blocked mode): ``"exact"`` (f32-faithful, default),
    ``"tf32"`` (~1e-5 relative), or ``"bf16"`` (~2e-3 relative, fastest) —
    see docs/design.md for the error budget; the unrolled kernel has no
    matmuls and ignores it. ``"auto"`` = the shipped policy
    (:func:`resolve_precision`): exact on this serving path.
    c_mat (blocked mode): the chunk matrix from
    :func:`model_chunk_matrix` routed through the caller's jit boundary
    as a REAL operand, keeping condensed-phase pair tables (GBs) out of
    the compiled module — the forward-only serving route for systems
    past the fused backward envelope. Treated as a constant under
    differentiation.
    """
    precision = resolve_precision(precision, training=False)
    spec, align_idx, ref_x, params, activation = _extract_model(model, x.dtype)
    n_atoms = spec.n_input_atoms
    if mode == "auto":
        mode = select_mode(spec, n_atoms)
    if mode == "blocked":
        from .fused_blocked import blocked_apply

        return blocked_apply(
            spec, align_idx, activation, (tile, bwd_tile), interpret,
            precision, params, ref_x, x, c_mat
        )
    if c_mat is not None:
        raise ValueError(
            "c_mat applies to the blocked formulation only "
            "(mode='blocked'; auto selected 'unrolled' for this system)"
        )
    if tile is None:
        tile = DEFAULT_TILE
    if bwd_tile is None:
        bwd_tile = DEFAULT_BWD_TILE
    return fused_apply(
        spec, align_idx, activation, (tile, bwd_tile), interpret,
        params, ref_x, x
    )


def _train_kernel(spec, align_idx, activation, n_atoms, inv_count, l_total,
                  transposed_in, train_ref, x_ref, yt_ref, *rest):
    """Fused MSE training kernel: loss + parameter gradients in ONE
    kernel, NO coordinate-gradient compute or HBM write.

    The parameter-only training path previously paid for the gx output it
    discarded (round-1 ROADMAP #3); differentiating w.r.t. the (closed
    over) tensors only skips the entire gx accumulation chain and its
    trajectory-sized HBM write. With ``train_ref=False`` (the default —
    ``ref_x`` is a frozen buffer in the reference, molann/ann.py:137) the
    alignment reference is also closed over, skipping the whole QCP
    backward chain. rest = (*tensor_refs, loss_ref, *gtensor_refs);
    loss/gtensors accumulate across the sequential grid.
    """
    n_skip = 1 if (align_idx is not None and not train_ref) else 0
    n_t = (len(rest) - 1 - n_skip) // 2 + n_skip
    fixed = [r[:] for r in rest[:n_skip]]
    tensor_in = [r[:] for r in rest[n_skip:n_t]]
    loss_ref = rest[n_t]
    gtensor_refs = rest[n_t + 1 :]
    tile = x_ref.shape[1] if transposed_in else x_ref.shape[0]
    x_blk = x_ref[:]
    # Compare in the FOLDED layout: fold the target once (fwd-direction
    # reshape, same as the x fold) instead of unfolding the prediction —
    # the unfold's reshape has no Mosaic backward lowering.
    sub = _sub_for(tile)
    cols = tile // sub
    ytm = yt_ref[:] if transposed_in else yt_ref[:].T  # [d, tile]
    ytf = ytm.reshape(ytm.shape[0], sub, cols)  # same fold as _fold_block_t
    yt_rows = [ytf[i] for i in range(ytf.shape[0])]

    # mask padded frames in the (only partially valid) last tile; folded
    # frame index = sublane * cols + lane
    base = pl.program_id(0) * tile
    fidx = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (sub, cols), 0) * cols
        + jax.lax.broadcasted_iota(jnp.int32, (sub, cols), 1)
    )
    mask = (fidx < l_total).astype(x_blk.dtype)

    def fold(xb):
        if transposed_in:
            return _fold_block_t(xb, n_atoms, tile)
        return _fold_block(xb, n_atoms)

    def loss_fn(tensors):
        rows = _forward_tiles(fold(x_blk), fixed + list(tensors), spec,
                              align_idx, activation)
        acc = None
        for r, t in zip(rows, yt_rows):
            e = (r - t) * mask
            s = jnp.sum(e * e)
            acc = s if acc is None else acc + s
        return acc * inv_count

    loss, vjp = jax.vjp(loss_fn, tensor_in)
    (gtensors,) = vjp(jnp.ones((), x_blk.dtype))

    is_first = pl.program_id(0) == 0
    for ref, g in zip((loss_ref, *gtensor_refs),
                      (loss.reshape(1, 1), *gtensors)):
        @pl.when(is_first)
        def _(ref=ref, g=g):
            ref[:] = g

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, g=g):
            ref[:] = ref[:] + g


def _grads_like(model, gparams, gref):
    """Assemble a gradient pytree with ``model``'s structure from the
    kernel's flat (params, ref_x) gradients; all other leaves get zeros.
    gparams follow the KERNEL convention ((gWt [d_out, d_in],
    gb [d_out, 1]) per layer) and are transposed back here."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    gp = []
    for (gwt, gb) in gparams:
        gp.extend([gwt.T, gb.reshape(-1)])
    gp_iter = iter(gp)
    out = []
    for path, leaf in flat:
        names = [
            k.name for k in path if isinstance(k, jax.tree_util.GetAttrKey)
        ]
        if "params" in names:
            out.append(next(gp_iter))
        elif names and names[-1] == "ref_x":
            out.append(gref.reshape(jnp.shape(leaf)))
        else:
            out.append(jnp.zeros_like(leaf))
    assert next(gp_iter, None) is None, "unconsumed parameter gradients"
    return jax.tree_util.tree_unflatten(treedef, out)


def fused_train_grads(model, x, y_target, *, tile=None, interpret=False,
                      transposed_input=False, mode="auto",
                      precision="auto", train_ref=False, c_mat=None):
    """MSE loss AND its parameter/ref gradients in one fused kernel.

    The single-kernel training path: one HBM read of the trajectory batch,
    no coordinate gradients computed or written (the generic
    ``jax.grad(fused_mse_loss)`` route runs a forward kernel plus a
    backward kernel that also produces — and discards — gx).

    x: ``[l, n, 3]``, packed ``[l, 3n]``, or (with ``transposed_input``)
    ``[3n, l]``; y_target: ``[l, d_out]`` (or ``[d_out, l]`` transposed).
    Returns ``(loss, grads)`` where grads is a pytree shaped like
    ``model`` (zeros on non-trainable leaves) — feed it straight to
    ``optimizer.update``. Loss = ``mean((model(x) - y)**2)`` (matches
    :func:`molann_tpu.train.losses.mse_loss`). ``train_ref=False``
    (default) treats the alignment reference as the frozen buffer it is in
    the reference and skips its (expensive QCP-chain) gradient entirely;
    set True to get real ``ref_x`` gradients.

    precision defaults to ``"auto"`` = ``"tf32"`` here (the shipped
    training policy, :func:`resolve_precision`: +21% measured on blocked
    systems, convergence pinned in tests); pass ``"exact"`` to opt out.
    """
    precision = resolve_precision(precision, training=True)
    spec, align_idx, ref_x, params, activation = _extract_model(model, x.dtype)
    if mode == "auto":
        mode = select_mode(spec, spec.n_input_atoms)
    if mode == "blocked":
        from .fused_blocked import blocked_train_grads

        loss, gparams, gref = blocked_train_grads(
            spec, align_idx, activation, params, ref_x, x, y_target,
            tile=tile, interpret=interpret, precision=precision,
            train_ref=train_ref, c_mat=c_mat,
        )
        return loss, _grads_like(model, gparams, gref)
    if tile is None:
        tile = DEFAULT_BWD_TILE
    _check_tile(tile, interpret)

    if transposed_input:
        n_atoms, l = x.shape[0] // 3, x.shape[1]
        l_p = ((l + tile - 1) // tile) * tile
        xm = jnp.pad(x, ((0, 0), (0, l_p - l)), mode="edge") if l_p != l else x
        ytm = (
            jnp.pad(y_target, ((0, 0), (0, l_p - l)))
            if l_p != l else y_target
        )
    else:
        xm0, n_atoms, _ = _as_packed(x)
        l = xm0.shape[0]
        xm, l_p = _prep_input(xm0, tile)
        ytm = (
            jnp.pad(y_target, ((0, l_p - l), (0, 0)))
            if l_p != l else y_target
        )
    d_out = _out_dim(spec, params)
    inv_count = 1.0 / (float(l) * float(d_out))

    tensors = _tensor_list(align_idx, params, ref_x)
    n_skip = 1 if (align_idx is not None and not train_ref) else 0
    diff_tensors = tensors[n_skip:]
    grid = (l_p // tile,)
    if transposed_input:
        x_spec = pl.BlockSpec((3 * n_atoms, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        yt_spec = pl.BlockSpec((d_out, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((tile, 3 * n_atoms), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        yt_spec = pl.BlockSpec((tile, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    loss_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((1, 1), x.dtype)] + [
        jax.ShapeDtypeStruct(t.shape, t.dtype) for t in diff_tensors
    ]
    out_specs = [loss_spec] + [_full_spec(t) for t in diff_tensors]
    outs = pl.pallas_call(
        functools.partial(
            _train_kernel, spec, align_idx, activation, n_atoms,
            inv_count, l, transposed_input, train_ref,
        ),
        grid=grid,
        in_specs=[x_spec, yt_spec] + [_full_spec(t) for t in tensors],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xm, ytm, *tensors)
    loss, *gtensors = outs
    loss = loss[0, 0]
    if align_idx is not None and train_ref:
        gref = gtensors[0].reshape(ref_x.shape)
        grest = gtensors[1:]
    else:
        gref = jnp.zeros_like(ref_x)
        grest = gtensors
    gparams = tuple(
        (grest[2 * i], grest[2 * i + 1]) for i in range(len(grest) // 2)
    )
    return loss, _grads_like(model, gparams, gref)


def _fold_block_t(xt_blk, n_atoms, tile):
    """[3n, TILE] transposed block -> list of n vectors of [S, C] tiles.
    Pure reshape — no in-VMEM transpose needed."""
    sub = _sub_for(tile)
    xt = xt_blk.reshape(3 * n_atoms, sub, tile // sub)
    return [
        (xt[3 * a], xt[3 * a + 1], xt[3 * a + 2]) for a in range(n_atoms)
    ]


def _unfold_rows_t(rows, tile):
    """List of k scalar [S, C] tiles -> [k, TILE] transposed block."""
    return jnp.concatenate([r.reshape(1, tile) for r in rows], axis=0)


def _cv_forces_kernel(spec, align_idx, activation, n_atoms, component,
                      transposed_in, transposed_out, remat, x_ref, *rest):
    # rest = (*tensor_refs, y_ref, gx_ref)
    n_t = len(rest) - 2
    tensors = [r[:] for r in rest[:n_t]]
    y_ref, gx_ref = rest[n_t], rest[n_t + 1]
    tile = x_ref.shape[1] if transposed_in else x_ref.shape[0]

    def fold(x_blk):
        if transposed_in:
            return _fold_block_t(x_blk, n_atoms, tile)
        return _fold_block(x_blk, n_atoms)

    def f(x_blk):
        rows = _forward_tiles(
            fold(x_blk), tensors, spec, align_idx, activation
        )
        if transposed_out:
            return _unfold_rows_t(rows, tile)  # [d_out, tile]
        return _unfold_rows(rows, tile)  # [tile, d_out]

    def make_ct(y):
        if component is None:
            return jnp.ones_like(y)
        axis = 0 if transposed_out else 1
        col = jax.lax.broadcasted_iota(jnp.int32, y.shape, axis)
        return (col == component).astype(y.dtype)

    if not remat:
        # vjp through the TILE MATH only (see _bwd_kernel); the CV
        # cotangent is constant per output row, so it's built directly
        # in the folded [S, C] layout — no reshapes at all
        x_blk = x_ref[:]
        atoms = fold(x_blk)

        def ftiles(atoms_in):
            return _forward_tiles(atoms_in, tensors, spec, align_idx,
                                  activation)

        rows, vjp = jax.vjp(ftiles, atoms)
        y_ref[:] = (_unfold_rows_t(rows, tile) if transposed_out
                    else _unfold_rows(rows, tile))
        sub = _sub_for(tile)
        shape_sc = (sub, tile // sub)
        grows = [
            jnp.full(
                shape_sc,
                1.0 if (component is None or i == component) else 0.0,
                x_blk.dtype,
            )
            for i in range(len(rows))
        ]
        (gatoms,) = vjp(grows)
        flat = [c for vec in gatoms for c in vec]
        gx_ref[:] = (_unfold_rows_t(flat, tile) if transposed_in
                     else _unfold_rows(flat, tile))
        return

    # Interleaved-remat backward for large systems: holding the vjp
    # residuals of EVERY feature at once scales VMEM with
    # (n_features + n_atoms) x tile and OOMs for hundreds of atoms.
    # Instead: (1) forward all feature rows residual-free, (2) vjp only
    # the small MLP head to get per-feature-row cotangents, (3) re-derive
    # each feature block with its own short-lived vjp and accumulate gx.
    # Features are computed twice (standard remat trade) but peak VMEM is
    # one block's working set. (jax.checkpoint itself does not lower
    # through Pallas — remat2 is unimplemented in Mosaic — hence manual.)
    ref_rows = tensors[0] if align_idx is not None else None
    mlp_tensors = tensors[1:] if align_idx is not None else tensors
    params = tuple(
        (mlp_tensors[2 * i], mlp_tensors[2 * i + 1])
        for i in range(len(mlp_tensors) // 2)
    )
    blocks = _feature_blocks(spec, align_idx)
    sub = _sub_for(tile)

    x_blk = x_ref[:]
    atoms = fold(x_blk)
    feat_rows = []  # intermediate (type-grouped) order
    for _, fn_k in blocks:
        feat_rows.extend(fn_k(atoms, ref_rows))

    def head(rows_vec):
        # rows_vec: [d, tile] stacked intermediate rows -> model output
        rows = [
            rows_vec[i : i + 1].reshape(sub, tile // sub)
            for i in range(rows_vec.shape[0])
        ]
        if spec.perm is not None:
            rows = [rows[p] for p in spec.perm]
        if params:
            rows = _mlp_tiles(rows, params, activation)
        if transposed_out:
            return _unfold_rows_t(rows, tile)
        return _unfold_rows(rows, tile)

    feat_mat = _unfold_rows_t(feat_rows, tile)  # [d, tile]
    y, head_vjp = jax.vjp(head, feat_mat)
    (g_feat,) = head_vjp(make_ct(y))  # [d, tile], intermediate row order
    y_ref[:] = y

    gx = None
    row0 = 0
    for n_rows, fn_k in blocks:
        def f_k(xb, fn_k=fn_k):
            return _unfold_rows_t(fn_k(fold(xb), ref_rows), tile)

        _, vjp_k = jax.vjp(f_k, x_blk)
        (gxk,) = vjp_k(g_feat[row0 : row0 + n_rows])
        gx = gxk if gx is None else gx + gxk
        row0 += n_rows
    gx_ref[:] = gx


def fused_cv_forces(model, x, *, component=None, tile=None,
                    transposed_input=False, transposed_outputs=False,
                    remat=False, interpret=False, mode="auto",
                    precision="exact", compact_grads=False, c_mat=None):
    """The production serving op for biased MD: CV values AND their
    coordinate gradients in ONE kernel (single HBM read of the
    trajectory, no cotangent round-trip, no parameter-gradient state).

    component: which output column to differentiate (None = sum of all —
    the benchmark convention).
    transposed_input: ``x`` is given as ``[3n, l]`` (frames minor) — the
    zero-copy fast path: no in-kernel transpose and minimal HBM padding;
    implies transposed outputs. (The blocked mode additionally accepts
    component-major ``[3, n, l]`` directly — its zero-copy layout.)
    transposed_outputs: return ``y [d_out, l]`` and ``g [3n, l]`` instead
    of ``[l, d_out]`` / ``[l, n, 3]``-shaped. On TPU, HBM-resident
    ``[l, k]`` arrays with small k lane-pad k -> 128 (e.g. a [4M, 3] CV
    array physically occupies 2 GB); the transposed form pads only
    sublanes (~1.1-2.7x) and is the fast choice when the consumer can
    take frames in the minor axis.
    mode: ``"auto"`` / ``"unrolled"`` / ``"blocked"`` (see
    :func:`select_mode`).
    compact_grads (blocked mode): return gradients on the ACTIVE atoms
    only, shaped ``[3, n_active, l]`` (row k = atom
    ``active_atom_indices(model)[k]``) — skips the full-width HBM scatter
    when a big system carries a small CV set. Untouched atoms have
    exactly-zero gradients by construction.

    Returns ``(cv_values, gradients)``. (Forces are ``-gradients``.)
    """
    precision = resolve_precision(precision, training=False)
    spec, align_idx, ref_x, params, activation = _extract_model(model, x.dtype)
    if mode == "auto":
        mode = select_mode(spec, spec.n_input_atoms)
    if mode == "blocked":
        from .fused_blocked import blocked_cv_forces

        out_layout = "t" if (transposed_input or transposed_outputs) else None
        return blocked_cv_forces(
            spec, align_idx, activation, params, ref_x, x,
            component=component, tile=tile, interpret=interpret,
            out_layout=out_layout, precision=precision,
            compact_grads=compact_grads, c_mat=c_mat,
        )
    if compact_grads:
        raise ValueError(
            "compact_grads requires the blocked formulation "
            "(mode='blocked'; auto selected 'unrolled' for this system)"
        )
    if c_mat is not None:
        raise ValueError(
            "c_mat applies to the blocked formulation only "
            "(mode='blocked'; auto selected 'unrolled' for this system)"
        )
    if tile is None:
        tile = DEFAULT_BWD_TILE
    _check_tile(tile, interpret, backward=True, remat=remat)
    # transposed [3n, l] input: the zero-copy fast path (no in-kernel
    # transpose, minimal HBM padding).
    transposed_in = transposed_input
    if transposed_in:
        n_atoms, l = x.shape[0] // 3, x.shape[1]
        packed = True
        l_p = ((l + tile - 1) // tile) * tile
        xm = (
            jnp.pad(x, ((0, 0), (0, l_p - l)), mode="edge")
            if l_p != l else x
        )
        transposed_outputs = True  # transposed in => transposed out
    else:
        xm0, n_atoms, packed = _as_packed(x)
        l = xm0.shape[0]
        xm, l_p = _prep_input(xm0, tile)
    d_out = _out_dim(spec, params)
    if component is not None:
        component = component % d_out

    tensors = _tensor_list(align_idx, params, ref_x)
    grid = (l_p // tile,)
    if transposed_in:
        x_spec = pl.BlockSpec(
            (3 * n_atoms, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
    else:
        x_spec = pl.BlockSpec(
            (tile, 3 * n_atoms), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    in_specs = [x_spec] + [_full_spec(t) for t in tensors]
    if transposed_outputs:
        out_shapes = [
            jax.ShapeDtypeStruct((d_out, l_p), x.dtype),
            jax.ShapeDtypeStruct((3 * n_atoms, l_p), x.dtype),
        ]
        out_specs = [
            pl.BlockSpec((d_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_atoms, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
    else:
        out_shapes = [
            jax.ShapeDtypeStruct((l_p, d_out), x.dtype),
            jax.ShapeDtypeStruct((l_p, 3 * n_atoms), x.dtype),
        ]
        out_specs = [
            pl.BlockSpec((tile, d_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3 * n_atoms), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    y, gx = pl.pallas_call(
        functools.partial(
            _cv_forces_kernel, spec, align_idx, activation, n_atoms,
            component, transposed_in, transposed_outputs, remat,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xm, *tensors)
    if transposed_outputs:
        return y[:, :l], gx[:, :l]
    y, gx = y[:l], gx[:l]
    if not packed:
        gx = gx.reshape(l, n_atoms, 3)
    return y, gx
