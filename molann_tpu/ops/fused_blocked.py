"""Blocked fused align+feature+MLP Pallas kernels for LARGE systems.

The unrolled kernels in :mod:`molann_tpu.ops.fused` bake every gather index
and MLP weight in as an immediate — unbeatable for alanine-scale systems
but the Mosaic op count grows linearly with atoms x features and compile
time explodes past ~50 atoms / ~85 feature columns (round-1 ROADMAP #1).
This module is the scale formulation: the kernel's op count is O(1) in the
number of atoms and features, so a 300-atom / 240-feature peptide compiles
in seconds and still runs fused.

Design (TPU-first, no reference counterpart — the reference evaluates
features in a per-feature Python loop, molann/ann.py:473):

- **Gathers become one MXU matmul.** All per-feature atom gathers and
  coordinate differences (bond/angle/dihedral edge vectors, coordination
  pair differences) fold into a
  single constant *edge matrix* ``D [m, n]`` built on the host from the
  compiled spec: ``E_i = D @ x_i`` per component, where ``x`` is
  component-major ``[3, n, TILE]``. D is exactly 0/+-1, hence bf16-exact,
  so the matmul runs as a 3-pass hi/mid/lo split (f32-accurate at half the
  passes of ``Precision.HIGHEST`` — see :func:`_split3_mm`); one matmul
  per component replaces every gather in the model.
- **Feature math vectorizes over the feature axis.** Segments of E hold
  all r21/r23/r12/r23/r34 edge vectors stacked ``[n_feat, TILE]`` — the
  feature axis rides the sublanes, so bond norms, angle cosines, and
  dihedral cross products are full-tile VPU ops regardless of count.
- **Alignment covariance is a matmul** (``refT @ centered``), the QCP
  quaternion solve is the shared :func:`molann_tpu.ops.fused.qcp_rotation`
  chain on per-frame [1, TILE] rows, and the rotation applies to all
  position atoms at once as 9 broadcast multiply-adds on ``[np, TILE]``.
- **The MLP is MXU matmuls** on transposed activations ``[d, TILE]``; the
  static output-column permutation (feature-list order, reference
  molann/ann.py:473) folds into the first weight matrix for free.

Backward kernels evaluate ``jax.vjp`` of the same tile function *inside*
the kernel — the VJP of the edge matmul is ``D^T @ g_E`` (another matmul),
so gradients keep the O(1) op-count property. Parameter/ref gradients
accumulate across the sequential TPU grid into revisited output blocks.

Tile sizes need only be lane-aligned (multiples of 128) — the blocked
layout never folds the frame axis across sublanes, so the unrolled path's
1024-fold constraint does not apply; :func:`auto_tile` picks the largest
tile fitting a VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import CompiledFeatures
from .fused import qcp_rotation

__all__ = [
    "BlockedLayout",
    "blocked_layout",
    "auto_tile",
    "blocked_apply",
    "blocked_cv_forces",
    "blocked_train_grads",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(
        a, b, precision=_HIGHEST, preferred_element_type=jnp.float32
    )


def _bdot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bdot_t(a, b):
    """``a^T @ b`` for ``a [k, n], b [k, t] -> [n, t]`` WITHOUT
    materializing the transpose: dot_general contracting dim 0 of both
    operands — the MXU takes transposed layouts natively, whereas an
    explicit ``swapaxes`` inside the chunk loop costs a relayout copy
    per chunk."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _split3_mm_t(Cb, y, passes=3):
    """``Cb^T @ y`` with the same hi/mid/lo f32-split pass structure as
    :func:`_split3_mm` (Cb bf16-exact, y f32): the chunk backward's
    cotangent matmul, transpose-free."""
    hi32 = y.astype(jnp.bfloat16).astype(jnp.float32)
    if passes == 1:
        return _bdot_t(Cb, hi32.astype(jnp.bfloat16))
    r = y - hi32
    mid32 = r.astype(jnp.bfloat16).astype(jnp.float32)
    if passes == 2:
        acc = _bdot_t(Cb, mid32.astype(jnp.bfloat16))
        return acc + _bdot_t(Cb, hi32.astype(jnp.bfloat16))
    lo = (r - mid32).astype(jnp.bfloat16)
    acc = _bdot_t(Cb, lo)
    acc = acc + _bdot_t(Cb, mid32.astype(jnp.bfloat16))
    acc = acc + _bdot_t(Cb, hi32.astype(jnp.bfloat16))
    return acc


def _split3_mm(Db, x, passes=3):
    """f32-accurate matmul in <=3 MXU passes: ``Db [m, n] bf16 x x [n, T]
    f32``.

    Requires Db EXACTLY representable in bf16 (the edge matrix is 0/+-1 by
    construction — centroid subtraction happens in-kernel, not in D). x is
    split ``x = hi + mid + lo`` with each part bf16 (residual magnitude
    falls 2^-8 per level, so the dropped tail is ~2^-25 relative — at or
    below a single f32 rounding). Each pass is a native bf16xbf16->f32 MXU
    matmul; f32 ``Precision.HIGHEST`` costs 6 such passes for the same
    accuracy, so this is ~2x on the dominant matmuls.

    passes: 3 = f32-exact (default), 2 = ~2^-17 relative, 1 = plain bf16
    (~2^-9 relative — the opt-in reduced-precision training mode).
    """
    hi32 = x.astype(jnp.bfloat16).astype(jnp.float32)
    if passes == 1:
        return _bdot(Db, hi32.astype(jnp.bfloat16))
    r = x - hi32
    mid32 = r.astype(jnp.bfloat16).astype(jnp.float32)
    if passes == 2:
        acc = _bdot(Db, mid32.astype(jnp.bfloat16))
        return acc + _bdot(Db, hi32.astype(jnp.bfloat16))
    lo = (r - mid32).astype(jnp.bfloat16)
    acc = _bdot(Db, lo)
    acc = acc + _bdot(Db, mid32.astype(jnp.bfloat16))
    acc = acc + _bdot(Db, hi32.astype(jnp.bfloat16))
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _edges_op(passes, Db, DbT, x):
    """Edge matmul ``Db @ x`` with a matching-pass backward through the
    pre-transposed ``DbT`` (keeps the cotangent matmul at the same pass
    count — jax's automatic vjp would promote it to a 6-pass f32 dot)."""
    return _split3_mm(Db, x, passes)


def _edges_fwd(passes, Db, DbT, x):
    return _split3_mm(Db, x, passes), (Db, DbT)


def _edges_bwd(passes, res, g):
    Db, DbT = res
    return jnp.zeros_like(Db), jnp.zeros_like(DbT), _split3_mm(DbT, g, passes)


_edges_op.defvjp(_edges_fwd, _edges_bwd)

# precision name -> split passes for the edge matmuls
_PRECISION_PASSES = {"exact": 3, "tf32": 2, "bf16": 1}

# Coordination features with more pairs than this move their edge rows
# OUT of the resident matrix D into the separate chunk matrix C: their
# rows only feed a per-feature switching SUM, so the kernels can stream
# them ``lay.chunk`` rows at a time with per-chunk rematerialization —
# scoped VMEM stays O(chunk x tile) no matter how many pairs a
# condensed-phase contact CV has. (Resident-in-D, a 15504-pair layout
# measured 98 MB of scoped VMEM against the 16 MB limit.)
_COORD_RESIDENT_MAX = 512
# Largest streaming chunk (rows per DMA). The per-layout chunk size
# (BlockedLayout.chunk) shrinks from this when the active-atom width is
# large — see the selection loop in BlockedLayout.__init__.
_COORD_CHUNK = 512
# Windowed chunk matrix (r5): each pair row of a full-width chunk
# matrix spends c_cols bf16 MACs per pass on 2 useful entries. Bucketing
# pairs by (i // W, j // W) makes every bucket's rows hit two STATIC
# W-wide column windows, so the stream narrows to [rows, 2W] — the
# per-pair-row cost becomes O(W), independent of system size
# (c_cols/2W x fewer MACs and bytes: 2x at 10^3 atoms, 3.5x at 12^3,
# ~16x at 20^3). Engaged when c_cols >= 4W (below that the full-width
# stream is within 2x of optimal and stays the proven path).
_WIN_W = 256


def _window_groups(pairs, W):
    """Bucket pair rows by ``(i // W, j // W)``: every pair of a bucket
    reads atom columns inside the two static windows ``[bi*W, bi*W+W)``
    and ``[bj*W, bj*W+W)``. Returns ``[(oi, oj, [(i, j), ...]), ...]``
    sorted by bucket — the group list the windowed walks unroll over
    (offsets are python ints, so every slice in the kernel is static)."""
    groups = {}
    for (i, j) in pairs:
        groups.setdefault((i // W, j // W), []).append((i, j))
    return [(bi * W, bj * W, plist)
            for (bi, bj), plist in sorted(groups.items())]


# ---------------------------------------------------------------------------
# Host-side layout compiler: CompiledFeatures -> edge matrix + row plan
# ---------------------------------------------------------------------------


class BlockedLayout:
    """Static plan for the blocked kernels (host-side, hashable identity).

    Attributes:
      D: ``[m, n]`` float32 numpy edge matrix (per-component).
      Segment offsets into the m rows of ``E_i = D @ x_i``:
        ``o_r21/o_r23`` (na rows each), ``o_b`` (nb), ``o_d12/o_d23/o_d34``
        (nd each), ``o_c[k]`` (one aligned block of pair differences per
        coordination feature), ``o_al`` (n_align, centered align coords),
        ``o_pos`` (np, centered position coords).
      perm_b: ``[d]`` int64 — final feature column c reads PADDED blocked
        row ``perm_b[c]``. Blocked row order is type-grouped
        component-major with every block 8-row aligned: ``[angles | bonds |
        dih_cos.. | dih_sin.. (or phi..) | coord.. | pos_x.. | pos_y.. |
        pos_z..]``; ``d_pad`` total rows. The perm + padding fold into the first MLP
        weight matrix (zero columns for pad rows) — free at run time.
    """

    def __init__(self, spec: CompiledFeatures, align_idx):
        na = spec.n_angles
        nb = spec.n_bonds
        nd = spec.n_dihedrals
        nc = spec.n_coordinations
        npos = spec.n_position_atoms
        n = spec.n_input_atoms
        uav = spec.use_angle_value
        w = 1 if uav else 2

        self.na, self.nb, self.nd, self.npos = na, nb, nd, npos
        self.nc = nc
        # Per-coordination-feature static params ride the layout (baked
        # into the kernel as immediates, like the unrolled path).
        self.coord_params = tuple(spec.coord_params)
        self.coord_boxes = tuple(
            getattr(spec, "coord_boxes", None)
            or (None,) * len(spec.coord_slices)
        )
        self.coord_npairs = tuple(npairs for _, npairs in spec.coord_slices)
        self.coord_dmax = tuple(
            getattr(spec, "coord_dmax", None)
            or (None,) * len(spec.coord_slices)
        )
        self.n_atoms = n
        self.use_angle_value = uav
        # Alignment only matters for position features (bond/angle/dihedral
        # are rigid-motion invariant) — same rule as the unrolled kernels.
        self.has_align = align_idx is not None and npos > 0
        self.n_align = len(align_idx) if self.has_align else 0

        # Active-atom compaction: the kernel only ever reads atoms that a
        # feature (or the align subset) references. For a large system with
        # a modest CV set (the common production case: one protein, a few
        # dozen features) restricting the edge matmul and the VMEM x block
        # to the active atoms makes kernel cost scale with the FEATURE set,
        # not the system size. Columns of D are remapped; the wrappers
        # gather x[active] going in and scatter gx back to full width.
        #
        # The gather/scatter is a full extra HBM pass over the batch, so it
        # only pays off when the active set is a SMALL fraction of the
        # system; for moderately sparse sets the matmul formulation already
        # skips inactive atoms for free (zero columns of D). Measured on
        # peptide(60) (180/300 active, 2^19 frames, v5e): compacting at that
        # density cost 1.8x on fwd/train and 2x+ on cv+forces. Threshold
        # n_active <= n/4 keeps the win cases (e.g. 18/200) and none of the
        # losses.
        used = set()
        for row in spec.angle_idx:
            used.update(int(a) for a in row)
        for row in spec.bond_idx:
            used.update(int(a) for a in row)
        for row in spec.dihedral_idx:
            used.update(int(a) for a in row)
        for i, j in spec.coord_pairs:
            used.update((int(i), int(j)))
        used.update(int(a) for a in spec.position_idx)
        if self.has_align:
            used.update(int(a) for a in align_idx)
        active = np.asarray(sorted(used), dtype=np.int64)
        if active.size and 4 * active.size <= n:
            self.active_idx = active
            self.n_active = int(active.size)
            col = {int(a): k for k, a in enumerate(active)}
        else:
            self.active_idx = None
            self.n_active = n
            col = None

        def c(a):
            return col[int(a)] if col is not None else int(a)

        # Every segment offset is padded to a sublane multiple (8 f32 rows):
        # unaligned sublane slices/concats force Mosaic relayout copies on
        # EVERY op touching them (measured ~3x kernel slowdown); aligned
        # offsets make each segment view free. Pad rows of D are zero.
        def up8(v):
            return (v + 7) // 8 * 8

        o = 0
        self.o_r21 = o
        o = up8(o + na)
        self.o_r23 = o
        o = up8(o + na)
        self.o_b = o
        o = up8(o + nb)
        self.o_d12 = o
        o = up8(o + nd)
        self.o_d23 = o
        o = up8(o + nd)
        self.o_d34 = o
        o = up8(o + nd)
        # one 8-aligned edge block PER RESIDENT coordination feature (its
        # pair differences), so each feature's rows slice free of
        # relayouts; features past _COORD_RESIDENT_MAX pairs instead get
        # a block in the separate chunk matrix C (streamed by the
        # kernels — see _chunked_coord_rows)
        self.coord_resident = tuple(
            npairs <= _COORD_RESIDENT_MAX for npairs in self.coord_npairs
        )
        self.o_c = []
        for npairs, res in zip(self.coord_npairs, self.coord_resident):
            if res:
                self.o_c.append(o)
                o = up8(o + npairs)
            else:
                self.o_c.append(None)
        self.o_al = o
        o = up8(o + self.n_align)
        self.o_pos = o
        o = up8(o + npos)
        # all-chunked layouts (e.g. a model of only large coordination
        # features) would leave D with zero rows — Mosaic rejects
        # zero-size operands, so keep one all-zero sublane block
        self.m = max(o, 8)

        # Mosaic DMA slices must be lane-aligned: the chunk matrix's
        # column count pads to a multiple of 128 (zero columns; the
        # kernels pad x to match, so the padding is inert)
        self.c_cols = -(-self.n_active // 128) * 128

        # Padded blocked feature-row plan (same 8-alignment rationale —
        # computed BEFORE the streaming-chunk choice below so the chunk
        # model can use the worst-case kernel output width the layout
        # can see): [angles | bonds | dih_cos | dih_sin (or phi) |
        # pos_x | pos_y | pos_z], each block starting on a sublane
        # boundary; pad rows are zeros in the kernel (and zero columns
        # of the folded W1).
        f = 0
        self.f_ang = f
        f = up8(f + na)
        self.f_b = f
        f = up8(f + nb)
        self.f_d = f  # cos block (or phi when use_angle_value)
        f = up8(f + nd)
        if not uav:
            self.f_dsin = f
            f = up8(f + nd)
        self.f_c = f  # one row per coordination feature
        f = up8(f + nc) if nc else f
        self.f_pos = f  # 3 component blocks, each aligned
        pos_blk = up8(npos)
        f += 3 * pos_blk if npos else 0
        self.pos_blk = pos_blk
        self.d_pad = max(f, 8)

        # Per-layout streaming chunk size. 512 rows keeps each chunk DMA
        # big enough to hide under the chunk matmuls, but the two bf16
        # scratch slots (2 x chunk x c_cols) and the per-chunk
        # intermediates scale with the active-atom width: at
        # condensed-phase widths (every atom CV-active) a 512-row chunk
        # pushes the BACKWARD working set past auto_tile's 128-frame
        # minimum tile. Shrink per layout: the largest of 512/256/128
        # whose backward working set (the binding case — forward is
        # strictly smaller) still admits tile=128, using the SAME
        # calibrated cost model as auto_tile (see the `if lay.mc` block
        # there — measured against Mosaic scoped-allocation totals on
        # the 10^3-atom all-active layout), with the worst-case kernel
        # output width this layout can see (a no-MLP head writes d_pad
        # rows; MLP heads are almost always <= 128 for CV nets) standing
        # in for the d_out auto_tile sees at call time. Narrow layouts
        # (the 125-atom LJ demo) keep 512, so the recorded rates stand;
        # 10^3-atom all-active layouts land at 128 and fit (512 measured
        # 18.08 MB scoped vs the 16 MB limit); ~12^3 and beyond
        # genuinely exceed VMEM at any chunk — auto_tile then refuses
        # the backward with the XLA-path escape (the fused FORWARD
        # still fits well past that).
        # Windowed streaming (r5, see _WIN_W): at wide active widths the
        # pair rows bucket into static (i-window, j-window) groups and
        # the stream narrows to [rows, 2W]. Below the threshold the
        # proven full-width stream stays. Tentative here — the plan
        # build below can fall back when group padding would outweigh
        # the narrow stream (sparse features scattered over many
        # buckets).
        self.chunked = not all(self.coord_resident)
        self.windowed = self.chunked and self.c_cols >= 4 * _WIN_W
        self.win_w = _WIN_W if self.windowed else 0

        chunk = _COORD_CHUNK
        self.w_groups = [None] * nc
        mw = 0
        if self.windowed:
            W = self.win_w
            full_rows = 0
            for kf, (start, npairs) in enumerate(spec.coord_slices):
                if self.coord_resident[kf]:
                    continue
                full_rows += -(-npairs // chunk) * chunk
                cpairs = [(c(i), c(j)) for (i, j) in
                          spec.coord_pairs[start : start + npairs]]
                plans = []
                for (oi, oj, plist) in _window_groups(cpairs, W):
                    plans.append((mw, len(plist), oi, oj))
                    mw += -(-len(plist) // chunk) * chunk
                self.w_groups[kf] = tuple(plans)
            # group-tail padding guard: a feature whose pairs scatter
            # thinly over many buckets would pay more in chunk-padded
            # pad rows than the narrow stream saves — stay full-width
            # past 2x row inflation (the narrow stream wins c_cols/2W
            # >= 2x on MACs and bytes, so 2x rows is the break-even)
            if mw > 2 * full_rows:
                self.windowed = False
                self.win_w = 0
                self.w_groups = [None] * nc
                mw = 0
        self.mw = mw

        if self.chunked and not self.windowed:
            budget = 15_990_784
            d_worst = max(128, self.d_pad)
            # the shared calibrated backward model (_mc_bwd_cols):
            # single-buffered HBM x/gx + in-place gx accumulation.
            # Floor 32: sub-128 chunks trade DMA efficiency for
            # envelope — the 12^3 all-active regime runs at 128, and 32
            # keeps a margin beyond it before the XLA-escape refusal.
            # (Windowed layouts keep the full 512-row chunk: their
            # walk's scratch/intermediates scale with 2W, not c_cols.)
            base_cols = _mc_bwd_cols(
                self.c_cols, self.n_active, self.m, spec.out_dim, d_worst,
                0, self.c_cols)
            while chunk > 32:
                cols = base_cols + 3 * chunk * 3
                fixed = (4 * self.m * self.c_cols
                         + 4 * chunk * self.c_cols)
                if (budget - fixed) // (4 * cols) >= 128:
                    break
                chunk //= 2
        self.chunk = chunk

        # each chunked feature's block in C is padded to a multiple of
        # the chunk size (zero rows, masked in-kernel) so the fori_loop
        # walks fixed-size chunk-aligned slices. Windowed layouts put
        # ALL their chunked rows in the windowed matrix instead
        # (every pair fits its bucket's windows by construction).
        self.chunk_offs = []
        mc = 0
        for npairs, res in zip(self.coord_npairs, self.coord_resident):
            if res or self.windowed:
                self.chunk_offs.append(None)
            else:
                self.chunk_offs.append(mc)
                mc += -(-npairs // chunk) * chunk
        self.mc = mc

        # (w_groups — the per-feature windowed group plans of
        # (row_off, npairs, oi, oj) python ints the kernel walks unroll
        # over — were built with the windowed decision above.)

        # Chunked layouts take their x block PRE-PADDED to the chunk
        # matrix's lane-aligned column count (wrappers pad once outside
        # the kernel; D grows matching zero columns) — the in-kernel
        # [3, c_cols, T] pad copy was ~2.6 MB of scoped VMEM at
        # condensed widths. x_cols is the kernel-side x width (windowed
        # layouts round it up to a multiple of W so the last bucket's
        # window never reads past the padding). The gx writeback DMA's
        # row slices must be sublane-aligned: the kernel-side gx width
        # pads to a multiple of 8 (pad rows are exactly zero — they
        # come from zero pad columns of C/CW and D — and the wrappers
        # slice them off).
        if self.windowed:
            self.x_cols = -(-self.c_cols // self.win_w) * self.win_w
        else:
            self.x_cols = self.c_cols if self.chunked else self.n_active
        self.gx_pad = up8(self.n_active) if self.chunked else self.n_active

        D = np.zeros((self.m, self.x_cols), dtype=np.float32)
        for k, (a0, a1, a2) in enumerate(spec.angle_idx):
            D[self.o_r21 + k, c(a0)] += 1.0  # r21 = x[a0] - x[a1]
            D[self.o_r21 + k, c(a1)] -= 1.0
            D[self.o_r23 + k, c(a2)] += 1.0  # r23 = x[a2] - x[a1]
            D[self.o_r23 + k, c(a1)] -= 1.0
        for k, (a0, a1) in enumerate(spec.bond_idx):
            D[self.o_b + k, c(a1)] += 1.0  # ||x[a1] - x[a0]||
            D[self.o_b + k, c(a0)] -= 1.0
        for k, (a0, a1, a2, a3) in enumerate(spec.dihedral_idx):
            D[self.o_d12 + k, c(a1)] += 1.0
            D[self.o_d12 + k, c(a0)] -= 1.0
            D[self.o_d23 + k, c(a2)] += 1.0
            D[self.o_d23 + k, c(a1)] -= 1.0
            D[self.o_d34 + k, c(a3)] += 1.0
            D[self.o_d34 + k, c(a2)] -= 1.0
        C = np.zeros((mc, self.c_cols), dtype=np.float32) if mc else None
        CW = np.zeros((mw, 2 * self.win_w), dtype=np.float32) if mw else None
        for kf, (start, npairs) in enumerate(spec.coord_slices):
            if self.coord_resident[kf]:
                base = self.o_c[kf]
                for p, (i, j) in enumerate(
                    spec.coord_pairs[start : start + npairs]
                ):
                    D[base + p, c(j)] += 1.0  # d = x[j] - x[i]
                    D[base + p, c(i)] -= 1.0
            elif self.windowed:
                # windowed rows: [-1 at i-oi | +1 at W + (j-oj)] so
                # d = CW_chunk @ concat(x[oi:oi+W], x[oj:oj+W])
                W = self.win_w
                cpairs = [(c(i), c(j)) for (i, j) in
                          spec.coord_pairs[start : start + npairs]]
                for (row_off, np_g, oi, oj), (_, _, plist) in zip(
                        self.w_groups[kf], _window_groups(cpairs, W)):
                    for p, (i, j) in enumerate(plist):
                        CW[row_off + p, i - oi] -= 1.0
                        CW[row_off + p, W + (j - oj)] += 1.0
            else:
                base = self.chunk_offs[kf]
                for p, (i, j) in enumerate(
                    spec.coord_pairs[start : start + npairs]
                ):
                    C[base + p, c(j)] += 1.0  # d = x[j] - x[i]
                    C[base + p, c(i)] -= 1.0
        self.C = C
        self.CW = CW
        if self.has_align:
            # raw gathers only — the centroid subtraction happens in-kernel
            # so D stays exactly 0/+-1 (bf16-exact, enabling the 3-pass
            # split matmul)
            for k, a in enumerate(align_idx):
                D[self.o_al + k, c(a)] += 1.0
        for k, a in enumerate(spec.position_idx):
            D[self.o_pos + k, c(a)] += 1.0
        self.D = D

        # blocked PADDED row index for each spec-intermediate row
        d = spec.out_dim
        s2b = np.empty(d, dtype=np.int64)
        s2b[:na] = self.f_ang + np.arange(na)
        s2b[na : na + nb] = self.f_b + np.arange(nb)
        base_s = na + nb
        if uav:
            s2b[base_s : base_s + nd] = self.f_d + np.arange(nd)
        else:
            for k in range(nd):
                s2b[base_s + 2 * k] = self.f_d + k
                s2b[base_s + 2 * k + 1] = self.f_dsin + k
        base_s = na + nb + w * nd
        s2b[base_s : base_s + nc] = self.f_c + np.arange(nc)
        base_s = na + nb + w * nd + nc
        for a in range(npos):
            for i in range(3):
                s2b[base_s + 3 * a + i] = self.f_pos + i * pos_blk + a
        spec_perm = (
            np.asarray(spec.perm, dtype=np.int64)
            if spec.perm is not None
            else np.arange(d)
        )
        self.perm_b = s2b[spec_perm]
        self.out_dim = d


@functools.lru_cache(maxsize=64)
def blocked_layout(spec: CompiledFeatures, align_idx) -> BlockedLayout:
    return BlockedLayout(spec, align_idx)


def _mc_bwd_cols(x_cols, n_active, m, out_dim, d_out, chunk, c_cols):
    """f32 columns-per-frame of the chunked backward/cv+forces kernels —
    the ONE calibrated VMEM cost model, shared by :func:`auto_tile` and
    the layout's streaming-chunk selection so the two cannot drift.

    Terms (r5 kernel structure — single-buffered HBM x/gx via in-kernel
    DMA, in-place gx accumulation):
      - ``3 * x_cols * 2``: the x VMEM scratch plus its read
        materialization in the tile math
      - ``3 * n_active``: the gx accumulation scratch (single-buffered)
      - ``3 * m * 5``: edge rows through forward + vjp
      - ``out_dim * 3 + d_out``: feature rows / head output + residuals
      - ``3 * chunk * 3``: per-chunk walk intermediates (r, d, scale)
      - ``3 * c_cols * 2``: the pullback matmul temp and the
        read-modify-write temps of the in-place accumulation
    Calibration history: the r4 structure (windowed I/O + functional
    carry) measured 16.23 MB at the 12^3 all-active layout, 17.84 MB
    with grid double-buffering — refused; this structure's model puts
    12^3 at ~15.3 MB under the 15,990,784-byte budget (verified
    compiling + running on HW, tile=128/chunk=128). The last parameter
    is the STREAM width: c_cols for full-width walks, 2W for windowed
    ones (whose callers add 2 more stream-scaled copies for the
    per-group xcat concats + window read-modify-write temps — the 12^3
    windowed forward measured 18.65 MB at tile=256 without that term;
    tile=128 runs)."""
    return (3 * x_cols * 2
            + 3 * n_active
            + 3 * m * 5 + out_dim * 3 + d_out
            + 3 * chunk * 3
            + 3 * c_cols * 2)


def auto_tile(lay: BlockedLayout, d_out: int, *, backward: bool,
              budget_bytes=None) -> int:
    """Largest lane-aligned tile whose working set fits a VMEM budget.

    Rough model (f32 columns per frame): the x block (3n) + edge matrix
    rows (m per component, live twice through the math), feature rows,
    output — times ~2.5 extra for vjp residuals in backward kernels. The
    model tracks measured scoped-VMEM within ~10% (e.g. peptide(60)
    backward at tile=512 measured 21 MB vs 22.9 predicted); the budget
    leaves headroom under the 16 MB VMEM for Mosaic's own scratch.
    Measured on peptide(60): tile=256 is also the throughput sweet spot
    (14.0M f/s vs 13.4M at 128 and 11.1M at 384).

    budget_bytes: ``None`` (the default) resolves per path — 14 MiB for
    the resident model, 15,990,784 B for the chunked backward whose
    calibrated model is accurate to ~0.4 MB; an explicit value is
    honored as given.
    """
    explicit_budget = budget_bytes is not None
    if not explicit_budget:
        budget_bytes = 14 * 1024 * 1024
    cols = 3 * lay.x_cols + 3 * lay.m * 2 + lay.out_dim + d_out
    if backward:
        cols = 3 * lay.x_cols * 2 + 3 * lay.m * 5 + lay.out_dim * 3 + d_out
    fixed = lay.D.size * 2 * 2  # D + DT resident (bf16)
    if lay.chunked:
        # chunked coordination — see _mc_bwd_cols for the calibrated
        # backward model (single-buffered HBM x/gx + in-place gx
        # accumulation). Fixed terms: two bf16 DMA scratch slots
        # (chunk x stream-width — the streamed matrix itself STAYS IN
        # HBM as a pl.ANY operand) and the widened D. Windowed layouts
        # (lay.windowed) replace every c_cols-scaled walk term with
        # 2W-scaled ones: the stream is [rows, 2W], the xcat/pullback
        # temps are [2W, T], and the gx stores touch W-wide windows.
        stream_w = 2 * lay.win_w if lay.windowed else lay.c_cols
        win_extra = 3 * stream_w * 2 if lay.windowed else 0
        if backward:
            cols = _mc_bwd_cols(lay.x_cols, lay.n_active, lay.m,
                                lay.out_dim, d_out, lay.chunk, stream_w)
            cols += win_extra
        else:
            cols += 3 * lay.chunk * 2 + 3 * stream_w * 3 + win_extra
        fixed += 2 * lay.chunk * stream_w * 2
        if backward and not explicit_budget:
            # the chunked-backward model predicts measured scoped
            # totals within ~0.5 MB (vs the ~10% slack of the rough
            # resident model), so its default budget sits 0.5 MiB under
            # the 16 MiB hard limit instead of 2 MiB
            budget_bytes = 15_990_784
    tile = (budget_bytes - fixed) // (4 * cols)
    if tile < 128:
        raise ValueError(
            f"blocked kernel working set does not fit VMEM: the fixed "
            f"allocations (the [{lay.m}, {lay.n_active}] edge matrix"
            + (f" + 2 x [{lay.chunk}, "
               f"{2 * lay.win_w if lay.windowed else lay.c_cols}] "
               f"chunk scratch" if lay.chunked else "")
            + f") need {fixed / 2**20:.1f} MB of the "
            f"{budget_bytes / 2**20:.0f} MB budget, and the per-frame "
            f"working set ({4 * cols} B/frame) does not admit the "
            f"128-frame minimum tile. This system/feature-set is past "
            f"the fused envelope — use the XLA path (model(x) / "
            f"jax.grad), or restrict the feature set so active-atom "
            f"compaction engages (active_atom_indices(model))."
        )
    # round DOWN to a power of two: non-power-of-two tiles measured ~20%
    # slower (e.g. peptide(60) fwd: 23.0M at 256, 18.2M at 384, 23.3M at
    # 512 frames/s)
    p = 128
    while p * 2 <= tile and p < 2048:
        p *= 2
    return int(p)


# ---------------------------------------------------------------------------
# Tile math (component-major blocks)
# ---------------------------------------------------------------------------


def _seg_plan(lay: BlockedLayout):
    """Ordered (name, row offset, rows) of the segments the layout uses.

    The order is ascending in offset, which lets :func:`_assemble_gE`
    rebuild a full-height cotangent by concatenation (with zero pad rows
    in the 8-alignment gaps) instead of autodiff's pad+add chains.
    """
    plan = []
    if lay.na:
        plan += [("r21", lay.o_r21, lay.na), ("r23", lay.o_r23, lay.na)]
    if lay.nb:
        plan += [("b", lay.o_b, lay.nb)]
    if lay.nd:
        plan += [
            ("d12", lay.o_d12, lay.nd),
            ("d23", lay.o_d23, lay.nd),
            ("d34", lay.o_d34, lay.nd),
        ]
    for k in range(lay.nc):
        if lay.coord_resident[k]:
            plan += [(f"c{k}", lay.o_c[k], lay.coord_npairs[k])]
    if lay.has_align:
        plan += [("al", lay.o_al, lay.n_align)]
    if lay.npos:
        plan += [("pos", lay.o_pos, lay.npos)]
    return plan


def _slice_segments(E, lay: BlockedLayout):
    """3-tuple (per component) of per-segment views of the edge rows."""
    plan = _seg_plan(lay)
    return tuple(
        tuple(E[i][o : o + k] for (_, o, k) in plan) for i in range(3)
    )


def _assemble_gE(gsegs, lay: BlockedLayout, T, dtype):
    """Segment cotangents -> full [m, T] per component, by concatenation.

    This is the manual VJP of :func:`_slice_segments`: taking jax.vjp
    through the slices instead would emit one full-height pad PLUS one
    full-height add PER SEGMENT PER COMPONENT (18 of each on peptide-scale
    layouts — measured ~40% of the whole backward kernel); a single
    concat per component is one VMEM write of the same rows.
    """
    plan = _seg_plan(lay)
    out = []
    for i in range(3):
        blocks, row = [], 0
        for (_, o, k), g in zip(plan, gsegs[i]):
            if o > row:
                blocks.append(jnp.zeros((o - row, T), dtype))
            blocks.append(g)
            row = o + k
        if row < lay.m:
            blocks.append(jnp.zeros((lay.m - row, T), dtype))
        out.append(
            blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 0)
        )
    return out


def _chunk_geometry(passes, box, Ck, x3):
    """One chunk's (minimum-image) pair distances: ``Ck [cc, n] bf16,
    x3 [3, n, T] -> (r [cc, T], d 3-tuple of [cc, T])``. Pad rows of C
    are all-zero, giving r == 0 — callers mask them."""
    from .features import min_image_components

    d = tuple(_split3_mm(Ck, x3[i], passes) for i in range(3))
    if box is not None:
        d = min_image_components(d, box)
    r = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    return r, d


def _chunk_valid(i, npairs, dtype, chunk):
    """[chunk, 1] mask of the real (non-pad) rows of chunk i."""
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    return (i * chunk + row < npairs).astype(dtype)


def _chunk_walk(c_ref, off, npairs, body_fn, init, chunk):
    """Double-buffered walk over ONE chunked feature's pair rows.

    ``c_ref`` lives in HBM (``pl.ANY`` operand — the chunk matrix never
    occupies VMEM as a whole): two ``[chunk, n]`` bf16 scratch
    slots alternate, the NEXT chunk's DMA starting before the current
    chunk computes, so the copy rides under the matmuls (at kernel
    shapes the chunk DMA is ~5 us against ~100 us of chunk compute).
    ``body_fn(i, Ck, carry) -> carry`` runs per chunk inside a
    ``fori_loop`` — one chunk's intermediates live at a time, which is
    what keeps scoped VMEM bounded for ANY pair count.
    """
    n_chunks = -(-npairs // chunk)

    def scoped(scratch, sem):
        def dma(slot, i):
            return pltpu.make_async_copy(
                c_ref.at[pl.ds(off + i * chunk, chunk), :],
                scratch.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()

        def body(i, carry):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma(nxt, i + 1).start()

            dma(slot, i).wait()
            return body_fn(i, scratch[slot], carry)

        return jax.lax.fori_loop(0, n_chunks, body, init)

    return pl.run_scoped(
        scoped,
        scratch=pltpu.VMEM((2, chunk, c_ref.shape[1]),
                           jnp.bfloat16),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _coord_feature_sum(passes, box, r0, nn, mm, dmax, off, npairs, c_ref,
                       x3, chunk):
    """Switching sum of ONE chunked coordination feature:
    ``c_ref [mc, n] bf16 HBM ref (rows off..off+npairs are its pairs),
    x3 [3, n, T] -> [1, T]``.

    Chunks stream through :func:`_chunk_walk`, so only one chunk's
    intermediates are ever live — Mosaic's stack allocator reuses the
    loop body's slots, keeping scoped VMEM at O(chunk x tile) however
    many pairs the feature has (a fully unrolled 15504-row layout
    measured 98 MB against the 16 MB limit, and unrolled data-
    independent per-chunk slices still measured 93 MB: the scheduler
    does not serialize them — the loop is what bounds it).

    NOT differentiable (fori_loop has no reverse rule, and Mosaic can
    lower neither remat2 nor closure-carrying custom_vjp calls): the
    kernels differentiate their feature math w.r.t. the returned ROW
    and hand the row cotangent to :func:`_coord_feature_sum_bwd`, the
    explicit manual-remat backward loop.
    """
    from .features import switching_function

    def body(i, Ck, acc):
        r, _ = _chunk_geometry(passes, box, Ck, x3)
        s = switching_function(r, r0, nn, mm, dmax)
        return acc + jnp.sum(s * _chunk_valid(i, npairs, s.dtype, chunk),
                             axis=0, keepdims=True)

    return _chunk_walk(c_ref, off, npairs, body,
                       jnp.zeros((1, x3.shape[2]), x3.dtype), chunk)


def _coord_feature_sum_bwd(passes, box, r0, nn, mm, dmax, off, npairs,
                           c_ref, x3, gy, chunk, out_ref, n_keep):
    """x-cotangent of :func:`_coord_feature_sum` given the row cotangent
    ``gy [1, T]``: recomputes each chunk's geometry (manual remat)
    before the analytic pullback — plain ops in the same streamed chunk
    walk, nothing saved between chunks.

    The cotangent ACCUMULATES IN PLACE into ``out_ref[:, :n_keep, :]``
    (the kernel's VMEM-resident gx output block, pre-seeded with the
    resident-edge contribution) rather than through a functional
    ``[3, c_cols, T]`` fori_loop carry: the carry's double-buffered
    copies plus the stack/add temps were the VMEM-binding term at
    condensed widths (auto_tile's r4 model charged ~7 tile-scaled
    copies of ``[3, c_cols, T]``; the in-place walk leaves the padded x
    and one per-component ``[c_cols, T]`` matmul temp — measured ~3).
    This is what moves the fused cv+forces envelope past the 12^3-atom
    all-active wall (r4 VERDICT #4)."""
    from .features import switching_function

    def body(i, Ck, carry):
        r, d = _chunk_geometry(passes, box, Ck, x3)  # remat
        # minimum-image shifts are piecewise constant (round()), so the
        # pullback through them is the identity: gd on the shifted d IS
        # gd on the raw edge rows
        _, pull = jax.vjp(
            lambda rr: switching_function(rr, r0, nn, mm, dmax), r
        )
        (gr,) = pull(jnp.broadcast_to(gy, r.shape))
        # pad rows have r == 0: mask their cotangent and guard the
        # division (real pairs are distinct atoms, r > 0)
        scale = gr * _chunk_valid(i, npairs, r.dtype, chunk) / jnp.maximum(
            r, jnp.asarray(1e-20, r.dtype)
        )
        # per component: one [c_cols, T] temp at a time (no 3-stack)
        for j in range(3):
            upd = _split3_mm_t(Ck, scale * d[j], passes)
            out_ref[j, :, :] = out_ref[j, :, :] + upd[:n_keep]
        return carry

    _chunk_walk(c_ref, off, npairs, body,
                jnp.zeros((), x3.dtype), chunk)


def _windowed_feature_sum(passes, box, r0, nn, mm, dmax, groups, c_ref,
                          x3, chunk, W):
    """Switching sum of ONE windowed coordination feature: the group
    loop is unrolled (static window offsets), each group streaming its
    chunk-padded ``[rows, 2W]`` block of the windowed matrix through
    :func:`_chunk_walk`. Per pair row this costs 2W MACs per pass
    instead of c_cols — O(1) in system size."""
    from .features import switching_function

    T = x3.shape[2]
    acc = jnp.zeros((1, T), x3.dtype)
    for (row_off, npairs, oi, oj) in groups:
        xcat = tuple(
            jnp.concatenate(
                [x3[i, oi : oi + W, :], x3[i, oj : oj + W, :]], axis=0)
            for i in range(3)
        )

        def body(i, Ck, a, xcat=xcat, npairs=npairs):
            d = tuple(_split3_mm(Ck, xcat[j], passes) for j in range(3))
            if box is not None:
                from .features import min_image_components

                d = min_image_components(d, box)
            r = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
            s = switching_function(r, r0, nn, mm, dmax)
            return a + jnp.sum(
                s * _chunk_valid(i, npairs, s.dtype, chunk),
                axis=0, keepdims=True)

        acc = _chunk_walk(c_ref, row_off, npairs, body, acc, chunk)
    return acc


def _windowed_feature_sum_bwd(passes, box, r0, nn, mm, dmax, groups, c_ref,
                              x3, gy, chunk, W, out_ref, n_keep):
    """x-cotangent of :func:`_windowed_feature_sum` (manual remat, same
    group unroll), accumulated IN PLACE into
    ``out_ref[:, :n_keep, :]`` — every store is a STATIC window slice.
    Window tails past ``n_keep`` (x pad columns) carry exactly-zero
    cotangents and are clipped."""
    from .features import switching_function

    for (row_off, npairs, oi, oj) in groups:
        xcat = tuple(
            jnp.concatenate(
                [x3[i, oi : oi + W, :], x3[i, oj : oj + W, :]], axis=0)
            for i in range(3)
        )
        wi = min(W, n_keep - oi)  # clip stores to the real gx rows
        wj = min(W, n_keep - oj)

        def body(i, Ck, carry, xcat=xcat, npairs=npairs, oi=oi, oj=oj,
                 wi=wi, wj=wj):
            d = tuple(_split3_mm(Ck, xcat[j], passes) for j in range(3))
            if box is not None:
                from .features import min_image_components

                d = min_image_components(d, box)
            r = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
            _, pull = jax.vjp(
                lambda rr: switching_function(rr, r0, nn, mm, dmax), r
            )
            (gr,) = pull(jnp.broadcast_to(gy, r.shape))
            scale = gr * _chunk_valid(i, npairs, r.dtype, chunk) \
                / jnp.maximum(r, jnp.asarray(1e-20, r.dtype))
            for j in range(3):
                g2 = _split3_mm_t(Ck, scale * d[j], passes)  # [2W, T]
                if wi > 0:
                    out_ref[j, oi : oi + wi, :] = (
                        out_ref[j, oi : oi + wi, :] + g2[:wi])
                if wj > 0:
                    out_ref[j, oj : oj + wj, :] = (
                        out_ref[j, oj : oj + wj, :] + g2[W : W + wj])
            return carry

        _chunk_walk(c_ref, row_off, npairs, body,
                    jnp.zeros((), x3.dtype), chunk)


def _pad_cols(lay: BlockedLayout, x_blk):
    """Pad x to the chunk matrix's lane-aligned column count (the pad
    columns of C are zero, so the extra rows are inert)."""
    n = x_blk.shape[1]
    if lay.c_cols == n:
        return x_blk
    return jnp.pad(x_blk, ((0, 0), (0, lay.c_cols - n), (0, 0)))


def _chunked_coord_rows(lay: BlockedLayout, passes, x_blk, c_ref):
    """Switching sums of the chunked (large-pair-count) coordination
    features: ``-> {feature_index: [1, T]}`` — see
    :func:`_coord_feature_sum` / :func:`_windowed_feature_sum`.
    ``c_ref`` is the streamed-matrix HBM REF (full-width C, or the
    windowed CW when ``lay.windowed``; chunks stream per loop step,
    never materialized whole). NOT differentiable — kernels treat the
    rows as vjp arguments and push the row cotangents through
    :func:`_chunked_coord_grads`."""
    rows = {}
    x3p = _pad_cols(lay, x_blk)
    for k in range(lay.nc):
        if lay.coord_resident[k]:
            continue
        r0, nn, mm = lay.coord_params[k]
        if lay.windowed:
            rows[k] = _windowed_feature_sum(
                passes, lay.coord_boxes[k], r0, nn, mm, lay.coord_dmax[k],
                lay.w_groups[k], c_ref, x3p, lay.chunk, lay.win_w,
            )
        else:
            rows[k] = _coord_feature_sum(
                passes, lay.coord_boxes[k], r0, nn, mm, lay.coord_dmax[k],
                lay.chunk_offs[k], lay.coord_npairs[k], c_ref, x3p,
                lay.chunk,
            )
    return rows


def _chunked_coord_grads(lay: BlockedLayout, passes, x_blk, c_ref, g_rows,
                         gx_ref):
    """Accumulate the x-cotangent of the chunked coordination rows into
    the kernel's gx output block ``gx_ref [3, n_active, T]`` (already
    seeded with the resident-edge contribution), given the row
    cotangents ``g_rows {feature_index: [1, T]}``. In-place — see
    :func:`_coord_feature_sum_bwd` for why."""
    x3p = _pad_cols(lay, x_blk)
    for k, gy in g_rows.items():
        r0, nn, mm = lay.coord_params[k]
        if lay.windowed:
            _windowed_feature_sum_bwd(
                passes, lay.coord_boxes[k], r0, nn, mm, lay.coord_dmax[k],
                lay.w_groups[k], c_ref, x3p, gy, lay.chunk, lay.win_w,
                gx_ref, gx_ref.shape[1],
            )
        else:
            _coord_feature_sum_bwd(
                passes, lay.coord_boxes[k], r0, nn, mm, lay.coord_dmax[k],
                lay.chunk_offs[k], lay.coord_npairs[k], c_ref, x3p, gy,
                lay.chunk, gx_ref, gx_ref.shape[1],
            )


def _feats_from_segs(segs, tensors, lay: BlockedLayout, activation, T,
                     dtype, coord_rows=None):
    """Per-type feature math + MLP on pre-sliced segments: ``-> [k, T]``.

    segs: 3-tuple (component) of per-:func:`_seg_plan` segment arrays.
    tensors: ``([refT] + [W1', b1, W2, b2, ...])`` — refT is ``ref_x.T``
    [3, n_align]; W1' has its input columns pre-permuted/padded so the
    blocked row layout feeds it directly. With no MLP the result is the
    PADDED feature rows in blocked order (callers gather the real columns
    outside). coord_rows: precomputed ``[1, T]`` rows of the CHUNKED
    coordination features (:func:`_chunked_coord_rows`), keyed by
    feature index.
    """
    names = [name for (name, _, _) in _seg_plan(lay)]
    S = {name: [segs[i][j] for i in range(3)] for j, name in enumerate(names)}

    if lay.has_align:
        refT, rest = tensors[0], tensors[1:]
    else:
        refT, rest = None, tensors

    blocks = []
    row = [0]

    def put(block, at):
        # keep every block on its padded (sublane-aligned) start row
        if at > row[0]:
            blocks.append(jnp.zeros((at - row[0], T), dtype))
        blocks.append(block)
        row[0] = at + block.shape[0]

    if lay.na:
        r21, r23 = S["r21"], S["r23"]
        dot = sum(r21[i] * r23[i] for i in range(3))
        # rsqrt of the product of square-norms: one transcendental + two
        # mults replaces 2x sqrt + 1x divide (TPU divides are multi-pass)
        q21 = sum(r21[i] * r21[i] for i in range(3))
        q23 = sum(r23[i] * r23[i] for i in range(3))
        cos = dot * jax.lax.rsqrt(q21 * q23)
        put(jnp.arccos(cos) if lay.use_angle_value else cos, lay.f_ang)
    if lay.nb:
        b = S["b"]
        put(jnp.sqrt(sum(b[i] * b[i] for i in range(3))), lay.f_b)
    if lay.nd:
        r12, r23, r34 = S["d12"], S["d23"], S["d34"]
        n1 = [
            r12[1] * r23[2] - r12[2] * r23[1],
            r12[2] * r23[0] - r12[0] * r23[2],
            r12[0] * r23[1] - r12[1] * r23[0],
        ]
        n2 = [
            r23[1] * r34[2] - r23[2] * r34[1],
            r23[2] * r34[0] - r23[0] * r34[2],
            r23[0] * r34[1] - r23[1] * r34[0],
        ]
        cos_phi = sum(n1[i] * n2[i] for i in range(3))
        sin_phi = sum(n1[i] * r34[i] for i in range(3)) * jnp.sqrt(
            sum(r23[i] * r23[i] for i in range(3))
        )
        if lay.use_angle_value:
            put(jnp.arctan2(sin_phi, cos_phi), lay.f_d)
        else:
            # normalize via one rsqrt + two mults (vs sqrt + two divides)
            rinv = jax.lax.rsqrt(cos_phi * cos_phi + sin_phi * sin_phi)
            put(cos_phi * rinv, lay.f_d)
            put(sin_phi * rinv, lay.f_dsin)
    if lay.nc:
        # one row per coordination feature: switching-function sum over
        # its pair-difference edge rows (params are immediates; the
        # switching math and minimum image are the SHARED helpers in
        # ops.features — one implementation across all compute paths).
        # Resident features read their pre-sliced segment; chunked ones
        # arrive precomputed in coord_rows.
        from .features import min_image_components, switching_function

        rows = []
        for k in range(lay.nc):
            if not lay.coord_resident[k]:
                rows.append(coord_rows[k])
                continue
            d = tuple(S[f"c{k}"][i] for i in range(3))
            box = lay.coord_boxes[k]
            if box is not None:
                d = min_image_components(d, box)
            r0, nn, mm = lay.coord_params[k]
            r = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
            s = switching_function(r, r0, nn, mm, lay.coord_dmax[k])
            rows.append(jnp.sum(s, axis=0, keepdims=True))
        put(jnp.concatenate(rows, 0) if len(rows) > 1 else rows[0],
            lay.f_c)
    if lay.npos:
        V = list(S["pos"])
        if lay.has_align:
            C = list(S["al"])
            # centroid of the align subset (D rows are raw gathers)
            c = [
                jnp.sum(C[i], axis=0, keepdims=True) / float(lay.n_align)
                for i in range(3)
            ]
            C = [C[i] - c[i] for i in range(3)]
            V = [V[i] - c[i] for i in range(3)]
            # covariance H[i][j] = sum_n centered[n, i] * ref[n, j]
            Hm = [_dot(refT, C[i]) for i in range(3)]  # [3, T] each
            H = [[Hm[i][j : j + 1] for j in range(3)] for i in range(3)]
            R = qcp_rotation(H)  # [1, T] entries, broadcast over sublanes
            V = [
                V[0] * R[0][i] + V[1] * R[1][i] + V[2] * R[2][i]
                for i in range(3)
            ]
        for i in range(3):
            put(V[i], lay.f_pos + i * lay.pos_blk)
    if row[0] < lay.d_pad:
        blocks.append(jnp.zeros((lay.d_pad - row[0], T), dtype))

    feats = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, 0)
    h = feats
    n_layers = len(rest) // 2
    for li in range(n_layers):
        w, b = rest[2 * li], rest[2 * li + 1]
        h = _dot(w, h) + b
        if li < n_layers - 1:
            h = activation(h)
    return h


def _blk_forward(x_cmaj, D, DT, tensors, lay: BlockedLayout, activation,
                 passes=3, c_ref=None):
    """Fused forward on one tile: ``x [3, n, T] -> [k, T]``.

    D/DT: bf16 edge matrix and its transpose (DT feeds the backward's
    cotangent matmul). C: bf16 chunk matrix of the chunked coordination
    features (present iff ``lay.chunked``). See :func:`_feats_from_segs` for
    the tensor list convention.
    """
    E = [_edges_op(passes, D, DT, x_cmaj[i]) for i in range(3)]  # 3 x [m, T]
    segs = _slice_segments(E, lay)
    coord_rows = (_chunked_coord_rows(lay, passes, x_cmaj, c_ref)
                  if lay.chunked else None)
    return _feats_from_segs(
        segs, tensors, lay, activation, x_cmaj.shape[2], x_cmaj.dtype,
        coord_rows=coord_rows,
    )


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _blk_fwd_kernel(lay, activation, passes, x_ref, d_ref, dt_ref, *rest):
    if lay.chunked:
        c_ref, *rest = rest
    else:
        c_ref = None
    y_ref = rest[-1]
    tensors = [r[:] for r in rest[:-1]]
    y_ref[:] = _blk_forward(
        x_ref[:], d_ref[:], dt_ref[:], tensors, lay, activation, passes,
        c_ref=c_ref,
    )


def _blk_bwd_kernel(lay, activation, passes, x_ref, gy_ref, d_ref, dt_ref,
                    *rest):
    # rest = ([c_ref], *tensor_in_refs, gx_ref, *gtensor_out_refs
    #         [, xs, gxs, sem_in, sem_out])   (scratch when lay.mc)
    if lay.chunked:
        c_ref, *rest = rest
        *rest, xs, gxs, sem_in, sem_out = rest
    n_t = (len(rest) - 1) // 2
    tensor_in = [r[:] for r in rest[:n_t]]
    gx_ref = rest[n_t]
    gtensor_refs = rest[n_t + 1 :]
    D, DT = d_ref[:], dt_ref[:]

    def tile_math(x_blk, gx_out):
        # Differentiate w.r.t. the SEGMENTS (explicit vjp arguments),
        # not x: autodiff through the slices would pad each segment
        # cotangent back to full height and add them (one pad + one add
        # per segment per component); instead the disjoint segment
        # grads concatenate into gE and one transposed edge matmul per
        # component yields gx. The chunked coordination rows DO
        # differentiate w.r.t. x directly (their edge rows never
        # materialize as segments); their x-cotangent accumulates into
        # gx_out in place.
        T = x_blk.shape[2]
        E = [_split3_mm(D, x_blk[i], passes) for i in range(3)]
        segs = _slice_segments(E, lay)

        if lay.chunked:
            # chunked coordination rows enter the vjp as ARGUMENTS
            # (tiny [1, T] rows); their cotangents drive the explicit
            # manual-remat backward loop for the x contribution
            coord_rows = _chunked_coord_rows(lay, passes, x_blk, c_ref)

            def f(sg, cr, tensors):
                return _feats_from_segs(sg, tensors, lay, activation, T,
                                        x_blk.dtype, coord_rows=cr)

            _, vjp = jax.vjp(f, segs, coord_rows, tensor_in)
            gsegs, g_rows, gtensors = vjp(gy_ref[:])
        else:
            def f(sg, tensors):
                return _feats_from_segs(sg, tensors, lay, activation, T,
                                        x_blk.dtype)

            _, vjp = jax.vjp(f, segs, tensor_in)
            gsegs, gtensors = vjp(gy_ref[:])
            g_rows = None
        gE = _assemble_gE(gsegs, lay, T, x_blk.dtype)
        gx_out[:] = jnp.stack(
            [_split3_mm(DT, gE[i], passes)[: gx_out.shape[1]]
             for i in range(3)],
            axis=0,
        )
        if g_rows:
            # chunked pullback accumulates straight into gx_out
            _chunked_coord_grads(lay, passes, x_blk, c_ref, g_rows,
                                 gx_out)
        return gtensors

    if lay.chunked:
        # Condensed widths: x and gx ride as HBM (pl.ANY) operands with
        # ONE single-buffered VMEM scratch each (kernel-level
        # scratch_shapes) — the standard blocked I/O double-buffers
        # both windows across grid steps, which at c_cols ~ 1800 is
        # ~11 MB of the 16 MB VMEM on its own (measured 17.84 MB total
        # at 12^3 with windowed I/O vs the model's ~15.3 MB here). The
        # tile DMAs are microseconds against the chunk-walk matmuls, so
        # the lost overlap is noise.
        T = gy_ref.shape[1]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_ref.at[:, :, pl.ds(i * T, T)], xs, sem_in)
        cp.start()
        cp.wait()
        gtensors = tile_math(xs[:], gxs)
        co = pltpu.make_async_copy(
            gxs, gx_ref.at[:, :, pl.ds(i * T, T)], sem_out)
        co.start()
        co.wait()
    else:
        gtensors = tile_math(x_ref[:], gx_ref)

    is_first = pl.program_id(0) == 0
    for ref, g in zip(gtensor_refs, gtensors):
        @pl.when(is_first)
        def _(ref=ref, g=g):
            ref[:] = g

        @pl.when(jnp.logical_not(is_first))
        def _(ref=ref, g=g):
            ref[:] = ref[:] + g


def _blk_train_kernel(lay, activation, passes, inv_count, l_total,
                      train_ref, x_ref, yt_ref, d_ref, dt_ref, *rest):
    """Blocked fused MSE training kernel: loss + parameter gradients, no
    coordinate-gradient compute/write; with ``train_ref=False`` the QCP
    backward chain is skipped too (see fused._train_kernel)."""
    if lay.chunked:
        c_ref, *rest = rest
    n_skip = 1 if (lay.has_align and not train_ref) else 0
    n_t = (len(rest) - 1 - n_skip) // 2 + n_skip
    fixed = [r[:] for r in rest[:n_skip]]
    tensor_in = [r[:] for r in rest[n_skip:n_t]]
    loss_ref = rest[n_t]
    gtensor_refs = rest[n_t + 1 :]
    D, DT = d_ref[:], dt_ref[:]
    x_blk = x_ref[:]
    yt = yt_ref[:]  # [d_out, tile]
    tile = x_blk.shape[2]

    base = pl.program_id(0) * tile
    fidx = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
    mask = (fidx < l_total).astype(x_blk.dtype)

    # edges are constant w.r.t. the differentiated tensors: keep them
    # outside the vjp so no edge-backward machinery is traced at all
    # (chunked coordination rows likewise — computed once, closed over)
    E = [_split3_mm(D, x_blk[i], passes) for i in range(3)]
    segs = _slice_segments(E, lay)
    coord_rows = (_chunked_coord_rows(lay, passes, x_blk, c_ref)
                  if lay.chunked else None)

    def loss_fn(tensors):
        y = _feats_from_segs(segs, fixed + list(tensors), lay, activation,
                             tile, x_blk.dtype, coord_rows=coord_rows)
        e = (y - yt) * mask
        return jnp.sum(e * e) * inv_count

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


def blocked_train_grads(spec, align_idx, activation, params, ref_x, x,
                        y_target, *, tile=None, interpret=False,
                        precision="exact", train_ref=False, c_mat=None):
    """Blocked single-kernel MSE training grads. x in any
    :func:`_to_cmajor` layout; y_target ``[l, d_out]`` or ``[d_out, l]``.
    Returns ``(loss, gparams, gref)`` in the kernel param convention.
    Requires an MLP head (params non-empty): training a bare FeatureLayer
    has no trainable parameters.
    """
    if not params:
        raise ValueError("blocked_train_grads requires an MLP head")
    lay = blocked_layout(spec, align_idx)
    if tile is None:
        tile = auto_tile(lay, _head_dim(lay, params), backward=True)
    _check_tile(tile, interpret)
    xc, _ = _to_cmajor(x, lay.n_atoms)
    xc = _compact(xc, lay)
    xc, l, l_p = _pad_frames(xc, tile)
    d_out = _head_dim(lay, params)
    ytm = y_target.T if y_target.shape == (l, d_out) else y_target
    if l_p != l:
        ytm = jnp.pad(ytm, ((0, 0), (0, l_p - l)))
    D = jnp.asarray(lay.D, dtype=jnp.bfloat16)
    DT = jnp.asarray(lay.D.T, dtype=jnp.bfloat16)
    tensors = _blk_tensors(lay, params, ref_x)
    n_skip = 1 if (lay.has_align and not train_ref) else 0
    diff_tensors = tensors[n_skip:]
    inv_count = 1.0 / (float(l) * float(d_out))

    out_shapes = [jax.ShapeDtypeStruct((1, 1), x.dtype)] + [
        jax.ShapeDtypeStruct(t.shape, t.dtype) for t in diff_tensors
    ]
    out_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ] + [_full_spec(t) for t in diff_tensors]
    passes = _PRECISION_PASSES[precision]
    cmat = _c_operand(lay, c_mat)
    outs = pl.pallas_call(
        functools.partial(
            _blk_train_kernel, lay, activation, passes, inv_count, l,
            train_ref),
        grid=(l_p // tile,),
        in_specs=[
            _x_spec(lay.x_cols, tile),
            pl.BlockSpec((d_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _full_spec(D),
            _full_spec(DT),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in cmat]
        + [_full_spec(t) for t in tensors],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xc, ytm, D, DT, *cmat, *tensors)
    loss, *gtensors = outs
    gparams, gref = _unfold_tensor_grads(
        lay, params, ref_x, gtensors, has_ref=(n_skip == 0 and lay.has_align)
    )
    return loss[0, 0], gparams, gref


def _blk_cv_forces_kernel(lay, activation, passes, component, x_ref, d_ref,
                          dt_ref, *rest):
    # rest = ([c_ref], *tensor_refs, y_ref, gx_ref
    #         [, xs, gxs, sem_in, sem_out])   (scratch when lay.mc)
    if lay.chunked:
        c_ref, *rest = rest
        *rest, xs, gxs, sem_in, sem_out = rest
    n_t = len(rest) - 2
    tensors = [r[:] for r in rest[:n_t]]
    y_ref, gx_ref = rest[n_t], rest[n_t + 1]
    D, DT = d_ref[:], dt_ref[:]

    def tile_math(x_blk, gx_out):
        # segment-argument vjp + concat assembly (see _blk_bwd_kernel)
        T = x_blk.shape[2]
        E = [_split3_mm(D, x_blk[i], passes) for i in range(3)]
        segs = _slice_segments(E, lay)

        if lay.chunked:
            # rows as vjp arguments + explicit backward loop
            # (_blk_bwd_kernel)
            coord_rows = _chunked_coord_rows(lay, passes, x_blk, c_ref)

            def f(sg, cr):
                return _feats_from_segs(sg, tensors, lay, activation, T,
                                        x_blk.dtype, coord_rows=cr)

            y, vjp = jax.vjp(f, segs, coord_rows)
        else:
            def f(sg):
                return _feats_from_segs(
                    sg, tensors, lay, activation, T, x_blk.dtype
                )

            y, vjp = jax.vjp(f, segs)
        if component is None:
            ct = jnp.ones_like(y)
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
            ct = (row == component).astype(y.dtype)
        if lay.chunked:
            gsegs, g_rows = vjp(ct)
        else:
            (gsegs,) = vjp(ct)
            g_rows = None
        gE = _assemble_gE(gsegs, lay, T, x_blk.dtype)
        y_ref[:] = y
        gx_out[:] = jnp.stack(
            [_split3_mm(DT, gE[i], passes)[: gx_out.shape[1]]
             for i in range(3)],
            axis=0,
        )
        if g_rows:
            # chunked pullback accumulates straight into gx_out
            _chunked_coord_grads(lay, passes, x_blk, c_ref, g_rows,
                                 gx_out)

    if lay.chunked:
        # single-buffered HBM x/gx via manual DMA through kernel-level
        # scratch — see _blk_bwd_kernel for the VMEM accounting that
        # forces this at condensed widths
        T = y_ref.shape[1]
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_ref.at[:, :, pl.ds(i * T, T)], xs, sem_in)
        cp.start()
        cp.wait()
        tile_math(xs[:], gxs)
        co = pltpu.make_async_copy(
            gxs, gx_ref.at[:, :, pl.ds(i * T, T)], sem_out)
        co.start()
        co.wait()
    else:
        tile_math(x_ref[:], gx_ref)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _to_cmajor(x, n_atoms):
    """Normalize input to component-major ``[3, n, l]``.

    Accepts ``[l, n, 3]`` (reference convention), packed ``[l, 3n]``,
    transposed-packed ``[3n, l]`` (atom-major rows), or cmajor ``[3, n, l]``
    already. Returns ``(x_cmaj, layout_tag)``; gradients are returned in
    the same layout via :func:`_from_cmajor`.
    """
    if x.ndim == 3:
        if x.shape[0] == 3 and x.shape[1] == n_atoms and x.shape[2] != 3:
            return x, "cmajor"
        return jnp.transpose(x, (2, 1, 0)), "lnd"
    if x.shape[1] == 3 * n_atoms:  # [l, 3n]
        l = x.shape[0]
        return jnp.transpose(x.reshape(l, n_atoms, 3), (2, 1, 0)), "packed"
    # [3n, l]
    return jnp.transpose(x.reshape(n_atoms, 3, x.shape[1]), (1, 0, 2)), "t"


def _from_cmajor(g, tag):
    if tag == "cmajor":
        return g
    if tag == "lnd":
        return jnp.transpose(g, (2, 1, 0))
    if tag == "packed":
        l = g.shape[2]
        return jnp.transpose(g, (2, 1, 0)).reshape(l, -1)
    n, l = g.shape[1], g.shape[2]
    return jnp.transpose(g, (1, 0, 2)).reshape(3 * n, l)


def _pad_frames(xc, tile):
    l = xc.shape[2]
    l_p = ((l + tile - 1) // tile) * tile
    if l_p != l:
        xc = jnp.pad(xc, ((0, 0), (0, 0), (0, l_p - l)), mode="edge")
    return xc, l, l_p


def _compact(xc, lay):
    """Gather the active-atom rows (XLA gather, outside the kernel),
    then pad to the kernel's x width: chunked layouts take x pre-padded
    to the chunk matrix's lane-aligned column count (lay.x_cols), so
    the kernels never make the [3, c_cols, T] pad copy in VMEM."""
    if lay.active_idx is not None:
        xc = xc[:, jnp.asarray(lay.active_idx), :]
    if lay.x_cols != xc.shape[1]:
        xc = jnp.pad(xc, ((0, 0), (0, lay.x_cols - xc.shape[1]), (0, 0)))
    return xc


def _scatter_gx(gx_active, lay, dtype):
    """Scatter active-atom gradients back to full atom width (inactive
    atoms have exactly-zero gradients by construction)."""
    if lay.active_idx is None:
        return gx_active
    full = jnp.zeros((3, lay.n_atoms, gx_active.shape[2]), dtype)
    return full.at[:, jnp.asarray(lay.active_idx), :].set(gx_active)


def _blk_tensors(lay, params, ref_x):
    """Kernel tensor list: refT then MLP weights. The final-column
    permutation AND the padded-row layout fold into W1 (pad rows read
    zero columns)."""
    tensors = []
    if lay.has_align:
        tensors.append(ref_x.T)
    for li, (w, b) in enumerate(params):
        if li == 0:
            wp = jnp.zeros((w.shape[0], lay.d_pad), w.dtype)
            w = wp.at[:, jnp.asarray(lay.perm_b)].set(w)
        tensors.append(w)
        tensors.append(b)
    return tensors


def _unfold_tensor_grads(lay, params, ref_x, gtensors, has_ref=None):
    if has_ref is None:
        has_ref = lay.has_align
    if has_ref:
        gref = gtensors[0].T
        grest = list(gtensors[1:])
    else:
        gref = jnp.zeros_like(ref_x)
        grest = list(gtensors)
    gparams = []
    for li in range(len(grest) // 2):
        gw, gb = grest[2 * li], grest[2 * li + 1]
        if li == 0:
            gw = gw[:, jnp.asarray(lay.perm_b)]  # un-fold perm + padding
        gparams.append((gw, gb))
    return tuple(gparams), gref


def _full_spec(t):
    return pl.BlockSpec(
        t.shape, lambda i, _nd=t.ndim: (0,) * _nd, memory_space=pltpu.VMEM
    )


def _x_spec(n_atoms, tile):
    return pl.BlockSpec(
        (3, n_atoms, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )


def _check_tile(tile, interpret):
    if not interpret and tile % 128:
        raise ValueError(
            f"blocked kernels require lane-aligned tiles (multiples of 128) "
            f"when compiled (got {tile})"
        )


def _c_operand(lay, c_mat=None):
    """The bf16 streamed matrix of the chunked coordination features as
    a kernel operand tuple (empty when every feature is resident in D):
    the full-width chunk matrix ``C [mc, c_cols]``, or the windowed
    matrix ``CW [mw, 2W]`` when ``lay.windowed``.

    By default the matrix is closure-captured — under the caller's
    ``jit`` it becomes an HLO CONSTANT baked into the executable, which
    is fine at demo scale (MBs) but bakes gigabytes into the module for
    condensed-phase pair counts (and a remote-compile service will
    reject the upload outright). Passing ``c_mat`` — the array from
    :func:`chunk_matrix`, routed through the caller's jit boundary as a
    REAL argument — keeps the executable small and the matrix a single
    HBM buffer."""
    if not lay.chunked:
        if c_mat is not None:
            raise ValueError(
                "c_mat given but this model has no chunked coordination "
                "features")
        return ()
    want = ((lay.mw, 2 * lay.win_w) if lay.windowed
            else (lay.mc, lay.c_cols))
    if c_mat is not None:
        if tuple(c_mat.shape) != want or c_mat.dtype != jnp.bfloat16:
            raise ValueError(
                f"c_mat must be bf16 {want} (use chunk_matrix(model)); "
                f"got {c_mat.dtype} {tuple(c_mat.shape)}")
        return (c_mat,)
    src = lay.CW if lay.windowed else lay.C
    return (jnp.asarray(src, dtype=jnp.bfloat16),)


def chunk_matrix(spec, align_idx):
    """The streamed matrix of a spec's chunked coordination features as
    a bf16 numpy array (``None`` when everything is resident in D) —
    the full-width chunk matrix, or the windowed ``[mw, 2W]`` matrix
    for windowed layouts (same operand slot either way). Pass it
    through your ``jit`` boundary into ``c_mat=`` of the cv-forces /
    train-grads entry points so multi-GB pair tables ride as one device
    buffer instead of an HLO constant per executable."""
    lay = blocked_layout(spec, align_idx)
    if not lay.chunked:
        return None
    src = lay.CW if lay.windowed else lay.C
    return src.astype(jnp.bfloat16)  # ml_dtypes bf16 via numpy astype


def _mc_scratch(lay, tile, dtype):
    """Kernel-level scratch of the chunked backward/cv+forces kernels:
    single-buffered x and gx VMEM slabs + their DMA semaphores (empty
    for resident layouts, which use windowed I/O)."""
    if not lay.chunked:
        return ()
    return (
        pltpu.VMEM((3, lay.x_cols, tile), dtype),
        pltpu.VMEM((3, lay.gx_pad, tile), dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    )


def _blk_fwd_impl(spec, align_idx, activation, tile, interpret,
                  params, ref_x, x, precision="exact", c_mat=None):
    passes = _PRECISION_PASSES[precision]
    lay = blocked_layout(spec, align_idx)
    if tile is None:
        tile = auto_tile(lay, _head_dim(lay, params), backward=False)
    _check_tile(tile, interpret)
    xc, tag = _to_cmajor(x, lay.n_atoms)
    xc = _compact(xc, lay)
    xc, l, l_p = _pad_frames(xc, tile)
    D = jnp.asarray(lay.D, dtype=jnp.bfloat16)  # exactly 0/+-1
    DT = jnp.asarray(lay.D.T, dtype=jnp.bfloat16)
    tensors = _blk_tensors(lay, params, ref_x)
    d_out = _head_dim(lay, params)

    cmat = _c_operand(lay, c_mat)
    y = pl.pallas_call(
        functools.partial(_blk_fwd_kernel, lay, activation, passes),
        grid=(l_p // tile,),
        in_specs=[_x_spec(lay.x_cols, tile), _full_spec(D), _full_spec(DT)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in cmat]
        + [_full_spec(t) for t in tensors],
        out_specs=pl.BlockSpec(
            (d_out, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_out, l_p), x.dtype),
        interpret=interpret,
    )(xc, D, DT, *cmat, *tensors)
    y = y[:, :l]
    if not params:
        y = y[jnp.asarray(lay.perm_b)]
    return y.T


def _head_dim(lay, params):
    """Kernel output rows: MLP head dim, or the PADDED feature rows (the
    wrapper gathers the real columns outside the kernel)."""
    return params[-1][0].shape[0] if params else lay.d_pad


def _blk_bwd_impl(spec, align_idx, activation, tile, interpret,
                  params, ref_x, x, gy, precision="exact", c_mat=None):
    passes = _PRECISION_PASSES[precision]
    lay = blocked_layout(spec, align_idx)
    if tile is None:
        tile = auto_tile(lay, _head_dim(lay, params), backward=True)
    _check_tile(tile, interpret)
    xc, tag = _to_cmajor(x, lay.n_atoms)
    xc = _compact(xc, lay)
    xc, l, l_p = _pad_frames(xc, tile)
    D = jnp.asarray(lay.D, dtype=jnp.bfloat16)
    DT = jnp.asarray(lay.D.T, dtype=jnp.bfloat16)
    tensors = _blk_tensors(lay, params, ref_x)
    d_out = _head_dim(lay, params)

    gyt = gy.T  # [d_out, l]
    if not params:
        # forward gathered real rows outside the kernel; scatter the
        # cotangent back into the padded row layout (pad rows get zero)
        gyt = jnp.zeros((lay.d_pad, gyt.shape[1]), gyt.dtype).at[
            jnp.asarray(lay.perm_b)
        ].set(gyt)
    if l_p != l:
        gyt = jnp.pad(gyt, ((0, 0), (0, l_p - l)))

    out_shapes = [jax.ShapeDtypeStruct((3, lay.gx_pad, l_p), x.dtype)] + [
        jax.ShapeDtypeStruct(t.shape, t.dtype) for t in tensors
    ]
    # chunked layouts: x and gx are HBM (pl.ANY) operands, DMA'd tile
    # by tile inside the kernel through ONE VMEM scratch each — the
    # windowed-I/O double buffers are the VMEM-binding term at
    # condensed widths (see _blk_bwd_kernel)
    x_in = (pl.BlockSpec(memory_space=pl.ANY) if lay.chunked
            else _x_spec(lay.x_cols, tile))
    gx_out = (pl.BlockSpec(memory_space=pl.ANY) if lay.chunked
              else _x_spec(lay.n_active, tile))
    out_specs = [gx_out] + [_full_spec(t) for t in tensors]
    cmat = _c_operand(lay, c_mat)
    outs = pl.pallas_call(
        functools.partial(_blk_bwd_kernel, lay, activation, passes),
        grid=(l_p // tile,),
        in_specs=[
            x_in,
            pl.BlockSpec((d_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _full_spec(D),
            _full_spec(DT),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in cmat]
        + [_full_spec(t) for t in tensors],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=_mc_scratch(lay, tile, x.dtype),
        interpret=interpret,
    )(xc, gyt, D, DT, *cmat, *tensors)
    gxc, *gtensors = outs
    gx = _from_cmajor(
        _scatter_gx(gxc[:, : lay.n_active, :l], lay, x.dtype), tag)
    gparams, gref = _unfold_tensor_grads(lay, params, ref_x, gtensors)
    return gparams, gref, gx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def blocked_apply(spec, align_idx, activation, tiles, interpret, precision,
                  params, ref_x, x, c_mat=None):
    """Blocked fused forward: ``x -> [l, d_out]``.

    Same contract as :func:`molann_tpu.ops.fused.fused_apply` (params as
    transposed ``(Wt [d_out, d_in], b [d_out, 1])`` tuples, ref_x
    ``[n_align, 3]``) but with O(1) kernel op count — use for systems past
    the unrolled path's compile-time envelope. ``tiles`` entries may be
    None to auto-size from the VMEM model. ``c_mat``: the chunk matrix
    of chunked coordination features as a jit-boundary operand (see
    :func:`chunk_matrix`) instead of a closure-captured HLO constant —
    required at condensed-phase pair counts where the baked constant is
    multi-GB. Treated as a constant by differentiation (zero cotangent).
    """
    return _blk_fwd_impl(
        spec, align_idx, activation, tiles[0], interpret, params, ref_x, x,
        precision, c_mat,
    )


def _blocked_fwd(spec, align_idx, activation, tiles, interpret, precision,
                 params, ref_x, x, c_mat=None):
    y = _blk_fwd_impl(
        spec, align_idx, activation, tiles[0], interpret, params, ref_x, x,
        precision, c_mat,
    )
    return y, (params, ref_x, x, c_mat)


def _blocked_bwd(spec, align_idx, activation, tiles, interpret, precision,
                 res, gy):
    params, ref_x, x, c_mat = res
    gparams, gref, gx = _blk_bwd_impl(
        spec, align_idx, activation, tiles[1], interpret, params, ref_x,
        x, gy, precision, c_mat,
    )
    gc = None if c_mat is None else jnp.zeros_like(c_mat)
    return gparams, gref, gx, gc


blocked_apply.defvjp(_blocked_fwd, _blocked_bwd)


def blocked_cv_forces(spec, align_idx, activation, params, ref_x, x, *,
                      component=None, tile=None, interpret=False,
                      out_layout=None, precision="exact",
                      compact_grads=False, c_mat=None):
    """Single-kernel CV values + coordinate gradients, blocked formulation.

    Accepts any layout :func:`_to_cmajor` understands; the fastest is
    component-major ``[3, n, l]`` (zero-copy in AND out, minimal HBM
    padding). ``out_layout``: ``None`` follows the input convention
    (standard ``[l, d]`` + gradient shaped like x for frame-major inputs,
    transposed/cmajor for those inputs), or force ``"standard"`` / ``"t"``
    (``[d, l]`` + ``[3n, l]``) / ``"cmajor"`` (``[d, l]`` + ``[3, n, l]``).

    compact_grads: return the gradient restricted to the ACTIVE atoms as
    ``[3, n_active, l]`` (row k = atom ``layout.active_idx[k]``; identity
    when every atom is active) instead of scattering back to full width.
    Untouched atoms have exactly-zero gradients, so for a large system
    with a small CV set this skips an ``n_atoms/n_active``-times larger
    HBM write — the production serving shape for biased MD. y follows
    ``out_layout`` as usual.
    """
    lay = blocked_layout(spec, align_idx)
    if tile is None:
        tile = auto_tile(lay, _head_dim(lay, params), backward=True)
    _check_tile(tile, interpret)
    xc, tag = _to_cmajor(x, lay.n_atoms)
    if out_layout is None:
        out_layout = {
            "lnd": "standard", "packed": "standard", "t": "t",
            "cmajor": "cmajor",
        }[tag]
    xc = _compact(xc, lay)
    xc, l, l_p = _pad_frames(xc, tile)
    D = jnp.asarray(lay.D, dtype=jnp.bfloat16)
    DT = jnp.asarray(lay.D.T, dtype=jnp.bfloat16)
    tensors = _blk_tensors(lay, params, ref_x)
    d_out = _head_dim(lay, params)
    if component is not None:
        component = component % d_out
        if not params:
            # kernel rows are blocked order; map the requested final column
            component = int(lay.perm_b[component])

    passes = _PRECISION_PASSES[precision]
    cmat = _c_operand(lay, c_mat)
    # chunked layouts: HBM x/gx with in-kernel DMA (see _blk_bwd_impl)
    x_in = (pl.BlockSpec(memory_space=pl.ANY) if lay.chunked
            else _x_spec(lay.x_cols, tile))
    gx_out = (pl.BlockSpec(memory_space=pl.ANY) if lay.chunked
              else _x_spec(lay.n_active, tile))
    y, gx = pl.pallas_call(
        functools.partial(
            _blk_cv_forces_kernel, lay, activation, passes, component),
        grid=(l_p // tile,),
        in_specs=[x_in, _full_spec(D), _full_spec(DT)]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in cmat]
        + [_full_spec(t) for t in tensors],
        out_specs=[
            pl.BlockSpec((d_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            gx_out,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d_out, l_p), x.dtype),
            jax.ShapeDtypeStruct((3, lay.gx_pad, l_p), x.dtype),
        ],
        scratch_shapes=_mc_scratch(lay, tile, x.dtype),
        interpret=interpret,
    )(xc, D, DT, *cmat, *tensors)
    y = y[:, :l]
    if compact_grads:
        gx = gx[:, : lay.n_active, :l]
        if not params:
            y = y[jnp.asarray(lay.perm_b)]
        if out_layout in ("t", "cmajor"):
            return y, gx
        return y.T, gx
    gx = _scatter_gx(gx[:, : lay.n_active, :l], lay, x.dtype)
    if not params:
        y = y[jnp.asarray(lay.perm_b)]
    if out_layout == "cmajor":
        return y, gx
    if out_layout == "t":
        return y, _from_cmajor(gx, "t")
    return y.T, _from_cmajor(gx, tag if tag in ("lnd", "packed") else "lnd")
