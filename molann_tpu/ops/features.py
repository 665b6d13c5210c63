"""Pure-jnp molecular feature math (the reference's numerical contract).

Formulas mirrored exactly from reference molann/ann.py:288-356 (see
SURVEY.md §2.2 for the contract and golden values):

- bond (type 1):      ``‖x[a1] - x[a0]‖₂``
- angle (type 0):     ``cosθ = (r21·r23)/(‖r21‖‖r23‖)`` with
  ``r21 = x[a0]-x[a1]``, ``r23 = x[a2]-x[a1]`` (central atom second);
  ``use_angle_value=True`` → ``acos`` (deliberately UNclamped, matching the
  reference — ``|cos| > 1`` from roundoff yields NaN there too).
- dihedral (type 2):  ``n1 = r12×r23``, ``n2 = r23×r34``,
  ``cos̃ = n1·n2``, ``siñ = (n1·r34)‖r23‖``, ``ρ = √(cos̃²+siñ²)``;
  ``use_angle_value=True`` → ``atan2(siñ, cos̃)``; else ``[cos̃/ρ, siñ/ρ]``
  in that column order.
- position (type 3):  row-major gather → ``[l, 3n]`` (x,y,z per atom).

All functions take the whole batch and a *static* index array, computing
every feature of one type in a single vectorized gather + math chain — the
TPU-native replacement for the reference's per-feature Python loop
(molann/ann.py:473).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..spec import CompiledFeatures

__all__ = [
    "bond_features",
    "angle_features",
    "dihedral_features",
    "position_features",
    "switching_function",
    "coordination_features",
    "apply_compiled_features",
]


def _gather(x, idx_2d):
    """x: [l, n, 3]; idx_2d: static [m, k] → [l, m, k, 3]."""
    idx = np.asarray(idx_2d, dtype=np.int32)
    return x[:, idx, :]


def bond_features(x, bond_idx):
    """[l, n, 3] × static [nb, 2] → [l, nb] bond lengths."""
    g = _gather(x, bond_idx)
    r12 = g[:, :, 1, :] - g[:, :, 0, :]
    return jnp.linalg.norm(r12, axis=-1)


def angle_features(x, angle_idx, use_angle_value: bool):
    """[l, n, 3] × static [na, 3] → [l, na] cosθ or θ (unclamped acos)."""
    g = _gather(x, angle_idx)
    r21 = g[:, :, 0, :] - g[:, :, 1, :]
    r23 = g[:, :, 2, :] - g[:, :, 1, :]
    r21l = jnp.linalg.norm(r21, axis=-1)
    r23l = jnp.linalg.norm(r23, axis=-1)
    cos_angle = jnp.sum(r21 * r23, axis=-1) / (r21l * r23l)
    if use_angle_value:
        return jnp.arccos(cos_angle)
    return cos_angle


def dihedral_features(x, dihedral_idx, use_angle_value: bool):
    """[l, n, 3] × static [nd, 4] → [l, nd] φ or [l, nd, 2] [cosφ, sinφ]."""
    g = _gather(x, dihedral_idx)
    r12 = g[:, :, 1, :] - g[:, :, 0, :]
    r23 = g[:, :, 2, :] - g[:, :, 1, :]
    r34 = g[:, :, 3, :] - g[:, :, 2, :]
    n1 = jnp.cross(r12, r23)
    n2 = jnp.cross(r23, r34)
    cos_phi = jnp.sum(n1 * n2, axis=-1)
    sin_phi = jnp.sum(n1 * r34, axis=-1) * jnp.linalg.norm(r23, axis=-1)
    if use_angle_value:
        return jnp.arctan2(sin_phi, cos_phi)
    radius = jnp.sqrt(cos_phi * cos_phi + sin_phi * sin_phi)
    return jnp.stack([cos_phi / radius, sin_phi / radius], axis=-1)


def position_features(x, position_idx):
    """[l, n, 3] × static flat [m] → [l, 3m] row-major (x,y,z per atom)."""
    idx = np.asarray(position_idx, dtype=np.int32)
    return x[:, idx, :].reshape(x.shape[0], 3 * len(idx))


def geometric_sum(t, k):
    """``1 + t + ... + t^(k-1)`` by Horner (k-1 fused multiply-adds).
    Works on any jnp expression (or Python float); autodiff-friendly."""
    acc = t * 0.0 + 1.0
    for _ in range(int(k) - 1):
        acc = 1.0 + t * acc
    return acc


def switching_function(r, r0, nn, mm, d_max=None):
    """PLUMED rational switching ``(1-(r/r0)^nn)/(1-(r/r0)^mm)``.

    For the default ``mm == 2*nn`` the algebraically identical
    ``1/(1+(r/r0)^nn)`` is used — smooth everywhere including ``r == r0``
    (where the naive quotient is 0/0). For general exponents the naive
    quotient is catastrophically ill-conditioned near ``r == r0`` (the
    cancellation in ``1-t^mm`` amplifies f32 rounding by ~1/(1-t);
    measured ~1e-3 relative gradient spread between op orderings at
    ``|t-1| ~ 1e-4`` on TPU). Both factors share the root ``(1-t)``, so
    the geometric-sum form

        ``s(t) = (sum_{k<nn} t^k) / (sum_{k<mm} t^k)``

    — algebraically identical for all ``t >= 0`` — is used instead:
    smooth and well-conditioned everywhere, the ``r == r0`` value
    ``nn/mm`` emerging naturally with its exact derivative (no guard
    window needed).

    ``d_max`` (optional, static) applies PLUMED's stretch-and-truncate:
    ``s'(r) = (s(r) - s(d_max)) / (1 - s(d_max))`` for ``r < d_max``
    and EXACTLY 0 beyond — ``s'(0) = 1``, continuous at ``d_max``
    (the derivative has PLUMED's standard small jump there). This is
    what makes coordination features finite-ranged, so neighbor-list
    culling at ``r_cut = d_max`` is exact, not an approximation
    (:mod:`molann_tpu.ops.neighbor`)."""
    nn, mm = int(nn), int(mm)
    if nn < 1 or mm < 1:
        raise ValueError(
            f"switching_function exponents must be positive ints, got "
            f"nn={nn}, mm={mm}")
    t = r / r0

    def raw(tt):
        if mm == 2 * nn:
            return 1.0 / (1.0 + _ipow(tt, nn))
        return geometric_sum(tt, nn) / geometric_sum(tt, mm)

    if d_max is None:
        return raw(t)
    d_max = float(d_max)
    if d_max <= r0:
        raise ValueError(f"d_max must exceed r0, got d_max={d_max}, "
                         f"r0={r0}")
    y = d_max / float(r0)  # > 1: the plain quotient is well-conditioned
    s_dmax = (1.0 - y**nn) / (1.0 - y**mm)
    stretch = 1.0 / (1.0 - s_dmax)
    return jnp.where(r < d_max, (raw(t) - s_dmax) * stretch, 0.0)


def _ipow(t, k):
    """``t**k`` for a static positive int exponent by repeated squaring
    (log2(k) multiplies). ``t**k`` with an integer operand can lower to
    a transcendental ``exp(k log t)`` on the VPU — measurably slower in
    the pair-heavy kernels AND undefined at ``t == 0`` (padded chunk
    rows); explicit multiplies are exact there."""
    k = int(k)
    if k < 1:
        raise ValueError(f"_ipow requires a positive exponent, got {k}")
    acc = None
    sq = t
    while k:
        if k & 1:
            acc = sq if acc is None else acc * sq
        k >>= 1
        if k:
            sq = sq * sq
    return acc


def min_image_components(d, box):
    """Minimum image of displacements given as a 3-sequence of same-shape
    arrays (component-major, the layout both fused kernel formulations
    use) under a STATIC lower-triangular box (tuple-of-tuples baked in as
    trace-time constants; zero entries cost nothing). Same row reduction
    as :func:`molann_tpu.pbc.minimum_image` — the ONE implementation all
    compute paths share. ``round()`` is gradient-transparent."""
    d = list(d)
    for i in (2, 1, 0):
        shift = jnp.round(d[i] * (1.0 / box[i][i]))
        for j in range(3):
            if box[i][j] != 0.0:
                d[j] = d[j] - shift * box[i][j]
    return tuple(d)


def _static_minimum_image(dx, box):
    """Minimum-image displacements of a stacked ``[..., 3]`` array under
    a STATIC lower-triangular box — thin layout adapter over
    :func:`min_image_components`."""
    return jnp.stack(
        min_image_components(tuple(dx[..., i] for i in range(3)), box),
        axis=-1,
    )


def coordination_features(x, coord_pairs, coord_slices, coord_params,
                          coord_boxes=None, coord_dmax=None):
    """[l, n, 3] × static pair table → [l, nc] switching-function
    contact counts (one column per coordination feature). Extension
    beyond the reference feature set; see
    :meth:`molann_tpu.feature.Feature.get_coordination_params`.
    Features carrying a static ``pbc_box`` use minimum-image pair
    distances (intermolecular contacts in a periodic cell); a
    ``d_max`` truncates the switching exactly (PLUMED stretching)."""
    outs = []
    pairs = np.asarray(coord_pairs, dtype=np.int32).reshape(-1, 2)
    if coord_boxes is None:
        coord_boxes = (None,) * len(coord_slices)
    if coord_dmax is None:
        coord_dmax = (None,) * len(coord_slices)
    for (start, npairs), (r0, nn, mm), box, dmax in zip(
        coord_slices, coord_params, coord_boxes, coord_dmax
    ):
        g = _gather(x, pairs[start:start + npairs])
        d = g[:, :, 1, :] - g[:, :, 0, :]
        if box is not None:
            d = _static_minimum_image(d, box)
        r = jnp.linalg.norm(d, axis=-1)
        outs.append(jnp.sum(switching_function(r, r0, nn, mm, dmax),
                            axis=1))
    return jnp.stack(outs, axis=1)


def apply_compiled_features(spec: CompiledFeatures, x):
    """Evaluate all features of a compiled spec: ``[l, n, 3] → [l, d]``.

    Computes type-grouped blocks (one fused chain per type), concatenates,
    and applies the static column permutation restoring feature-list order.
    """
    l = x.shape[0]
    parts = []
    if spec.n_angles:
        parts.append(angle_features(x, spec.angle_idx, spec.use_angle_value))
    if spec.n_bonds:
        parts.append(bond_features(x, spec.bond_idx))
    if spec.n_dihedrals:
        d = dihedral_features(x, spec.dihedral_idx, spec.use_angle_value)
        if not spec.use_angle_value:
            d = d.reshape(l, 2 * spec.n_dihedrals)
        parts.append(d)
    if spec.n_coordinations:
        parts.append(coordination_features(
            x, spec.coord_pairs, spec.coord_slices, spec.coord_params,
            getattr(spec, "coord_boxes", None),
            getattr(spec, "coord_dmax", None) or None))
    if spec.n_position_atoms:
        parts.append(position_features(x, spec.position_idx))
    if not parts:
        return jnp.zeros((l, 0), dtype=x.dtype)
    feats = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    if spec.perm is not None:
        feats = feats[:, np.asarray(spec.perm, dtype=np.int32)]
    return feats
