"""Differentiable Kabsch alignment — TPU-native rotation solvers.

Reproduces the numerical contract of the reference AlignmentLayer
(reference molann/ann.py:157-199): for each frame, gather the align-atom
subset, center it on its own centroid, form the 3x3 covariance against the
pre-centered reference coordinates, solve for the optimal *proper* rotation
``R``, and return ``(x - c) @ R`` — the WHOLE input translated by the
align-subset centroid and rotated.

Three interchangeable rotation solvers (all return the same ``R`` up to
float roundoff; parity-tested against each other and against the golden
values in SURVEY.md §2.2):

- ``svd``  — the reference's construction: ``R = U diag(1,1,s) Vᵀ`` with
  ``USVᵀ = svd(H)`` and ``s = sign(det(U Vᵀ))`` detached from autograd
  (reference molann/ann.py:187-195). Batched tiny SVD is hostile to XLA/TPU;
  kept for parity experiments.
- ``eigh`` — Horn's quaternion method: the optimal rotation's unit
  quaternion is the top eigenvector of a symmetric 4x4 built from the
  covariance. Robust, but XLA's batched eigh VJP can produce NaNs at
  degenerate lower spectra (planar systems).
- ``qcp``  — Theobald's quaternion-characteristic-polynomial method
  (the MD-community standard): Newton iteration on the quartic
  characteristic polynomial for the top eigenvalue, then the eigenvector
  via the adjugate of ``K - λI``. Closed-form, branchless, perfectly
  vectorizable on the VPU, smooth gradients. This is the default and the
  form used inside the fused Pallas kernel.

All small matmuls run at ``Precision.HIGHEST`` — TPU default matmul
precision (bf16 passes) would blow the <1e-6 parity budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "kabsch_covariance",
    "rotation_svd",
    "rotation_eigh",
    "rotation_qcp",
    "quaternion_to_rotation",
    "align_frames",
    "ROTATION_METHODS",
]

_HI = jax.lax.Precision.HIGHEST


def kabsch_covariance(x_centered, ref_x, precision=_HI):
    """Per-frame covariance ``H = x_centeredᵀ @ ref_x``.

    x_centered: ``[l, n_a, 3]`` centered align-subset coordinates.
    ref_x: ``[n_a, 3]`` centered reference coordinates.
    Returns ``[l, 3, 3]``.
    """
    return jnp.einsum("lni,nj->lij", x_centered, ref_x, precision=precision)


def rotation_svd(H):
    """Reference-parity rotation from SVD (molann/ann.py:187-195)."""
    u, s, vh = jnp.linalg.svd(H)
    sign = jnp.sign(jnp.linalg.det(jnp.matmul(u, vh, precision=_HI)))
    sign = jax.lax.stop_gradient(sign)
    d = jnp.stack(
        [jnp.ones_like(sign), jnp.ones_like(sign), sign], axis=-1
    )
    return jnp.matmul(u * d[..., None, :], vh, precision=_HI)


def _quaternion_matrix(H):
    """Horn's symmetric 4x4 ``K`` from the 3x3 covariance ``H`` ([l,3,3]).

    The top eigenvector of ``K`` is the unit quaternion ``q = (w,x,y,z)`` of
    the column-vector rotation ``Rot(q)`` that carries the frame's centered
    align atoms onto the reference; the row-vector rotation applied as
    ``(x-c) @ R`` is ``R = Rot(q)ᵀ`` (verified against the SVD path in
    tests/test_alignment.py).
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]

    k00 = Sxx + Syy + Szz
    k01 = Syz - Szy
    k02 = Szx - Sxz
    k03 = Sxy - Syx
    k11 = Sxx - Syy - Szz
    k12 = Sxy + Syx
    k13 = Szx + Sxz
    k22 = -Sxx + Syy - Szz
    k23 = Syz + Szy
    k33 = -Sxx - Syy + Szz

    row0 = jnp.stack([k00, k01, k02, k03], axis=-1)
    row1 = jnp.stack([k01, k11, k12, k13], axis=-1)
    row2 = jnp.stack([k02, k12, k22, k23], axis=-1)
    row3 = jnp.stack([k03, k13, k23, k33], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)


def quaternion_to_rotation(q):
    """Row-vector rotation ``R`` (for ``v_row @ R``) from unit quaternion
    ``q = (w,x,y,z)`` ``[..., 4]`` → ``[..., 3, 3]``.

    ``R = Rot(q)ᵀ`` where ``Rot(q)`` is the standard column-vector rotation
    matrix. ``R(q) == R(-q)``, so no quaternion sign convention is needed.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    # Rot(q) rows; R = Rot(q)ᵀ so Rot's rows become R's columns.
    r00, r01, r02 = 1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)
    r10, r11, r12 = 2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)
    r20, r21, r22 = 2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)
    col0 = jnp.stack([r00, r01, r02], axis=-1)
    col1 = jnp.stack([r10, r11, r12], axis=-1)
    col2 = jnp.stack([r20, r21, r22], axis=-1)
    return jnp.stack([col0, col1, col2], axis=-1)


def rotation_eigh(H):
    """Rotation via the top eigenvector of Horn's 4x4 (batched eigh).

    .. warning:: XLA's batched ``eigh`` VJP divides by eigenvalue gaps, so
       ``jax.grad`` through this solver produces NaNs whenever the LOWER
       spectrum of ``K`` is degenerate — which symmetric configurations
       (equilateral/square/collinear align groups, near-self-alignment of
       planar systems) hit exactly. The failure envelope is pinned by
       tests/test_alignment.py::test_eigh_grad_nan_envelope. Values
       (forward) are always fine; for gradients prefer ``qcp``, whose
       adjugate construction has no gap division.
    """
    K = _quaternion_matrix(H)
    _, v = jnp.linalg.eigh(K)  # ascending eigenvalues
    q = v[..., :, -1]
    return quaternion_to_rotation(q)


def _det3(H):
    """Determinant of ``[..., 3, 3]`` via the explicit cofactor formula
    (vectorizes as pure elementwise math — no LU)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    g, h, i = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _adjugate4_sym(M):
    """Adjugate of a symmetric ``[..., 4, 4]`` matrix via 3x3 cofactors.

    For ``M = K - λI`` with ``λ`` an eigenvalue, every nonzero column of
    ``adj(M)`` is proportional to the corresponding eigenvector.
    """
    def minor(rows, cols):
        sub = M[..., rows, :][..., :, cols]
        return _det3(sub)

    idx = [0, 1, 2, 3]
    cof = [[None] * 4 for _ in range(4)]
    for i in range(4):
        rows = [r for r in idx if r != i]
        for j in range(4):
            cols = [c for c in idx if c != j]
            sign = -1.0 if (i + j) % 2 else 1.0
            cof[i][j] = sign * minor(rows, cols)
    # adj = cofactor-matrix transposed; M symmetric => adj symmetric.
    return jnp.stack(
        [jnp.stack([cof[j][i] for j in range(4)], axis=-1) for i in range(4)],
        axis=-2,
    )


def rotation_qcp(H, newton_iters: int = 12):
    """Rotation via Theobald's QCP: Newton on the quartic characteristic
    polynomial of Horn's ``K``, eigenvector via the adjugate.

    The characteristic polynomial of the traceless symmetric ``K`` is
    ``P(λ) = λ⁴ + c2 λ² + c1 λ + c0`` with ``c2 = -2‖H‖²_F``,
    ``c1 = -8 det(H)`` and ``c0 = det(K)`` (Newton's identities with
    ``tr K = 0``). Newton from the upper bound ``λ₀ = √3 ‖H‖_F ≥ σ1+σ2+σ3
    ≥ λ_max`` converges monotonically and quadratically.
    """
    K = _quaternion_matrix(H)
    frob2 = jnp.sum(H * H, axis=(-1, -2))
    c2 = -2.0 * frob2
    c1 = -8.0 * _det3(H)
    # c0 = det(K) = p2²/8 - p4/4 with p2 = tr(K²), p4 = tr(K⁴) (tr K = 0).
    K2 = jnp.einsum("...ij,...jk->...ik", K, K, precision=_HI)
    p2 = jnp.trace(K2, axis1=-2, axis2=-1)
    p4 = jnp.sum(K2 * K2, axis=(-1, -2))  # tr(K²·K²ᵀ) = tr(K⁴), K² symmetric
    c0 = p2 * p2 / 8.0 - p4 / 4.0

    def newton_step(lam):
        p = ((lam * lam + c2) * lam + c1) * lam + c0
        dp = (4.0 * lam * lam + 2.0 * c2) * lam + c1
        return lam - p / jnp.where(jnp.abs(dp) < 1e-30, 1e-30, dp)

    # Converge with gradients stopped, then one differentiable step: the
    # Newton map has zero λ-derivative at a simple root, so the composite
    # carries the exact fixed-point gradient at one step's backward cost.
    lam = jnp.sqrt(3.0 * frob2)
    for _ in range(newton_iters):
        lam = newton_step(lam)
    lam = newton_step(jax.lax.stop_gradient(lam))

    M = K - lam[..., None, None] * jnp.eye(4, dtype=K.dtype)
    adj = _adjugate4_sym(M)
    norms2 = jnp.sum(adj * adj, axis=-2)  # squared norm of each column [l,4]
    best = jnp.argmax(norms2, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=K.dtype)
    q = jnp.einsum("...ij,...j->...i", adj, onehot, precision=_HI)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_rotation(q)


ROTATION_METHODS = {
    "svd": rotation_svd,
    "eigh": rotation_eigh,
    "qcp": rotation_qcp,
}


def align_frames(x, ref_x, align_indices, method: str = "qcp", precision=_HI):
    """Kabsch-align frames onto the (pre-centered) reference.

    x: ``[l, n_inp, 3]`` frames; ref_x: ``[n_a, 3]`` centered reference;
    align_indices: static sequence of local indices of the align atoms
    within the input group. Returns ``[l, n_inp, 3]`` aligned frames
    ``(x - c) @ R`` per reference molann/ann.py:157-199.
    """
    idx = np.asarray(align_indices, dtype=np.int32)
    sub = x[:, idx, :]
    c = jnp.mean(sub, axis=1, keepdims=True)
    H = kabsch_covariance(sub - c, jnp.asarray(ref_x, dtype=x.dtype), precision)
    R = ROTATION_METHODS[method](H)
    return jnp.matmul(x - c, R, precision=precision)
