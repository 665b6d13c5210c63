"""MBAR reweighting and umbrella sampling along model CVs.

Umbrella sampling — harmonic windows along a collective variable,
recombined into an unbiased free-energy profile by the multistate
Bennett acceptance ratio (MBAR, Shirts & Chodera 2008) — is the classic
workhorse the reference's CV networks feed (its README cites adaptive
reaction-coordinate learning for exactly these enhanced-sampling
workflows). This module provides both halves TPU-side:

- :func:`umbrella_sampling`: all windows integrate in ONE batched
  ``lax.scan`` (windows are the walker axis of
  :func:`~molann_tpu.sampling.overdamped_langevin`), biased by harmonic
  restraints on any differentiable CV function;
- :func:`mbar`: the self-consistent MBAR fixed point, fully vectorized
  (logsumexp over a pooled [K, N] reduced-bias matrix), returning window
  free energies and unbiased per-sample log-weights;
- :func:`pmf_from_samples`: weighted-histogram free-energy profile from
  those weights.

Validated against closed forms: harmonic biases on a Gaussian base
(analytic window free energies) and the toy double well's analytic PMF
(tests/test_mbar.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from .langevin import overdamped_langevin

__all__ = ["mbar", "umbrella_sampling", "pmf_from_samples"]


def mbar(u_kn, n_k, *, target_u_n=None, tol=1e-10, max_iter=10_000):
    """Solve the MBAR equations for ``K`` ensembles over pooled samples.

    u_kn: ``[K, N]`` REDUCED (dimensionless, i.e. divided by kT) bias
    potential of ensemble ``k`` evaluated at pooled sample ``n``. For
    umbrella windows on a shared base potential the base energy cancels
    — pass only the window restraint energies. Row ``k`` of ``u_kn``
    must correspond to entry ``k`` of ``n_k`` (samples contributed per
    ensemble, ``sum(n_k) == N``).

    target_u_n: optional ``[N]`` reduced potential of the TARGET
    ensemble the returned weights should represent. Default ``None`` =
    zeros — the shared base for umbrella windows (where the base
    cancels). For temperature reweighting (e.g. replica-exchange rungs,
    ``u_kn = E_n / kT_k``) pass ``E_n / kT_target`` to get weights for
    the target temperature.

    Returns ``(f_k [K], log_w_n [N])``: dimensionless window free
    energies (gauge ``f_0 = 0``) and normalized target-ensemble
    log-weights (``logsumexp(log_w_n) == 0``). Target averages are then
    ``sum(exp(log_w_n) * a_n)``.

    The self-consistent iteration
    ``f_k = -log Σ_n exp(-u_kn) / Σ_j N_j exp(f_j - u_jn)``
    runs as a ``lax.while_loop`` in log space (float32-stable via
    logsumexp); convergence is max |Δf| < tol.
    """
    u_kn = jnp.asarray(u_kn, jnp.float32)
    n_k = jnp.asarray(n_k, jnp.float32)
    log_nk = jnp.log(n_k)

    def log_denominator(f):
        # [N]: log Σ_k N_k exp(f_k - u_kn)
        return logsumexp(log_nk[:, None] + f[:, None] - u_kn, axis=0)

    def update(f):
        logden = log_denominator(f)
        newf = -logsumexp(-u_kn - logden[None, :], axis=1)
        return newf - newf[0]

    def cond(carry):
        f, delta, it = carry
        return (delta > tol) & (it < max_iter)

    def body(carry):
        f, _, it = carry
        newf = update(f)
        return newf, jnp.max(jnp.abs(newf - f)), it + 1

    f0 = jnp.zeros(u_kn.shape[0], jnp.float32)
    f, _, _ = jax.lax.while_loop(cond, body, (f0, jnp.inf, 0))

    log_w = -log_denominator(f)
    if target_u_n is not None:
        log_w = log_w - jnp.asarray(target_u_n, jnp.float32)
    log_w = log_w - logsumexp(log_w)
    return f, log_w


def umbrella_sampling(energy_fn, cv_fn, x0, centers, *, k_spring, n_steps,
                      dt, kT, key, thin=10, n_equil=0):
    """Run one harmonic umbrella window per walker, all in one compiled
    scan.

    energy_fn: ``[W, n, 3] -> [W]`` base potential.
    cv_fn: ``[W, n, 3] -> [W]`` differentiable collective variable (e.g.
    ``lambda x: model(x)[:, 0]`` for a trained MolANN CV).
    x0: ``[W, n, 3]`` start configuration per window (start each window
    near its center — :func:`~molann_tpu.sampling.rotate_torsion` helps).
    centers: ``[W]`` restraint centers; restraint =
    ``k_spring/2 (cv - center)²``.

    Returns ``(cv_samples [W, T], traj [T, W, n, 3])`` with the first
    ``n_equil`` recorded frames discarded.
    """
    centers = jnp.asarray(centers, jnp.float32)

    def restraint(x):
        return 0.5 * jnp.float32(k_spring) * (cv_fn(x) - centers) ** 2

    traj, _ = overdamped_langevin(
        energy_fn, x0, n_steps=n_steps, dt=dt, kT=kT, key=key, thin=thin,
        extra_energy_fn=restraint,
    )
    traj = traj[n_equil:]
    cv = jax.lax.map(cv_fn, traj)  # [T, W]
    return cv.T, traj


def pmf_from_samples(values, log_w, grid_edges, *, kT=1.0):
    """Weighted-histogram free-energy profile.

    values ``[N]``: the observable (e.g. pooled CV samples); log_w
    ``[N]``: normalized unbiased log-weights from :func:`mbar`;
    grid_edges ``[M+1]``: histogram bin edges. Returns ``F [M]`` in
    energy units (``kT`` sets the scale), shifted so ``min F = 0``;
    empty bins are ``inf``.
    """
    values = np.asarray(values).reshape(-1)
    w = np.exp(np.asarray(log_w).reshape(-1))
    hist, _ = np.histogram(values, bins=np.asarray(grid_edges), weights=w)
    if not hist.any():
        edges = np.asarray(grid_edges)
        span = (f"sample range [{values.min()}, {values.max()}]"
                if values.size else "no samples at all")
        raise ValueError(
            f"no samples fall inside the grid [{edges[0]}, {edges[-1]}] "
            f"({span}); widen grid_edges to cover the data"
        )
    with np.errstate(divide="ignore"):
        f = -float(kT) * np.log(hist)
    return f - f[np.isfinite(f)].min()
