"""Time-lagged CV learning: TICA and the VAMP-2 neural objective.

The fourth CV-learning family of the reference's research ecosystem
(reference README.rst:51 — "adaptive learning of reaction coordinates"):
where the eigenfunction loss (losses.py) learns slow modes from FORCES
(gradients under the Boltzmann measure), time-lagged methods learn them
from DYNAMICS — pairs ``(x_t, x_{t+tau})`` sampled from trajectories.

- :func:`tica` — linear time-lagged independent component analysis: the
  generalized eigenproblem ``C_0t v = lambda C_00 v`` over feature
  time-series, solved by whitening + a symmetric ``eigh``. Eigenvalues
  are lag-``tau`` autocorrelations of the recovered slow modes;
  ``implied timescales`` follow as ``-tau / log(lambda)``.
- :func:`vamp2_loss` — the VAMP-2 score of Wu & Noé (negated, for
  minimization) on a nonlinear model's outputs:
  ``R_2 = || C_00^{-1/2} C_0t C_tt^{-1/2} ||_F^2``, computed via Cholesky
  solves (``tr(C_00^{-1} C_0t C_tt^{-1} C_0t^T)``) so no gradient ever
  flows through an ``eigh`` (XLA's eigh VJP NaNs at degenerate spectra —
  see molann_tpu/ops/alignment.py).

Every statistic is a global weighted moment of the batch, so both are
exact under data-parallel ``make_train_step(mesh=...)``: GSPMD computes
the moments over the full sharded batch with ICI all-reduces.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TICAResult",
    "tica",
    "vamp2_score",
    "vamp2_loss",
    "make_vamp_loss",
]


def _normalized_weights(l, weights, dtype):
    if weights is None:
        return jnp.full((l,), 1.0 / l, dtype)
    w = jnp.asarray(weights, dtype)
    return w / jnp.sum(w)


def _lagged_moments(f0, ft, w):
    """Weighted means and (uncentered-of-centered) covariance blocks."""
    m0 = jnp.sum(w[:, None] * f0, axis=0)
    mt = jnp.sum(w[:, None] * ft, axis=0)
    f0c = f0 - m0
    ftc = ft - mt
    c00 = (f0c * w[:, None]).T @ f0c
    ctt = (ftc * w[:, None]).T @ ftc
    c0t = (f0c * w[:, None]).T @ ftc
    return m0, mt, c00, ctt, c0t


@dataclass
class TICAResult:
    """Linear slow modes of a feature time series.

    eigenvalues ``[k]``: lag-``tau`` autocorrelations, descending (the
    first is the slowest mode). modes ``[d, k]``: projection vectors in
    feature space, normalized to unit variance under the data
    (``C_00``-orthonormal). mean ``[d]``: the feature mean removed before
    projecting. lag: the lag (in whatever unit the caller sampled pairs
    at) — used by :meth:`timescales`.
    """

    eigenvalues: np.ndarray
    modes: np.ndarray
    mean: np.ndarray
    lag: float = 1.0

    def transform(self, f):
        """Project features ``[l, d]`` onto the slow modes ``[l, k]``."""
        return (jnp.asarray(f) - self.mean) @ self.modes

    def timescales(self):
        """Implied timescales ``-lag / log(lambda_i)`` (inf for
        lambda >= 1, nan for lambda <= 0)."""
        lam = np.asarray(self.eigenvalues, dtype=np.float64)
        out = np.full(lam.shape, np.nan)
        ok = (lam > 0) & (lam < 1)
        out[ok] = -self.lag / np.log(lam[ok])
        out[lam >= 1] = np.inf
        return out


def tica(f0, ft, *, weights=None, reversible=True, eps=1e-6, lag=1.0,
         n_modes=None):
    """Linear TICA over feature pairs ``(f0 [l, d], ft [l, d])``.

    Solves ``C_0t v = lambda C_00 v`` by symmetric whitening:
    ``M = C_00^{-1/2} C_0t C_00^{-1/2}``, ``eigh(M)``, modes mapped back
    through the whitener. With ``reversible`` (default) the estimator is
    symmetrized — means/covariances pooled over both time legs and
    ``C_0t <- (C_0t + C_0t^T)/2`` — which guarantees real eigenvalues in
    ``[-1, 1]`` for equilibrium data; set ``reversible=False`` for
    off-equilibrium data (then ``M`` is SVD'd and singular values are
    reported). ``weights [l]`` reweight pairs (e.g. metadynamics
    ``frame_weights`` at the pair's start frame); unnormalized is fine.

    Host-side solver (numpy eigh on a ``[d, d]`` matrix — feature counts
    are small); the heavy moment accumulation is jitted JAX.

    Example:
        >>> import numpy as np
        >>> rng = np.random.default_rng(0)
        >>> z = np.zeros((20001, 1), np.float32)
        >>> for t in range(20000):   # AR(1), autocorrelation 0.8
        ...     z[t + 1] = 0.8 * z[t] + np.sqrt(1 - 0.8**2) * rng.normal()
        >>> r = tica(z[:-1], z[1:])
        >>> bool(abs(r.eigenvalues[0] - 0.8) < 0.05)
        True
    """
    f0 = jnp.asarray(f0, jnp.float32)
    ft = jnp.asarray(ft, jnp.float32)
    if f0.shape != ft.shape or f0.ndim != 2:
        raise ValueError(
            f"f0/ft must be matching [l, d] arrays, got {f0.shape} vs "
            f"{ft.shape}"
        )
    w = _normalized_weights(f0.shape[0], weights, f0.dtype)
    m0, mt, c00, ctt, c0t = jax.jit(_lagged_moments)(f0, ft, w)

    d = f0.shape[1]
    m0 = np.asarray(m0, np.float64)
    mt = np.asarray(mt, np.float64)
    c00 = np.asarray(c00, np.float64)
    ctt = np.asarray(ctt, np.float64)
    c0t = np.asarray(c0t, np.float64)
    if reversible:
        # pool the two legs around the common mean; symmetrize C_0t
        mean = 0.5 * (m0 + mt)
        dm0, dmt = m0 - mean, mt - mean
        c0 = 0.5 * (c00 + np.outer(dm0, dm0) + ctt + np.outer(dmt, dmt))
        ct = c0t + np.outer(dm0, dmt)
        ct = 0.5 * (ct + ct.T)
    else:
        mean = m0
        c0, ct = c00, c0t

    s, u = np.linalg.eigh(c0 + eps * np.eye(d))
    keep = s > max(eps, s.max() * 1e-12)
    whiten = u[:, keep] / np.sqrt(s[keep])  # [d, r]
    m = whiten.T @ ct @ whiten              # [r, r]
    if reversible:
        lam, v = np.linalg.eigh(m)
        order = np.argsort(lam)[::-1]
        lam, v = lam[order], v[:, order]
    else:
        if not np.allclose(m, m.T, atol=1e-10):
            uu, lam, vvt = np.linalg.svd(m)
            v = uu
        else:
            lam, v = np.linalg.eigh(m)
            order = np.argsort(lam)[::-1]
            lam, v = lam[order], v[:, order]
    modes = whiten @ v  # C_00-orthonormal directions in feature space
    if n_modes is not None:
        lam, modes = lam[:n_modes], modes[:, :n_modes]
    return TICAResult(
        eigenvalues=np.asarray(lam, np.float64),
        modes=np.asarray(modes, np.float64),
        mean=np.asarray(mean, np.float64),
        lag=float(lag),
    )


def vamp2_score(f0, ft, *, weights=None, eps=1e-6):
    """VAMP-2 score of output pairs ``(f0 [l, k], ft [l, k])``:
    ``R_2 = tr(C_00^{-1} C_0t C_tt^{-1} C_0t^T)`` — the sum of squared
    singular values of the whitened time-lagged covariance (the constant
    singular function is excluded by mean-centering). For a model whose
    span contains the true ``m`` slowest left/right singular functions of
    the transfer operator at this lag, the supremum is
    ``sum_i sigma_i^2``; maximizing over models recovers them.

    Differentiable everywhere: inverses go through Cholesky solves of the
    ``eps``-regularized covariances, never an ``eigh``.
    """
    f0 = jnp.asarray(f0)
    ft = jnp.asarray(ft)
    w = _normalized_weights(f0.shape[0], weights, f0.dtype)
    _, _, c00, ctt, c0t = _lagged_moments(f0, ft, w)
    k = f0.shape[1]
    eye = jnp.eye(k, dtype=f0.dtype)
    a = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(c00 + eps * eye), c0t
    )  # C_00^{-1} C_0t
    b = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(ctt + eps * eye), c0t.T
    )  # C_tt^{-1} C_0t^T
    return jnp.sum(a * b.T)


def vamp2_loss(model, x_t, x_tau, *, weights=None, eps=1e-6,
               return_aux=False):
    """Negated VAMP-2 score of a model's CVs over time-lagged coordinate
    pairs — the trainable objective: ``loss = -R_2(model(x_t),
    model(x_tau))``. Minimizing it makes the model outputs span the
    slowest singular functions of the dynamics at this lag (Wu & Noé,
    "Variational approach for learning Markov processes from time series
    data"). ``weights [l]`` are per-pair importance weights.

    With ``return_aux=True`` also returns ``{"vamp2": R_2,
    "autocorrelations": [k]}`` — the symmetrized-TICA eigenvalues of the
    model outputs (diagnostic: implied timescales of the learned CVs).
    The aux path solves the TICA eigenproblem on the host, so it is
    eager-only — train on ``return_aux=False`` (jittable everywhere)
    and call this once afterwards for diagnostics.
    """
    f0 = model(x_t)
    ft = model(x_tau)
    score = vamp2_score(f0, ft, weights=weights, eps=eps)
    if not return_aux:
        return -score
    r = tica(jax.lax.stop_gradient(f0), jax.lax.stop_gradient(ft),
             weights=weights, eps=eps)
    k = f0.shape[1]
    return -score, {
        "vamp2": score,
        "autocorrelations": jnp.asarray(r.eigenvalues[:k], f0.dtype),
    }


def make_vamp_loss(**kwargs):
    """``(model, batch) -> scalar`` wrapper for :func:`fit` /
    :func:`make_train_step`. ``batch`` is ``(x_t, x_tau)`` or
    ``(x_t, x_tau, weights)``.

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> mlp = create_sequential_nn([6, 8, 2], key=jax.random.PRNGKey(0))
        >>> model = lambda x: mlp(x.reshape(x.shape[0], -1))
        >>> x = jax.random.normal(jax.random.PRNGKey(1), (32, 2, 3))
        >>> loss_fn = make_vamp_loss()
        >>> float(loss_fn(model, (x[:-1], x[1:]))) == float(
        ...     loss_fn(model, (x[:-1], x[1:], jnp.ones(31))))
        True
    """

    def loss_fn(model, batch):
        if len(batch) == 3:
            x_t, x_tau, weights = batch
        else:
            x_t, x_tau = batch
            weights = None
        return vamp2_loss(model, x_t, x_tau, weights=weights, **kwargs)

    return loss_fn
