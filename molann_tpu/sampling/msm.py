"""Markov state models over discretized CV trajectories.

The standard downstream analysis of a learned collective variable
(reference README.rst:51 — the CVs exist to coarse-grain dynamics):
discretize the CV time series into states, count lag-time transitions,
estimate a (reversible) transition matrix, and read off stationary
populations, relaxation timescales, and the Chapman-Kolmogorov test
that validates Markovianity at the chosen lag.

Estimators follow the standard MSM literature (Prinz et al., JCP 134,
174105 (2011)): sliding-window counts, maximum-likelihood reversible
transition matrix via the self-consistent x_ij iteration, implied
timescales ``-lag / log |lambda_i|``.

Host-side numpy throughout — count matrices are tiny; the heavy work
(producing the CV series) already ran on the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "grid_assign",
    "count_matrix",
    "transition_matrix",
    "MSM",
    "estimate_msm",
    "ck_test",
]


def grid_assign(values, edges):
    """Assign CV samples to grid states.

    values: ``[T]`` or ``[T, d]`` CV samples. edges: one 1-D array of bin
    edges per CV dimension. Returns integer labels ``[T]`` in
    ``[0, prod(n_bins))`` (row-major over dimensions); samples outside
    the grid clamp to the boundary bins.
    """
    v = np.asarray(values, np.float64)
    if v.ndim == 1:
        v = v[:, None]
    edges = [np.asarray(e, np.float64) for e in (
        [edges] if np.ndim(edges[0]) == 0 else edges)]
    if len(edges) != v.shape[1]:
        raise ValueError(
            f"got {len(edges)} edge arrays for {v.shape[1]}-dim CVs"
        )
    labels = np.zeros(v.shape[0], np.int64)
    for k, e in enumerate(edges):
        nb = len(e) - 1
        if nb < 1:
            raise ValueError("each edges array needs >= 2 entries")
        idx = np.clip(np.searchsorted(e, v[:, k], side="right") - 1, 0,
                      nb - 1)
        labels = labels * nb + idx
    return labels


def count_matrix(labels, n_states, lag, *, sliding=True):
    """Transition count matrix ``C[i, j]`` = #(s_t = i, s_{t+lag} = j).

    labels: one ``[T]`` integer series or a list of them (independent
    trajectories/walkers — pairs never cross series). ``sliding`` counts
    every t (standard); ``False`` strides by ``lag`` (independent
    counts, for error estimation).
    """
    if lag < 1:
        raise ValueError(f"lag must be >= 1, got {lag}")
    series = labels if isinstance(labels, (list, tuple)) else [labels]
    c = np.zeros((n_states, n_states), np.float64)
    for s in series:
        s = np.asarray(s, np.int64)
        if s.min() < 0 or s.max() >= n_states:
            raise ValueError("labels outside [0, n_states)")
        if len(s) <= lag:
            continue
        a = s[:-lag] if sliding else s[: (len(s) - 1) // lag * lag : lag]
        b = s[lag:] if sliding else s[lag : (len(s) - 1) // lag * lag
                                      + lag : lag]
        np.add.at(c, (a, b), 1.0)
    return c


def transition_matrix(counts, *, reversible=True, tol=1e-10,
                      max_iter=10_000):
    """Maximum-likelihood transition matrix from a count matrix.

    reversible=True runs the standard self-consistent iteration for the
    detailed-balance-constrained MLE (Prinz et al. 2011, eq. 27):
    ``x_ij <- (c_ij + c_ji) / (c_i/x_i + c_j/x_j)``, ``T = x / rowsum``;
    the stationary distribution is then ``x_i / sum(x)`` exactly.
    reversible=False is the row-normalized MLE. States with zero
    outgoing counts get a self-loop (absorbing placeholder).

    Returns ``(T [n, n], pi [n])``.
    """
    c = np.asarray(counts, np.float64)
    n = c.shape[0]
    if c.shape != (n, n) or (c < 0).any():
        raise ValueError("counts must be a nonnegative square matrix")
    rows = c.sum(axis=1)
    if not reversible:
        t = np.where(rows[:, None] > 0, c / np.maximum(rows, 1)[:, None],
                     np.eye(n))
        # stationary: left eigenvector of the largest eigenvalue
        w, v = np.linalg.eig(t.T)
        i = int(np.argmax(w.real))
        pi = np.abs(v[:, i].real)
        return t, pi / pi.sum()

    csym = c + c.T
    x = csym.copy()  # init: symmetrized counts
    ci = rows
    active = csym.sum(axis=1) > 0
    for _ in range(max_iter):
        xi = x.sum(axis=1)
        denom = (np.divide(ci, xi, out=np.zeros(n), where=xi > 0)[:, None]
                 + np.divide(ci, xi, out=np.zeros(n), where=xi > 0)[None, :])
        x_new = np.divide(csym, denom, out=np.zeros_like(x),
                          where=denom > 0)
        delta = np.abs(x_new - x).max()
        x = x_new
        if delta < tol * max(1.0, x.max()):
            break
    xi = x.sum(axis=1)
    t = np.where(active[:, None], np.divide(
        x, np.maximum(xi, 1e-300)[:, None]), np.eye(n))
    pi = np.where(active, xi, 0.0)
    s = pi.sum()
    return t, (pi / s if s > 0 else np.full(n, 1.0 / n))


@dataclass
class MSM:
    """Estimated Markov state model at one lag.

    transition ``[n, n]``, stationary ``pi [n]``, ``lag`` (frames), and
    eigenvalues (descending by magnitude, excluding the stationary 1).
    """

    transition: np.ndarray
    pi: np.ndarray
    lag: float
    eigenvalues: np.ndarray

    def timescales(self):
        """Implied timescales ``-lag / log |lambda_i|`` of the non-
        stationary eigenvalues (same frame units as ``lag``)."""
        lam = np.abs(self.eigenvalues)
        out = np.full(lam.shape, np.inf)
        ok = (lam > 0) & (lam < 1)
        out[ok] = -self.lag / np.log(lam[ok])
        return out


def estimate_msm(labels, n_states, lag, *, reversible=True, sliding=True):
    """Count + estimate in one call -> :class:`MSM`."""
    c = count_matrix(labels, n_states, lag, sliding=sliding)
    t, pi = transition_matrix(c, reversible=reversible)
    w = np.linalg.eigvals(t)
    w = w[np.argsort(-np.abs(w))]
    # drop the stationary eigenvalue (the one closest to 1)
    return MSM(transition=t, pi=pi, lag=float(lag),
               eigenvalues=w[1:].real if reversible else w[1:])


def ck_test(labels, n_states, lag, *, factors=(2, 4), reversible=True):
    """Chapman-Kolmogorov test: is ``T(lag)^k ~ T(k*lag)``?

    For each factor ``k``, estimates an MSM at ``k*lag`` and compares it
    with the ``lag``-model propagated ``k`` steps. Returns
    ``{k: max_ij |T(lag)^k - T(k*lag)|}`` — small values (<~0.1) mean
    the discretization is Markovian at this lag; large values mean the
    states hide slow structure (pick a longer lag or better CVs).
    """
    base = estimate_msm(labels, n_states, lag, reversible=reversible)
    out = {}
    for k in factors:
        ref = estimate_msm(labels, n_states, int(k) * lag,
                           reversible=reversible)
        prop = np.linalg.matrix_power(base.transition, int(k))
        out[int(k)] = float(np.abs(prop - ref.transition).max())
    return out
