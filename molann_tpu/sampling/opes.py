"""OPES: on-the-fly probability enhanced sampling along model CVs.

The modern successor to metadynamics (Invernizzi & Parrinello, "Rethinking
Metadynamics: From Bias Potentials to Probability Distributions", JPCL 11,
2731 (2020)): instead of piling up hills forever, OPES maintains a
weighted kernel-density estimate ``P̃(s)`` of the UNBIASED CV probability
and applies the bias

    ``V(s) = (1 - 1/γ) kT · log( P̃(s)/Z + ε )``

which converts ``P`` into the well-tempered target ``P^{1/γ}``. Three
properties metadynamics lacks: the bias converges (no unbounded growth),
its depth is capped at ``ΔE`` from step one (``ε = exp(-β ΔE/(1-1/γ))``
— the "barrier" parameter, the ONLY physical input), and reweighting
``w ∝ exp(+βV)`` is quasi-static almost immediately.

Each deposited kernel carries the importance weight ``w_k =
exp(β V(s_k))`` of its own sample under the bias at deposit time, so the
KDE estimates the unbiased distribution; ``Z`` renormalizes over the
explored region (mean of ``P̃`` over the deposited kernel centers).

Two modes, selected by ``opes_langevin(..., adaptive=)``:

- ``adaptive=False`` (default): fixed kernel bandwidth ``sigma``, one
  kernel appended per walker per period into a statically-sized buffer
  like :class:`molann_tpu.sampling.MetadBias` — simple and exactly
  reproducible, but the buffer grows with run length and the bandwidth
  never sharpens.
- ``adaptive=True``: the PLUMED scheme (plumed.org OPES_METAD,
  Invernizzi & Parrinello 2020 SI): new-kernel bandwidth shrinks with
  the effective sample size, ``σ = σ0 [n_eff (d+2)/4]^{-1/(d+4)}``
  with ``n_eff = (Σw)²/Σw²``, and a kernel landing within
  ``merge_threshold·σ`` of an existing kernel is COMPRESSED into it by
  a moment-preserving merge (weight sum, weighted-mean center,
  second-moment-matched bandwidth) instead of appended. The kernel
  list lives in a fixed ``max_kernels`` buffer — when full, every
  deposit merges into its nearest kernel — so arbitrarily long runs
  keep refining the bias estimate at O(max_kernels) cost per step,
  still as one compiled ``lax.scan``.

The reference ships no dynamics at all (SURVEY.md §2.3); this exists
as the downstream consumer of its CV models (reference README.rst:51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["OpesBias", "opes_langevin"]

_TINY = 1e-30


def _raw_kde(q, centers, weights, sigmas):
    """Weighted Gaussian KDE ``[m, d] -> [m]`` with per-kernel
    bandwidths ``sigmas [k]``. Each kernel carries the ``σ_k^{-d}``
    normalization — required once bandwidths differ between kernels;
    the remaining common ``(2π)^{-d/2}`` factor cancels in every
    ``P̃/Z`` ratio and only shifts ``-kT log P̃`` by a constant.
    Empty slots (``σ_k = 0``) are guarded (their weight is 0)."""
    d = q.shape[-1]
    s = jnp.where(sigmas > 0, sigmas, 1.0)
    diff = q[:, None, :] - centers[None, :, :]
    g = jnp.exp(-jnp.sum(diff * diff, axis=-1) / (2.0 * s**2))
    return jnp.sum(g * (weights * s ** (-d))[None, :], axis=-1)


class OpesBias:
    """Accumulated OPES state: kernel ``centers [k, d]`` with importance
    ``weights [k]``, bandwidth ``sigma``, bias factor ``gamma``, and the
    barrier cap ``barrier`` (ΔE) at temperature ``kT``.

    ``energy(cv [W, d]) -> [W]`` is the bias ``V(s)`` — in ``[-ΔE, ~0]``,
    highest where the estimated probability is highest."""

    def __init__(self, centers, weights, *, sigma, gamma, kT, barrier,
                 n_active=None, sigmas=None):
        self.centers = jnp.asarray(centers, jnp.float32)
        self.weights = jnp.asarray(weights, jnp.float32)
        self.sigma = float(sigma)  # σ0 (deposit-time base bandwidth)
        k = self.centers.shape[0]
        # per-kernel bandwidths: uniform σ0 unless the adaptive scheme
        # produced shrunk/merged kernels
        self.sigmas = (jnp.full((k,), jnp.float32(self.sigma))
                       if sigmas is None
                       else jnp.asarray(sigmas, jnp.float32))
        self.gamma = float(gamma)
        self.kT = float(kT)
        self.barrier = float(barrier)
        self.n_active = k if n_active is None else n_active
        if self.gamma <= 1.0:
            raise ValueError("gamma must be > 1")

    @property
    def _prefactor(self):
        return (1.0 - 1.0 / self.gamma) * self.kT

    @property
    def _epsilon(self):
        return jnp.exp(-self.barrier / self._prefactor)

    def _masked_weights(self):
        mask = (
            jnp.arange(self.centers.shape[0]) < self.n_active
        ).astype(jnp.float32)
        return self.weights * mask, mask

    def energy(self, cv):
        """``V(s)`` on CV points ``[W, d] -> [W]`` (identically zero
        while the estimator is empty — the bias only exists once a
        kernel has been deposited)."""
        w, mask = self._masked_weights()
        p = _raw_kde(jnp.asarray(cv, jnp.float32), self.centers, w,
                     self.sigmas)
        p_cent = _raw_kde(self.centers, self.centers, w, self.sigmas)
        z = jnp.sum(p_cent * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        # the untaken branch must be NaN-free even in its GRADIENT
        # (d log(p/z+eps) = p'/(p + z*eps) -> 0/0 when everything is
        # zero), so substitute a safe z before the log, then select
        active = z > 0
        ratio = p / jnp.where(active, z, 1.0)
        v = self._prefactor * jnp.log(ratio + self._epsilon)
        return jnp.where(active, v, 0.0)

    def free_energy_estimate(self, grid):
        """Free energy on a ``[m, d]`` grid (up to a constant):
        ``-kT log P̃(s)`` — the kernels carry importance weights, so the
        KDE estimates the UNBIASED distribution directly (no
        ``γ/(γ-1)`` scaling like metadynamics needs). Unexplored points
        come back ``+inf``-free via a floor at the ΔE cap below the
        explored maximum (max of P̃ over the deposited centers — a
        fixed property of the estimator, so the function stays smooth
        and per-point; ``mep`` differentiates it)."""
        w, mask = self._masked_weights()
        p = _raw_kde(jnp.asarray(grid, jnp.float32), self.centers, w,
                     self.sigmas)
        p_cent = _raw_kde(self.centers, self.centers, w, self.sigmas)
        pmax = jnp.maximum(jnp.max(p_cent * mask), _TINY)
        floor = pmax * jnp.exp(-self.barrier / self.kT)
        return -self.kT * jnp.log(jnp.maximum(p, floor))

    def frame_weights(self, cv, kT=None):
        """Per-frame reweighting factors ``w_t ∝ exp(+V(s_t)/kT)`` for
        recovering unbiased averages from the biased trajectory
        (normalized to mean 1) — same contract as
        :meth:`MetadBias.frame_weights`, feed into the ``weights=`` of
        the training losses."""
        kT = self.kT if kT is None else float(kT)
        v = self.energy(cv) / kT
        w = jnp.exp(v - jnp.max(v))
        return w / jnp.mean(w)

    def save(self, path):
        """Write the kernels to ``path`` (.npz). Only active kernels are
        written; the ``opes`` marker field lets
        :func:`molann_tpu.sampling.load_bias` dispatch between OPES and
        metadynamics hills files."""
        import numpy as np

        k = int(self.n_active)
        np.savez(path, opes=1, centers=np.asarray(self.centers[:k]),
                 weights=np.asarray(self.weights[:k]), sigma=self.sigma,
                 sigmas=np.asarray(self.sigmas[:k]),
                 gamma=self.gamma, kT=self.kT, barrier=self.barrier)

    @classmethod
    def load(cls, path):
        import numpy as np

        with np.load(path) as f:
            if "opes" not in f:
                raise ValueError(
                    f"{path} is not an OPES kernels file (use "
                    "MetadBias.load / load_bias for hills files)"
                )
            return cls(
                f["centers"], f["weights"], sigma=float(f["sigma"]),
                sigmas=f["sigmas"] if "sigmas" in f else None,
                gamma=float(f["gamma"]), kT=float(f["kT"]),
                barrier=float(f["barrier"]),
            )


def opes_langevin(energy_fn, cv_model, x0, *, n_steps, dt, kT, key,
                  sigma, stride, barrier, gamma=None, adaptive=False,
                  max_kernels=None, merge_threshold=1.0):
    """Multiple-walker OPES along the model's CV, as ONE compiled
    ``lax.scan`` (same shape as
    :func:`~molann_tpu.sampling.metadynamics_langevin`: ``stride`` steps
    per period with the bias frozen, then every walker deposits one
    kernel).

    barrier: ΔE, the expected barrier height (energy units of
    ``energy_fn``) — caps the bias depth. gamma: bias factor; default
    ``ΔE/kT`` (the PLUMED default), targeting ``P^{1/γ}``.

    adaptive: enable the PLUMED bandwidth-shrink + kernel-compression
    scheme (module docstring) — new kernels use
    ``σ = σ0 [n_eff (d+2)/4]^{-1/(d+4)}`` (floored at ``σ0/10``) and
    merge moment-preservingly into any kernel closer than
    ``merge_threshold·σ``; the kernel list is bounded by
    ``max_kernels`` slots (default ``min(n_walkers·n_periods, 512)``)
    and, when full, every deposit merges into its nearest kernel, so
    long runs keep refining the bias instead of exhausting a buffer or
    freezing.

    Returns ``(traj [n_periods, W, n, 3] recorded at period ends,
    x_final, bias)`` with ``bias`` the accumulated :class:`OpesBias`.
    """
    if n_steps % stride:
        raise ValueError("n_steps must be a multiple of stride")
    if barrier <= 0:
        raise ValueError("barrier must be > 0")
    gamma = float(barrier / kT) if gamma is None else float(gamma)
    if gamma <= 1.0:
        raise ValueError(
            f"gamma must be > 1 (got {gamma:g}; barrier/kT too small?)"
        )
    x0 = jnp.asarray(x0, dtype=jnp.float32)
    n_periods = n_steps // stride
    W = x0.shape[0]
    d = cv_model(x0[:1]).shape[-1]
    sigma = float(sigma)
    pref = jnp.float32((1.0 - 1.0 / gamma) * kT)
    eps = jnp.exp(jnp.float32(-barrier) / pref)

    def bias_at(cv, centers, weights, sigmas, z):
        # z <= 0 marks an empty estimator: no bias yet (NOT the constant
        # pref*log(eps) = -barrier, which would poison the first
        # deposits' importance weights by exp(-barrier/kT)). The safe-z
        # substitution keeps the untaken branch NaN-free in the GRADIENT
        # too (d log(p/z+eps) = p'/(p + z*eps) is 0/0 at p = p' = z = 0).
        p = _raw_kde(cv, centers, weights, sigmas)
        active = z > 0
        v = pref * jnp.log(p / jnp.where(active, z, 1.0) + eps)
        return jnp.where(active, v, 0.0)

    def explored_z(centers, weights, sigmas, mask):
        # mean of P̃ over the deposited kernel centers (the explored set)
        p_cent = _raw_kde(centers, centers, weights, sigmas)
        return jnp.sum(p_cent * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def total(x, centers, weights, sigmas, z):
        return jnp.sum(energy_fn(x)) + jnp.sum(
            bias_at(cv_model(x), centers, weights, sigmas, z)
        )

    grad = jax.grad(total)
    dt_ = jnp.float32(dt)
    noise_scale = jnp.sqrt(2.0 * jnp.float32(kT) * dt_)

    def inner(carry, k):
        x, centers, weights, sigmas, z = carry
        xi = jax.random.normal(k, x.shape, dtype=x.dtype)
        x = x - dt_ * grad(x, centers, weights, sigmas, z) + noise_scale * xi
        return (x, centers, weights, sigmas, z), None

    keys = jax.random.split(key, n_periods)

    if not adaptive:
        centers0 = jnp.zeros((n_periods * W, d), dtype=jnp.float32)
        weights0 = jnp.zeros((n_periods * W,), dtype=jnp.float32)
        step_idx = jnp.arange(n_periods * W)
        sig = jnp.float32(sigma)

        def period(carry, pk):
            x, centers, weights = carry
            p, k = pk
            mask = (step_idx < p * W).astype(jnp.float32)
            # Z is frozen-kernel-set function: once per period
            z = explored_z(centers, weights * mask, sig, mask)
            (x, centers, weights, _, _), _ = jax.lax.scan(
                inner, (x, centers, weights, sig, z),
                jax.random.split(k, stride)
            )
            cv = cv_model(x)
            # kernel importance weight = exp(+beta V) at the deposit
            # point, under the bias the sample was actually drawn with
            w_new = jnp.exp(bias_at(cv, centers, weights, sig, z) / kT)
            centers = jax.lax.dynamic_update_slice(centers, cv, (p * W, 0))
            weights = jax.lax.dynamic_update_slice(weights, w_new, (p * W,))
            return (x, centers, weights), x

        (x_final, centers, weights), traj = jax.lax.scan(
            period, (x0, centers0, weights0),
            (jnp.arange(n_periods), keys),
        )
        return traj, x_final, OpesBias(
            centers, weights, sigma=sigma, gamma=gamma, kT=kT,
            barrier=barrier,
        )

    # ---- adaptive: bandwidth shrink + nearest-kernel compression ----
    K = (min(n_periods * W, 512) if max_kernels is None
         else int(max_kernels))
    if K < 1:
        raise ValueError("max_kernels must be >= 1")
    sigma_min = jnp.float32(sigma / 10.0)
    thresh = jnp.float32(merge_threshold)
    slot_idx = jnp.arange(K)

    def deposit(state, sw):
        """Merge-or-append one kernel (s [d], w scalar, σ_new scalar)."""
        centers, weights, sigmas, count = state
        s, w, sigma_new = sw
        act = slot_idx < count
        d2 = jnp.sum((centers - s[None, :]) ** 2, axis=-1)
        d2 = jnp.where(act, d2, jnp.inf)
        j = jnp.argmin(d2)
        full = count >= K
        merge = (d2[j] < (thresh * sigma_new) ** 2) | full
        slot = jnp.where(merge, j, jnp.minimum(count, K - 1))
        w_i = jnp.where(merge, weights[slot], 0.0)
        mu_i = jnp.where(merge, centers[slot], jnp.zeros((d,)))
        s_i = jnp.where(merge, sigmas[slot], 0.0)
        wt = w_i + w
        mu = (w_i * mu_i + w * s) / wt
        # moment-preserving isotropic merge: match the dim-averaged
        # second moment of the two-kernel mixture
        m2 = (w_i * (s_i**2 + jnp.sum(mu_i**2) / d)
              + w * (sigma_new**2 + jnp.sum(s**2) / d)) / wt
        sig_m = jnp.sqrt(jnp.maximum(m2 - jnp.sum(mu**2) / d,
                                     sigma_min**2))
        centers = centers.at[slot].set(mu)
        weights = weights.at[slot].set(wt)
        sigmas = sigmas.at[slot].set(sig_m)
        count = count + jnp.where(merge, 0, 1)
        return (centers, weights, sigmas, count), None

    def period(carry, k):
        x, centers, weights, sigmas, count = carry
        mask = (slot_idx < count).astype(jnp.float32)
        z = explored_z(centers, weights * mask, sigmas, mask)
        (x, centers, weights, sigmas, _), _ = jax.lax.scan(
            inner, (x, centers, weights, sigmas, z),
            jax.random.split(k, stride)
        )
        cv = cv_model(x)
        w_new = jnp.exp(bias_at(cv, centers, weights, sigmas, z) / kT)
        # PLUMED bandwidth shrink from the effective sample size of
        # everything deposited so far (incl. this period's walkers)
        wm = weights * mask
        sw = jnp.sum(wm) + jnp.sum(w_new)
        sw2 = jnp.sum(wm * wm) + jnp.sum(w_new * w_new)
        n_eff = (sw * sw) / jnp.maximum(sw2, _TINY)
        shrink = (n_eff * (d + 2) / 4.0) ** (-1.0 / (d + 4))
        sigma_new = jnp.maximum(jnp.float32(sigma) * shrink, sigma_min)
        (centers, weights, sigmas, count), _ = jax.lax.scan(
            deposit, (centers, weights, sigmas, count),
            (cv, w_new, jnp.full((W,), sigma_new)),
        )
        return (x, centers, weights, sigmas, count), x

    centers0 = jnp.zeros((K, d), dtype=jnp.float32)
    weights0 = jnp.zeros((K,), dtype=jnp.float32)
    sigmas0 = jnp.zeros((K,), dtype=jnp.float32)
    (x_final, centers, weights, sigmas, count), traj = jax.lax.scan(
        period, (x0, centers0, weights0, sigmas0, jnp.int32(0)), keys
    )
    return traj, x_final, OpesBias(
        centers, weights, sigma=sigma, sigmas=sigmas, gamma=gamma,
        kT=kT, barrier=barrier, n_active=int(count),
    )
