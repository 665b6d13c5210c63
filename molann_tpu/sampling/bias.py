"""CV-space biases driven by a MolANN model's coordinate gradients.

This is the downstream-consumer side of the reference's contract: a
trained CV model (MolANN / PreprocessingANN) is differentiated w.r.t.
atomic coordinates and the chain rule turns a bias potential in CV space
into forces on atoms. ``jax.grad`` composes the chain automatically, so
a bias is just an extra energy term ``V(cv_model(x))`` handed to the
integrator; on the serving path the same gradients come out of the fused
Pallas kernel (ops/fused.py fused_cv_forces — parity is checked in
scripts/tpu_validation.py).

Two biases:

- :func:`steered_langevin` — a harmonic restraint whose center walks
  linearly from ``s0`` to ``s1`` in CV space (steered MD).
- :func:`metadynamics_langevin` — multiple-walker metadynamics: every
  ``stride`` steps each walker deposits a Gaussian at its current CV;
  the accumulated :class:`MetadBias` pushes walkers out of visited
  basins (history-dependent flattening of the CV free-energy surface).

Both run as ONE compiled program: deposits are
``lax.dynamic_update_slice`` writes into a statically-sized center
buffer, periods are ``lax.scan`` iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .langevin import overdamped_langevin

__all__ = ["MetadBias", "steered_langevin", "metadynamics_langevin"]


class MetadBias:
    """Accumulated metadynamics bias: Gaussians of ``height`` (scaled by
    per-deposit ``weights`` in the well-tempered variant) and width
    ``sigma`` at ``centers [k, d]`` in CV space. ``energy(cv [W, d]) ->
    [W]``."""

    def __init__(self, centers, height, sigma, n_active=None,
                 weights=None, gamma=None):
        self.centers = jnp.asarray(centers, dtype=jnp.float32)
        self.height = float(height)
        self.sigma = float(sigma)
        k = self.centers.shape[0]
        self.n_active = k if n_active is None else n_active
        self.weights = (
            jnp.ones((k,), jnp.float32) if weights is None
            else jnp.asarray(weights, jnp.float32)
        )
        self.gamma = gamma  # well-tempered bias factor (None = standard)

    def energy(self, cv):
        diff = cv[:, None, :] - self.centers[None, :, :]
        g = jnp.exp(
            -jnp.sum(diff * diff, axis=-1) / (2.0 * self.sigma**2)
        )
        mask = (
            jnp.arange(self.centers.shape[0]) < self.n_active
        ).astype(cv.dtype)
        return self.height * jnp.sum(
            g * (mask * self.weights)[None, :], axis=-1
        )

    def free_energy_estimate(self, grid):
        """Free energy on a ``[m, d]`` grid of CV points (up to a
        constant): ``-V(s)`` for standard metadynamics, scaled by
        ``gamma/(gamma-1)`` in the well-tempered variant (the standard
        WTMetaD estimator)."""
        v = self.energy(jnp.asarray(grid, dtype=jnp.float32))
        if self.gamma is not None:
            return -(self.gamma / (self.gamma - 1.0)) * v
        return -v

    def frame_weights(self, cv, kT):
        """Per-frame reweighting factors ``w_t ∝ exp(+V_b(s_t)/kT)``
        for recovering UNBIASED averages from a biased trajectory under
        the final (quasi-static) bias — the standard last-bias WTMetaD
        estimator. Returns weights normalized to mean 1 over the input
        (so ``mean(w * f(s))`` estimates the unbiased ``<f>``),
        numerically stabilized by subtracting the max exponent.

        Feed these straight into the ``weights=`` argument of
        :func:`molann_tpu.train.autoencoder_loss` to retrain a CV model
        on reweighted biased data — the adaptive
        sample→reweight→retrain loop of the reference's downstream
        research workflow (reference README.rst:51, "adaptive learning
        of reaction coordinates")."""
        v = self.energy(jnp.asarray(cv, dtype=jnp.float32)) / float(kT)
        w = jnp.exp(v - jnp.max(v))
        return w / jnp.mean(w)

    def save(self, path):
        """Write the hills to ``path`` (.npz). Well-tempered runs carry
        per-deposit ``weights`` + ``gamma``; standard runs stay in the
        weight-free format (the two are mutually round-trippable via
        :meth:`load`). Only the active deposits are written."""
        import numpy as np

        k = int(self.n_active)
        extra = {}
        if self.gamma is not None:
            extra = dict(
                weights=np.asarray(self.weights[:k]), gamma=self.gamma
            )
        np.savez(path, centers=np.asarray(self.centers[:k]),
                 height=self.height, sigma=self.sigma, **extra)

    @classmethod
    def load(cls, path):
        """Rebuild a :class:`MetadBias` from a hills ``.npz`` written by
        :meth:`save` (or ``molann_tpu sample --bias-out``)."""
        import numpy as np

        with np.load(path) as f:
            return cls(
                f["centers"], float(f["height"]), float(f["sigma"]),
                weights=f["weights"] if "weights" in f else None,
                gamma=float(f["gamma"]) if "gamma" in f else None,
            )


def steered_langevin(energy_fn, cv_model, x0, *, s0, s1, k_spring,
                     n_steps, dt, kT, key, thin=10):
    """Steered MD: pull the model's CV from ``s0`` to ``s1`` with a
    moving harmonic restraint (piecewise-constant within each ``thin``
    window).

    cv_model: ``[W, n, 3] -> [W, d]`` (a MolANN/PreprocessingANN model).
    Returns ``(traj [n_steps//thin, W, n, 3], x_final)``.
    """
    if n_steps % thin:
        raise ValueError("n_steps must be a multiple of thin")
    n_periods = n_steps // thin
    s0 = jnp.asarray(s0, dtype=jnp.float32)
    s1 = jnp.asarray(s1, dtype=jnp.float32)
    # window p is restrained at the target for that window's END, so the
    # pull covers the full s0->s1 interval (and n_periods == 1 degenerates
    # to one window at s1, not a no-op stuck at s0)
    frac = (jnp.arange(1, n_periods + 1, dtype=jnp.float32)
            / jnp.float32(n_periods))
    schedule = s0[None, :] + frac[:, None] * (s1 - s0)[None, :]

    def total(x, s):
        bias = 0.5 * k_spring * jnp.sum((cv_model(x) - s[None, :]) ** 2,
                                        axis=-1)
        return jnp.sum(energy_fn(x)) + jnp.sum(bias)

    grad = jax.grad(total)
    dt = jnp.float32(dt)
    noise_scale = jnp.sqrt(2.0 * jnp.float32(kT) * dt)

    def inner(x, ks):
        k, s = ks
        xi = jax.random.normal(k, x.shape, dtype=x.dtype)
        return x - dt * grad(x, s) + noise_scale * xi, None

    def outer(x, per):
        k, s = per
        x, _ = jax.lax.scan(
            inner, x, (jax.random.split(k, thin),
                       jnp.broadcast_to(s, (thin,) + s.shape))
        )
        return x, x

    keys = jax.random.split(key, n_periods)
    x_final, traj = jax.lax.scan(outer, jnp.asarray(x0, jnp.float32),
                                 (keys, schedule))
    return traj, x_final


def metadynamics_langevin(energy_fn, cv_model, x0, *, n_steps, dt, kT,
                          key, height, sigma, stride,
                          well_tempered_gamma=None):
    """Multiple-walker metadynamics along the model's CV.

    Every ``stride`` steps each of the W walkers deposits one Gaussian
    at its current CV value; all walkers feel all deposits. One period's
    dynamics run with the bias frozen (the usual adiabatic
    approximation), then the deposit happens — so the whole run is a
    scan over ``n_steps // stride`` periods.

    well_tempered_gamma: bias factor ``γ > 1`` switches on WELL-TEMPERED
    metadynamics: each deposit is scaled by
    ``exp(-V(s)/(kT (γ-1)))`` at its own location, so hill heights decay
    as a basin fills and the bias converges to ``-(1-1/γ) F(s)`` instead
    of growing forever (the textbook Barducci-Bussi-Parrinello scheme).
    ``None`` = standard metadynamics (constant hills).

    Returns ``(traj [n_periods, W, n, 3] recorded at period ends,
    x_final, bias)`` where ``bias`` is the accumulated
    :class:`MetadBias` (centers ``[n_periods * W, d]``, per-deposit
    weights in the well-tempered case).
    """
    if n_steps % stride:
        raise ValueError("n_steps must be a multiple of stride")
    if well_tempered_gamma is not None and well_tempered_gamma <= 1.0:
        raise ValueError("well_tempered_gamma must be > 1")
    x0 = jnp.asarray(x0, dtype=jnp.float32)
    n_periods = n_steps // stride
    W = x0.shape[0]
    d = cv_model(x0[:1]).shape[-1]
    sigma = float(sigma)
    height = float(height)

    centers0 = jnp.zeros((n_periods * W, d), dtype=jnp.float32)
    weights0 = jnp.zeros((n_periods * W,), dtype=jnp.float32)

    def bias_at(cv, centers, weights):
        diff = cv[:, None, :] - centers[None, :, :]
        g = jnp.exp(-jnp.sum(diff * diff, axis=-1) / (2.0 * sigma**2))
        return height * jnp.sum(g * weights[None, :], axis=-1)

    def total(x, centers, weights):
        return jnp.sum(energy_fn(x)) + jnp.sum(
            bias_at(cv_model(x), centers, weights)
        )

    grad = jax.grad(total)
    dt_ = jnp.float32(dt)
    noise_scale = jnp.sqrt(2.0 * jnp.float32(kT) * dt_)

    def inner(carry, k):
        x, centers, weights = carry
        xi = jax.random.normal(k, x.shape, dtype=x.dtype)
        x = x - dt_ * grad(x, centers, weights) + noise_scale * xi
        return (x, centers, weights), None

    def period(carry, pk):
        p, k = pk
        (x, centers, weights), _ = jax.lax.scan(
            inner, carry, jax.random.split(k, stride)
        )
        cv = cv_model(x)
        if well_tempered_gamma is None:
            w_new = jnp.ones((W,), jnp.float32)
        else:
            w_new = jnp.exp(
                -bias_at(cv, centers, weights)
                / (kT * (well_tempered_gamma - 1.0))
            )
        centers = jax.lax.dynamic_update_slice(centers, cv, (p * W, 0))
        weights = jax.lax.dynamic_update_slice(weights, w_new, (p * W,))
        return (x, centers, weights), x

    keys = jax.random.split(key, n_periods)
    (x_final, centers, weights), traj = jax.lax.scan(
        period, (x0, centers0, weights0),
        (jnp.arange(n_periods), keys),
    )
    return traj, x_final, MetadBias(
        centers, height, sigma, weights=weights,
        gamma=well_tempered_gamma,
    )
