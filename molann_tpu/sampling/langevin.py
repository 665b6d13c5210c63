"""Overdamped Langevin integration as one compiled ``lax.scan``.

``x_{t+1} = x_t - dt * grad U(x_t) + sqrt(2 kT dt) * xi`` — the standard
Brownian-dynamics step. Walkers ride a leading batch axis (frames are
independent, exactly like the library's trajectory batch axis), so W
walkers cost one vectorized step; the whole run is a single jittable
program with static shapes (thinned trajectory output via scan stacking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["overdamped_langevin"]


def overdamped_langevin(energy_fn, x0, *, n_steps, dt, kT, key, thin=10,
                        extra_energy_fn=None):
    """Integrate ``n_steps`` of overdamped Langevin dynamics.

    energy_fn: ``[W, n, 3] -> [W]`` base potential.
    x0: ``[W, n, 3]`` walker start coordinates.
    thin: record every ``thin``-th frame (``n_steps % thin == 0``).
    extra_energy_fn: optional additional ``[W, n, 3] -> [W]`` term (a
    bias); gradients of the SUM drive the dynamics.

    Returns ``(traj [n_steps//thin, W, n, 3], x_final [W, n, 3])``.
    """
    if n_steps % thin:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")
    x0 = jnp.asarray(x0, dtype=jnp.float32)
    dt = jnp.float32(dt)
    noise_scale = jnp.sqrt(2.0 * jnp.float32(kT) * dt)

    def total(x):
        e = jnp.sum(energy_fn(x))
        if extra_energy_fn is not None:
            e = e + jnp.sum(extra_energy_fn(x))
        return e

    grad = jax.grad(total)

    def inner(x, k):
        xi = jax.random.normal(k, x.shape, dtype=x.dtype)
        return x - dt * grad(x) + noise_scale * xi, None

    def outer(x, k):
        x, _ = jax.lax.scan(inner, x, jax.random.split(k, thin))
        return x, x

    keys = jax.random.split(key, n_steps // thin)
    x_final, traj = jax.lax.scan(outer, x0, keys)
    return traj, x_final
