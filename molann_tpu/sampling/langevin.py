"""Langevin integration as one compiled ``lax.scan``.

Two integrators, both vectorized over a leading walker axis (walkers are
independent, exactly like the library's trajectory batch axis) and both
single jittable programs with static shapes (thinned trajectory output
via scan stacking):

- :func:`overdamped_langevin` — Brownian dynamics,
  ``x_{t+1} = x_t - dt * grad U(x_t) + sqrt(2 kT dt) * xi``.
- :func:`baoab_langevin` — underdamped (inertial) Langevin via the
  BAOAB splitting of Leimkuhler & Matthews (B: half kick, A: half
  drift, O: exact Ornstein-Uhlenbeck velocity update, A, B), the
  standard high-accuracy configurational sampler for molecular
  dynamics. Supports per-atom masses (see
  :func:`molann_tpu.topology.AtomGroup.masses`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["overdamped_langevin", "baoab_langevin", "kinetic_temperature"]


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


def _as_mass_array(mass, x0):
    """Broadcast a scalar or per-atom ``[n]`` mass to ``[n, 1]`` float32,
    validating positivity (a 0.0 from the topology's mass guesser means
    'unknown element' and would divide by zero here)."""
    import numpy as _np

    if not isinstance(mass, jax.core.Tracer):
        if _np.any(_np.asarray(mass) <= 0.0):
            raise ValueError(
                "all masses must be positive (0.0 means the topology "
                "could not guess the element — pass masses explicitly)"
            )
    m = jnp.asarray(mass, dtype=jnp.float32)
    if m.ndim == 0:
        m = jnp.full((x0.shape[-2],), m)
    if m.ndim != 1 or m.shape[0] != x0.shape[-2]:
        raise ValueError(
            f"mass must be a scalar or [n_atoms]={x0.shape[-2]} vector, "
            f"got shape {m.shape}"
        )
    return m[:, None]


def baoab_langevin(energy_fn, x0, *, n_steps, dt, kT, gamma, key,
                   mass=1.0, v0=None, thin=10, extra_energy_fn=None):
    """Integrate ``n_steps`` of underdamped Langevin dynamics (BAOAB).

    One step is the Leimkuhler-Matthews splitting
    ``B(dt/2) A(dt/2) O(dt) A(dt/2) B(dt/2)`` where B kicks velocities by
    ``-grad U / m``, A drifts positions, and O is the EXACT
    Ornstein-Uhlenbeck update ``v <- c1 v + sqrt((1-c1^2) kT/m) xi`` with
    ``c1 = exp(-gamma dt)`` — superconvergent (O(dt^4) error) for
    configurational averages. Force is evaluated once per step (the
    trailing B's force is reused as the next step's leading B).

    energy_fn: ``[W, n, 3] -> [W]`` base potential.
    x0: ``[W, n, 3]`` walker start coordinates.
    gamma: friction (1/time units of ``dt``).
    mass: scalar or per-atom ``[n]`` masses (e.g.
        ``universe.atoms.masses``); velocities have units of
        position/time, ``kT`` of energy.
    v0: ``[W, n, 3]`` start velocities; default: Maxwell-Boltzmann draw
        at ``kT``.
    thin: record every ``thin``-th frame (``n_steps % thin == 0``).
    extra_energy_fn: optional additional ``[W, n, 3] -> [W]`` term (a
        bias); gradients of the SUM drive the dynamics.

    Returns ``(traj [n_steps//thin, W, n, 3], x_final, v_final)``.
    """
    if n_steps % thin:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"thin ({thin})")
    x0 = jnp.asarray(x0, dtype=jnp.float32)
    m = _as_mass_array(mass, x0)
    dt = jnp.float32(dt)
    kT = jnp.float32(kT)
    c1 = jnp.exp(-jnp.float32(gamma) * dt)
    sigma = jnp.sqrt((1.0 - c1 * c1) * kT / m)  # [n, 1]

    def total(x):
        e = jnp.sum(energy_fn(x))
        if extra_energy_fn is not None:
            e = e + jnp.sum(extra_energy_fn(x))
        return e

    force = jax.grad(lambda x: -total(x))

    key, k0 = jax.random.split(key)
    if v0 is None:
        v0 = jnp.sqrt(kT / m) * jax.random.normal(
            k0, x0.shape, dtype=x0.dtype
        )
    else:
        v0 = jnp.asarray(v0, dtype=jnp.float32)

    def inner(carry, k):
        x, v, f = carry
        v = v + (0.5 * dt) * f / m          # B
        x = x + (0.5 * dt) * v              # A
        xi = jax.random.normal(k, v.shape, dtype=v.dtype)
        v = c1 * v + sigma * xi             # O (exact OU)
        x = x + (0.5 * dt) * v              # A
        f = force(x)
        v = v + (0.5 * dt) * f / m          # B
        return (x, v, f), None

    def outer(carry, k):
        carry, _ = jax.lax.scan(inner, carry, jax.random.split(k, thin))
        return carry, carry[0]

    keys = jax.random.split(key, n_steps // thin)
    (x_final, v_final, _), traj = jax.lax.scan(
        outer, (x0, v0, force(x0)), keys
    )
    return traj, x_final, v_final


def kinetic_temperature(v, mass=1.0):
    """Instantaneous kinetic temperature ``kT_kin = sum(m v^2) / n_dof``
    per walker: ``v [W, n, 3] -> [W]`` (same energy units as ``kT``)."""
    v = jnp.asarray(v, dtype=jnp.float32)
    m = _as_mass_array(mass, v)
    return jnp.sum(m * v * v, axis=(-1, -2)) / (v.shape[-1] * v.shape[-2])
