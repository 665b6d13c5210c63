"""First-passage committor estimation (and a torsion-rotation helper).

The committor q(x) — the probability that dynamics from x reaches
product basin B before reactant basin A — is the gold-standard reaction
coordinate, and the "committor test" (histogramming first-passage
outcomes from candidate transition states) is the standard validation
of a trained CV. :func:`empirical_committor` runs that test as one
compiled ``lax.scan``: many independent overdamped replicas per start
configuration, each frozen at its first basin entry. It is the
simulation-side counterpart of the variational
:func:`molann_tpu.train.committor_loss` objective.

The reference ships no dynamics at all (SURVEY.md §2.3 — it consumes
trajectories an MD engine produced); this exists so the enhanced-
sampling loop can be validated end to end in-repo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["empirical_committor", "rotate_torsion"]


def rotate_torsion(universe, quadruple, angle, *, bond_cutoff=1.8):
    """Rotate the dihedral ``quadruple`` (0-based ``(i, j, k, l)``) of a
    universe's geometry by ``angle`` radians; returns new positions
    ``[n, 3]`` (float32). All atoms on the ``k``-side of the ``j-k``
    bond rotate about that axis — the standard internal-coordinate move,
    used e.g. to build transition-state guesses at a torsion barrier."""
    from .potentials import _bond_graph

    pos = np.array(universe.atoms.positions, dtype=np.float64)
    i, j, k, l = (int(a) for a in quadruple)
    adj, _, _ = _bond_graph(pos.astype(np.float32), bond_cutoff)

    # atoms reachable from k without passing through j: the rotating side
    side, stack = {k}, [k]
    while stack:
        a = stack.pop()
        for b in adj[a]:
            if b != j and b not in side:
                side.add(b)
                stack.append(b)
    # ring detection: the BFS can never reach j itself (it refuses to step
    # onto j), but if it reached any OTHER neighbor of j there is a k->...->j
    # path around the axis — the j-k bond closes a ring.
    if any(b in side for b in adj[j] if b != k):
        raise ValueError("torsion axis is part of a ring; rotation is "
                         "not defined")

    axis = pos[k] - pos[j]
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    ux, uy, uz = axis
    rot = np.array([
        [c + ux * ux * (1 - c), ux * uy * (1 - c) - uz * s,
         ux * uz * (1 - c) + uy * s],
        [uy * ux * (1 - c) + uz * s, c + uy * uy * (1 - c),
         uy * uz * (1 - c) - ux * s],
        [uz * ux * (1 - c) - uy * s, uz * uy * (1 - c) + ux * s,
         c + uz * uz * (1 - c)],
    ])
    out = pos.copy()
    idx = sorted(side)
    out[idx] = (out[idx] - pos[j]) @ rot.T + pos[j]
    return out.astype(np.float32)


def empirical_committor(energy_fn, x0, in_a_fn, in_b_fn, *, n_steps, dt,
                        kT, key, n_replicas=32):
    """Monte-Carlo first-passage committor estimates.

    For each of ``W`` start configurations, integrate ``n_replicas``
    independent overdamped-Langevin replicas (same scheme as
    :func:`~molann_tpu.sampling.overdamped_langevin`) until each first
    enters basin A or basin B; a replica is frozen the step it resolves.

    energy_fn: ``[M, n, 3] -> [M]``.
    x0: ``[W, n, 3]`` start configurations.
    in_a_fn / in_b_fn: ``[M, n, 3] -> [M]`` boolean basin indicators
    (checked on the START states too — a start already inside a basin
    resolves immediately).

    Returns ``(q_hat [W], resolved_frac [W])``: the fraction of RESOLVED
    replicas that hit B first (NaN where none resolved — raise
    ``n_steps`` if that happens), and the fraction that resolved at all.
    """
    x0 = jnp.asarray(x0, jnp.float32)
    w, n, _ = x0.shape
    x = jnp.repeat(x0, n_replicas, axis=0)  # [W*R, n, 3]
    dt = jnp.float32(dt)
    noise = jnp.sqrt(2.0 * jnp.float32(kT) * dt)

    grad = jax.grad(lambda xx: jnp.sum(energy_fn(xx)))

    def classify(xx, state):
        hit_b = jnp.asarray(in_b_fn(xx), bool)
        hit_a = jnp.asarray(in_a_fn(xx), bool)
        state = jnp.where((state == 0) & hit_b, 1, state)
        state = jnp.where((state == 0) & hit_a, -1, state)
        return state

    state0 = classify(x, jnp.zeros(w * n_replicas, jnp.int32))

    def step(carry, k):
        xx, state = carry
        xi = jax.random.normal(k, xx.shape, dtype=xx.dtype)
        xn = xx - dt * grad(xx) + noise * xi
        live = (state == 0)[:, None, None]
        xx = jnp.where(live, xn, xx)  # resolved replicas are frozen
        return (xx, classify(xx, state)), None

    (_, state), _ = jax.lax.scan(
        step, (x, state0), jax.random.split(key, n_steps))

    state = state.reshape(w, n_replicas)
    n_b = jnp.sum(state == 1, axis=1).astype(jnp.float32)
    n_resolved = jnp.sum(state != 0, axis=1).astype(jnp.float32)
    q = jnp.where(n_resolved > 0, n_b / jnp.maximum(n_resolved, 1.0),
                  jnp.nan)
    return q, n_resolved / n_replicas
