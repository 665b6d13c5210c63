"""Replica-exchange (parallel-tempering) overdamped Langevin dynamics.

The remaining classic of the enhanced-sampling toolbox this subpackage
provides (metadynamics, steered MD, umbrella/MBAR, committor analysis):
a ladder of replicas at increasing temperatures runs in ONE batched
``lax.scan`` (replicas are the walker axis), with Metropolis swaps of
configurations between adjacent rungs every ``exchange_stride`` steps —
alternating even/odd pairs, the standard scheme. Hot rungs cross
barriers; accepted swaps transport those crossings down to the cold
rung, whose samples remain exactly Boltzmann at its own temperature
(exchange satisfies detailed balance: acceptance
``min(1, exp((β_i − β_j)(E_i − E_j)))``).

Validated in tests/test_remd.py: identical-temperature swaps accept at
100%, the cold-rung histogram on a double well matches the analytic
Boltzmann weights, and the cold rung of the molecular toy system visits
both torsion basins where plain dynamics at the same temperature stays
trapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["replica_exchange_langevin"]


def replica_exchange_langevin(energy_fn, x0, temperatures, *, n_steps,
                              dt, key, exchange_stride=10, thin=1):
    """Integrate parallel tempering; returns per-RUNG trajectories.

    energy_fn: ``[R, n, 3] -> [R]``.
    x0: ``[R, n, 3]`` start configuration per rung (rung ``r`` runs at
    ``temperatures[r]``; sort ascending — rung 0 is the cold ensemble
    you keep).
    n_steps: total dynamics steps; must divide by ``exchange_stride``.
    exchange_stride: steps between swap attempts. Swap rounds alternate
    between even pairs (0-1, 2-3, …) and odd pairs (1-2, 3-4, …).
    thin: record every ``thin``-th exchange round.

    Returns ``(traj [n_rounds//thin, R, n, 3], x_final [R, n, 3],
    swap_acceptance [R-1])`` — trajectories are per rung (fixed
    temperature; configurations flow through rungs via swaps), and
    ``swap_acceptance[i]`` is the accepted fraction of attempts between
    rungs ``i`` and ``i+1``.
    """
    if n_steps % exchange_stride:
        raise ValueError(f"n_steps ({n_steps}) must be a multiple of "
                         f"exchange_stride ({exchange_stride})")
    n_rounds = n_steps // exchange_stride
    if n_rounds % thin:
        raise ValueError(f"exchange rounds ({n_rounds}) must divide by "
                         f"thin ({thin})")
    x0 = jnp.asarray(x0, jnp.float32)
    r = x0.shape[0]
    kts = jnp.asarray(temperatures, jnp.float32)
    if kts.shape != (r,):
        raise ValueError(f"need one temperature per replica; got "
                         f"{kts.shape} for {r} replicas")
    betas = 1.0 / kts
    dt = jnp.float32(dt)
    noise = jnp.sqrt(2.0 * kts * dt)[:, None, None]

    grad = jax.grad(lambda xx: jnp.sum(energy_fn(xx)))

    def dyn_step(x, k):
        xi = jax.random.normal(k, x.shape, dtype=x.dtype)
        return x - dt * grad(x) + noise * xi, None

    # swap partner tables for the two parities: partner[i] = j means rung
    # i attempts to swap with rung j this round (self-partner = no swap)
    idx = jnp.arange(r)

    def partners(parity):
        cand = jnp.where((idx - parity) % 2 == 0, idx + 1, idx - 1)
        return jnp.where((cand < 0) | (cand >= r), idx, cand)

    part_table = jnp.stack([partners(0), partners(1)])  # [2, R]

    def exchange(x, parity, k):
        e = energy_fn(x)  # [R]
        part = part_table[parity]
        # Metropolis on each pair: Δ = (β_i − β_j)(E_i − E_j); computed
        # identically from both sides, so one uniform per PAIR (keyed by
        # the lower index) keeps the decision consistent
        delta = (betas - betas[part]) * (e - e[part])
        lo = jnp.minimum(idx, part)
        uni = jax.random.uniform(k, (r,))[lo]
        accept = (part != idx) & (uni < jnp.exp(jnp.minimum(delta, 0.0)))
        x = jnp.where(accept[:, None, None], x[part], x)
        # count each accepted pair once, at its lower rung
        pair_accept = accept & (idx < part)
        counts = jnp.zeros(r - 1, jnp.int32).at[
            jnp.clip(lo, 0, r - 2)].add(pair_accept.astype(jnp.int32))
        attempts = jnp.zeros(r - 1, jnp.int32).at[
            jnp.clip(lo, 0, r - 2)].add(
                ((part != idx) & (idx < part)).astype(jnp.int32))
        return x, counts, attempts

    def round_step(carry, inp):
        x, acc, att = carry
        parity, k = inp
        k_dyn, k_swap = jax.random.split(k)
        x, _ = jax.lax.scan(dyn_step, x,
                            jax.random.split(k_dyn, exchange_stride))
        x, counts, attempts = exchange(x, parity, k_swap)
        return (x, acc + counts, att + attempts), x

    parities = jnp.arange(n_rounds, dtype=jnp.int32) % 2
    keys = jax.random.split(key, n_rounds)
    acc0 = jnp.zeros(r - 1, jnp.int32)
    (x_final, acc, att), traj = jax.lax.scan(
        round_step, (x0, acc0, acc0), (parities, keys))
    traj = traj[thin - 1::thin]
    rate = acc.astype(jnp.float32) / jnp.maximum(att, 1).astype(jnp.float32)
    return traj, x_final, rate
