"""Replica-exchange Langevin: detailed-balance sanity, Boltzmann
correctness of the cold rung, and barrier crossing the plain dynamics
cannot achieve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molann_tpu.sampling import overdamped_langevin, replica_exchange_langevin

H = 1.5  # particle double well V(u) = H (u² − 1)²


def _particle_energy(x):
    """[R, 1, 3] -> [R]: double well along u = x[...,0], harmonic in
    the other coordinates."""
    u = x[:, 0, 0]
    return H * (u ** 2 - 1.0) ** 2 + 0.5 * (x[:, 0, 1] ** 2
                                            + x[:, 0, 2] ** 2)


def test_identical_temperatures_always_swap():
    """With a flat temperature ladder the Metropolis factor is exp(0):
    every attempted swap accepts."""
    x0 = np.zeros((3, 1, 3), np.float32)
    x0[:, 0, 0] = -1.0
    _, _, rate = replica_exchange_langevin(
        _particle_energy, x0, [0.3, 0.3, 0.3], n_steps=400, dt=1e-3,
        exchange_stride=10, key=jax.random.PRNGKey(0),
    )
    np.testing.assert_array_equal(np.asarray(rate), [1.0, 1.0])


def test_bad_ladder_shapes_rejected():
    x0 = np.zeros((3, 1, 3), np.float32)
    with pytest.raises(ValueError, match="one temperature per replica"):
        replica_exchange_langevin(
            _particle_energy, x0, [0.3, 0.3], n_steps=100, dt=1e-3,
            key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="multiple of"):
        replica_exchange_langevin(
            _particle_energy, x0, [0.3, 0.3, 0.3], n_steps=105, dt=1e-3,
            exchange_stride=10, key=jax.random.PRNGKey(0))


@pytest.mark.slow
def test_cold_rung_is_boltzmann_and_crosses():
    """Cold rung kT=0.2 (barrier 7.5 kT): plain dynamics stays in the
    start well for the whole run; the REMD cold rung populates both
    wells ~symmetrically and reproduces the analytic Boltzmann moment
    <u²>."""
    kts = [0.2, 0.5, 1.2, 3.0]
    x0 = np.zeros((4, 1, 3), np.float32)
    x0[:, 0, 0] = -1.0  # everyone starts in the left well

    # plain dynamics at the cold temperature: trapped
    traj_plain, _ = overdamped_langevin(
        _particle_energy, jnp.asarray(x0[:1]), n_steps=40_000, dt=1e-3,
        kT=kts[0], key=jax.random.PRNGKey(1), thin=20,
    )
    u_plain = np.asarray(traj_plain)[:, 0, 0, 0]
    assert u_plain.max() < 0.0  # never crossed

    traj, _, rate = replica_exchange_langevin(
        _particle_energy, x0, kts, n_steps=40_000, dt=1e-3,
        exchange_stride=10, thin=2, key=jax.random.PRNGKey(2),
    )
    rate = np.asarray(rate)
    assert (rate > 0.15).all(), f"swap rates collapsed: {rate}"
    u_cold = np.asarray(traj)[:, 0, 0, 0]  # [n_records]
    frac_right = float((u_cold > 0).mean())
    assert 0.25 < frac_right < 0.75, f"right-well fraction {frac_right}"

    # analytic <u²> at kT=0.2 by quadrature
    g = np.linspace(-2.5, 2.5, 20001)
    w = np.exp(-H * (g ** 2 - 1) ** 2 / kts[0])
    u2_exact = float(np.trapezoid(w * g ** 2, g) / np.trapezoid(w, g))
    u2_est = float((u_cold ** 2).mean())
    assert abs(u2_est - u2_exact) / u2_exact < 0.15


@pytest.mark.slow
def test_molecular_cold_rung_escapes():
    """Toy alanine double well (barrier 16 kT at the cold rung): the
    REMD cold rung visits the second torsion basin where plain dynamics
    at the same temperature stays trapped."""
    from molann_tpu.sampling import ToyPeptidePotential
    from molann_tpu.systems import alanine_universe

    u = alanine_universe()
    pot = ToyPeptidePotential(u, barrier=4.0)
    phi_ref = float(pot.phi(jnp.asarray(u.atoms.positions[None]))[0])
    # acceptance needs (Δβ)(ΔE) ~ O(1); with ~66 dof (<E> ~ 33 kT) the
    # ladder must be geometric with factor ~1+sqrt(2/dof) ~ 1.2
    kts = list(0.25 * 1.21 ** np.arange(12))
    x0 = np.repeat(u.atoms.positions[None], len(kts), axis=0)

    traj_plain, _ = overdamped_langevin(
        pot.energy, jnp.asarray(x0[:1]), n_steps=20_000, dt=1e-3,
        kT=kts[0], key=jax.random.PRNGKey(3), thin=20,
    )
    dcos_plain = np.cos(np.asarray(
        pot.phi(jnp.asarray(np.asarray(traj_plain).reshape(-1, 22, 3))))
        - phi_ref)
    assert dcos_plain.min() > -0.2  # plain run never nears basin B

    traj, _, rate = replica_exchange_langevin(
        pot.energy, x0, kts, n_steps=20_000, dt=1e-3,
        exchange_stride=10, thin=2, key=jax.random.PRNGKey(4),
    )
    cold = np.asarray(traj)[:, 0]  # [records, 22, 3]
    dcos_cold = np.cos(np.asarray(
        pot.phi(jnp.asarray(cold))) - phi_ref)
    assert dcos_cold.min() < -0.7, (
        f"cold rung never reached basin B (min dcos "
        f"{dcos_cold.min():.2f}, swap rates {np.asarray(rate)})")


def test_temperature_mbar_reweighting_analytic():
    """MBAR with target_u_n recombines multi-temperature ensembles: for
    V = u²/2, ensemble k samples N(0, kT_k); weights targeted at kT_0
    must reproduce <u²> = kT_0 using ALL rungs' samples, and the window
    free energies match the analytic log-partition ratios."""
    from molann_tpu.sampling import mbar

    rng = np.random.default_rng(0)
    kts = np.array([0.2, 0.5, 1.2, 3.0], np.float32)
    n_per = 6000
    samples = np.concatenate([
        rng.normal(0.0, np.sqrt(kt), n_per) for kt in kts
    ]).astype(np.float32)
    e = samples ** 2 / 2
    u_kn = e[None, :] / kts[:, None]
    f, log_w = mbar(u_kn, np.full(len(kts), n_per),
                    target_u_n=e / kts[0])
    # analytic: f_k = -log(Z_k/Z_0) = -0.5 log(kT_k / kT_0)
    f_exact = -0.5 * np.log(kts / kts[0])
    np.testing.assert_allclose(np.asarray(f), f_exact, atol=0.05)
    u2 = float(np.sum(np.exp(np.asarray(log_w)) * samples ** 2))
    assert abs(u2 - kts[0]) / kts[0] < 0.1


@pytest.mark.slow
def test_remd_plus_mbar_uses_all_rungs():
    """REMD rungs recombined by temperature-MBAR: the cold-target
    estimate of <u²> from ALL rungs matches the analytic double-well
    value (same check as the cold-rung-only test, now with 4x the
    data)."""
    from molann_tpu.sampling import mbar

    kts = np.array([0.2, 0.5, 1.2, 3.0], np.float32)
    x0 = np.zeros((4, 1, 3), np.float32)
    x0[:, 0, 0] = -1.0
    traj, _, _ = replica_exchange_langevin(
        _particle_energy, x0, kts, n_steps=40_000, dt=1e-3,
        exchange_stride=10, thin=2, key=jax.random.PRNGKey(5),
    )
    traj = np.asarray(traj)  # [T, R, 1, 3]
    t_count = traj.shape[0]
    # pool rung-major: all of rung 0's records, then rung 1's, ...
    pooled = np.moveaxis(traj, 1, 0).reshape(4 * t_count, 1, 3)
    e = np.asarray(_particle_energy(jnp.asarray(pooled)))
    u_kn = e[None, :] / kts[:, None]
    _, log_w = mbar(u_kn, np.full(4, t_count), target_u_n=e / kts[0])
    u = pooled[:, 0, 0]
    u2 = float(np.sum(np.exp(np.asarray(log_w)) * u ** 2))

    g = np.linspace(-2.5, 2.5, 20001)
    w = np.exp(-H * (g ** 2 - 1) ** 2 / kts[0])
    u2_exact = float(np.trapezoid(w * g ** 2, g) / np.trapezoid(w, g))
    assert abs(u2 - u2_exact) / u2_exact < 0.12
