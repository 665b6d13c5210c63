"""Underdamped (BAOAB) Langevin integrator: stationary-distribution
checks against the analytic harmonic-oscillator Gibbs measure, per-atom
masses from the topology, and composition with the toy force field.

The BAOAB splitting (Leimkuhler & Matthews) samples configurational
averages of a harmonic well with O(dt^4) bias, so Var(x) = kT/k must hold
tightly even at moderate dt; Var(v) = kT/m holds to O(dt^2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.sampling import (
    ToyPeptidePotential,
    baoab_langevin,
    kinetic_temperature,
)

K_SPRING, KT = 1.0, 0.7
MASSES = np.array([1.0, 4.0], dtype=np.float32)  # two atoms, unequal mass


def _harmonic(x):
    return 0.5 * K_SPRING * jnp.sum(x * x, axis=(-1, -2))


@pytest.fixture(scope="module")
def harmonic_run():
    W = 256
    x0 = jnp.zeros((W, 2, 3))
    traj, x_f, v_f = jax.jit(
        lambda x0, key: baoab_langevin(
            _harmonic, x0, n_steps=4000, dt=0.05, kT=KT, gamma=1.0,
            mass=MASSES, key=key, thin=20,
        )
    )(x0, jax.random.PRNGKey(7))
    return np.asarray(traj), np.asarray(x_f), np.asarray(v_f)


def test_configurational_variance_matches_gibbs(harmonic_run):
    traj, _, _ = harmonic_run
    tail = traj[traj.shape[0] // 2:]          # discard burn-in
    # every dof of every atom: Var(x) = kT / k, independent of mass
    var = tail.reshape(-1, 2, 3).var(axis=0)  # [2, 3]
    np.testing.assert_allclose(var, KT / K_SPRING, rtol=0.06)
    # mean is zero
    assert np.abs(tail.mean()) < 0.02


def test_velocity_variance_matches_maxwell_boltzmann(harmonic_run):
    _, _, v_f = harmonic_run
    # per-atom equipartition: Var(v_i) = kT / m_i
    var = v_f.reshape(-1, 2, 3).var(axis=(0, 2))  # [2]
    np.testing.assert_allclose(var, KT / MASSES, rtol=0.12)
    # scalar summary helper agrees across walkers
    # per-walker kT estimate has std ~ kT*sqrt(2/6) (6 dofs); the mean
    # over 256 walkers has std ~ 3.6% of kT — gate at ~3 sigma
    kt_kin = np.asarray(kinetic_temperature(v_f, MASSES))
    assert abs(kt_kin.mean() - KT) < 0.11 * KT


def test_v0_override_and_determinism():
    x0 = jnp.zeros((4, 2, 3))
    v0 = jnp.ones((4, 2, 3))
    out1 = baoab_langevin(_harmonic, x0, n_steps=10, dt=0.01, kT=KT,
                          gamma=1.0, key=jax.random.PRNGKey(0), v0=v0,
                          thin=10)
    out2 = baoab_langevin(_harmonic, x0, n_steps=10, dt=0.01, kT=KT,
                          gamma=1.0, key=jax.random.PRNGKey(0), v0=v0,
                          thin=10)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mass_validation():
    x0 = jnp.zeros((1, 2, 3))
    kw = dict(n_steps=10, dt=0.01, kT=KT, gamma=1.0,
              key=jax.random.PRNGKey(0), thin=10)
    with pytest.raises(ValueError, match="mass"):
        baoab_langevin(_harmonic, x0, mass=np.ones(3), **kw)
    with pytest.raises(ValueError, match="positive"):
        baoab_langevin(_harmonic, x0, mass=np.array([1.0, 0.0]), **kw)
    with pytest.raises(ValueError, match="multiple"):
        baoab_langevin(_harmonic, x0, n_steps=7, dt=0.01, kT=KT, gamma=1.0,
                       key=jax.random.PRNGKey(0), thin=10)


def test_topology_masses(universe):
    m = universe.atoms.masses
    assert m.shape == (22,)
    assert (m > 0).all()
    # alanine dipeptide is pure H/C/N/O
    assert set(np.round(m, 3)) <= {1.008, 12.011, 14.007, 15.999}
    # spot-check against types
    types = universe.atoms.types
    assert all(
        (t == "H") == (mi == pytest.approx(1.008))
        for t, mi in zip(types, m)
    )


def test_baoab_keeps_molecule_intact(universe):
    """Underdamped dynamics with real masses on the toy force field:
    bonds stay near reference (no blow-up), kinetic temperature
    thermalizes near kT."""
    pot = ToyPeptidePotential(universe, barrier=6.0)
    x0 = jnp.asarray(universe.atoms.positions[None])
    m = universe.atoms.masses.astype(np.float32)
    traj, x_f, v_f = baoab_langevin(
        pot.energy, x0, n_steps=400, dt=5e-3, kT=0.2, gamma=5.0,
        mass=m, key=jax.random.PRNGKey(3), thin=40,
    )
    assert np.isfinite(np.asarray(traj)).all()
    # per-term bond energies stay small: molecule intact
    assert float(pot.energy(x_f)[0]) < 50.0
    assert np.isfinite(np.asarray(v_f)).all()
