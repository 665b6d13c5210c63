"""First-passage committor estimation on the toy double well: the
committor test every CV paper runs, validated against the geometry's
known answer (symmetric well: q(barrier top) = 1/2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molann_tpu.sampling import (
    ToyPeptidePotential,
    empirical_committor,
    rotate_torsion,
)
from molann_tpu.systems import alanine_universe

FREE = (4, 6, 8, 14)  # phi backbone dihedral, 0-based


@pytest.fixture(scope="module")
def u():
    return alanine_universe()


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def test_rotate_torsion_sets_the_angle(u):
    pot = ToyPeptidePotential(u, free_torsion=FREE)
    phi0 = float(pot.phi(jnp.asarray(u.atoms.positions[None]))[0])
    for angle in (0.5, np.pi / 2, np.pi, -1.2):
        x = rotate_torsion(u, FREE, angle)
        phi = float(pot.phi(jnp.asarray(x[None]))[0])
        assert abs(_wrap(phi - phi0 - angle)) < 1e-4
        # the i-side and the axis atoms did not move
        moved = np.abs(x - u.atoms.positions).max(axis=1)
        assert moved[FREE[0]] == 0.0 and moved[FREE[1]] == 0.0
        assert moved[FREE[2]] < 1e-6  # on the axis: rotates onto itself


def test_rotate_torsion_preserves_energy_landscape(u):
    """A full turn returns the geometry; a half turn lands in the second
    well (same energy as the first by construction)."""
    pot = ToyPeptidePotential(u, free_torsion=FREE, barrier=6.0)
    x_full = rotate_torsion(u, FREE, 2 * np.pi)
    np.testing.assert_allclose(x_full, u.atoms.positions, atol=1e-5)
    e0 = float(pot.energy(jnp.asarray(u.atoms.positions[None]))[0])
    e_half = float(pot.energy(jnp.asarray(
        rotate_torsion(u, FREE, np.pi)[None]))[0])
    e_top = float(pot.energy(jnp.asarray(
        rotate_torsion(u, FREE, np.pi / 2)[None]))[0])
    assert abs(e_half - e0) < 0.15
    assert e_top - e0 > 4.0  # the barrier sits between the wells


@pytest.mark.slow
def test_empirical_committor_double_well(u):
    """Starts in A resolve to q=0, starts in B to q=1, and the barrier-top
    configuration commits ~50/50 (symmetric well)."""
    pot = ToyPeptidePotential(u, free_torsion=FREE, barrier=2.0)
    x_ref = u.atoms.positions
    phi_ref = float(pot.phi(jnp.asarray(x_ref[None]))[0])

    def dcos(x):
        return jnp.cos(pot.phi(x) - phi_ref)

    in_a = lambda x: dcos(x) > 0.7   # noqa: E731
    in_b = lambda x: dcos(x) < -0.7  # noqa: E731

    starts = np.stack([
        x_ref,
        rotate_torsion(u, FREE, np.pi),      # second well
        rotate_torsion(u, FREE, np.pi / 2),  # barrier top
    ])
    # dt=1e-3 / 8000 steps measured: >95% of barrier replicas resolve,
    # q(top) = 0.45-0.49 across seeds (MC sigma ~0.05 at 128 replicas)
    q, frac = empirical_committor(
        pot.energy, starts, in_a, in_b, n_steps=8000, dt=1e-3, kT=0.25,
        key=jax.random.PRNGKey(0), n_replicas=128,
    )
    q, frac = np.asarray(q), np.asarray(frac)
    assert frac[0] == 1.0 and q[0] == 0.0   # already in A
    assert frac[1] == 1.0 and q[1] == 1.0   # already in B
    assert frac[2] > 0.9                     # barrier starts resolve
    assert 0.35 < q[2] < 0.65                # ~committor-0.5 ensemble


def test_rotate_torsion_rejects_ring_axis():
    """A j-k bond inside a ring has no defined torsion rotation; the BFS
    ring check must actually fire (it used to be dead code — the walk
    refuses to step onto j, so `j in side` could never be true)."""
    import types

    # 4-membered square ring, side 1.5 A (bonded at the 1.8 A cutoff),
    # diagonal ~2.12 A (not bonded): 0-1-2-3-0
    pos = np.array(
        [[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [1.5, 1.5, 0.0],
         [0.0, 1.5, 0.0]], dtype=np.float32)
    fake_u = types.SimpleNamespace(
        atoms=types.SimpleNamespace(positions=pos))
    with pytest.raises(ValueError, match="ring"):
        rotate_torsion(fake_u, (3, 0, 1, 2), 0.3)
