"""Condensed-phase workflow: periodic LJ fluid, minimum-image pair
potential, coordination-shell CVs at thousands-of-pairs scale through the
blocked fused formulation, and the end-to-end example."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.sampling import LennardJonesPotential
from molann_tpu.systems import lj_fluid, lj_fluid_model

SPACING = 1.7


def lj_oracle(xf, box, epsilon, sigma, cutoff):
    """Double-precision numpy reference for one frame."""
    n = len(xf)
    e = 0.0
    shift = 4 * epsilon * ((sigma / cutoff) ** 12 - (sigma / cutoff) ** 6)
    for i in range(n):
        for j in range(i + 1, n):
            d = xf[j] - xf[i]
            d -= np.round(d / box) * box
            r = np.linalg.norm(d)
            if r < cutoff:
                e += 4 * epsilon * ((sigma / r) ** 12 - (sigma / r) ** 6)
                e -= shift
    return e


def test_lj_fluid_construction():
    u, box = lj_fluid(3)
    assert len(u.atoms) == 27
    np.testing.assert_allclose(box, 3 * SPACING)
    pos = u.atoms.positions
    assert pos.min() > 0.0 and pos.max() < 3 * SPACING
    # deterministic for a given seed
    u2, _ = lj_fluid(3)
    np.testing.assert_array_equal(pos, u2.atoms.positions)


def test_lj_potential_matches_numpy_oracle(rng):
    u, box = lj_fluid(3, SPACING, jitter=0.08)
    sigma = SPACING / 2 ** (1 / 6)
    pot = LennardJonesPotential(27, box, epsilon=1.0, sigma=sigma)
    x = (u.atoms.positions[None]
         + 0.05 * rng.normal(size=(3, 27, 3))).astype(np.float32)
    got = np.asarray(pot(jnp.asarray(x)))
    want = [lj_oracle(np.float64(xf), box, 1.0, sigma, pot.cutoff)
            for xf in x]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lj_potential_periodicity():
    """Moving one atom by a lattice vector leaves energy (and forces)
    unchanged — the minimum image at work."""
    u, box = lj_fluid(3)
    pot = LennardJonesPotential(27, box, sigma=SPACING / 2 ** (1 / 6))
    x0 = jnp.asarray(u.atoms.positions[None])
    x1 = np.asarray(x0).copy()
    x1[0, 5] += np.float32([box[0], -box[1], 2 * box[2]])
    e0, e1 = float(pot(x0)[0]), float(pot(jnp.asarray(x1))[0])
    assert e0 == pytest.approx(e1, rel=1e-5)
    g0 = np.asarray(jax.grad(lambda xx: jnp.sum(pot(xx)))(x0))
    g1 = np.asarray(jax.grad(lambda xx: jnp.sum(pot(xx)))(jnp.asarray(x1)))
    np.testing.assert_allclose(g0, g1, atol=1e-4)


def test_lj_lattice_is_low_energy(rng):
    """The jittered lattice sits far below a random gas at equal
    density (the solid/fluid contrast the example's CV detects)."""
    u, box = lj_fluid(3)
    pot = LennardJonesPotential(27, box, sigma=SPACING / 2 ** (1 / 6))
    e_lattice = float(pot(jnp.asarray(u.atoms.positions[None]))[0])
    gas = rng.uniform(0, box, size=(4, 27, 3)).astype(np.float32)
    e_gas = np.asarray(pot(jnp.asarray(gas)))
    assert e_lattice < np.min(e_gas) - 5.0


def test_lj_validation():
    with pytest.raises(ValueError, match="3 positive orthorhombic"):
        LennardJonesPotential(8, [5.0, -5.0, 5.0])
    with pytest.raises(ValueError, match="half the shortest box side"):
        LennardJonesPotential(8, [5.0, 5.0, 5.0], cutoff=4.0)


def test_fluid_model_dispatches_blocked():
    from molann_tpu.ops.fused import model_select_mode

    model, u, box = lj_fluid_model(3)
    assert model_select_mode(model) == "blocked"
    spec = model.preprocessing_layer.feature_layer._spec
    assert sum(n for _, n in spec.coord_slices) == 2 * 27 * 26 // 2
    assert spec.coord_boxes[0][0][0] == pytest.approx(3 * SPACING)


def test_fluid_blocked_parity(rng):
    """Blocked fused kernels on the condensed-phase model (702
    minimum-image pairs): forward + CV forces match the XLA path on
    frames that straddle the periodic boundary."""
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward

    model, u, box = lj_fluid_model(3)
    x = jnp.asarray(
        (u.atoms.positions[None]
         + 1.5 * rng.normal(size=(8, 27, 3))).astype(np.float32)
    )
    y_f = fused_model_forward(model, x, tile=8, interpret=True, mode="auto")
    y_j = np.asarray(model(x))
    np.testing.assert_allclose(np.asarray(y_f), y_j, atol=5e-5)
    yv, g = fused_cv_forces(model, x, tile=8, interpret=True, mode="auto")
    gj = np.asarray(jax.grad(lambda xx: jnp.sum(model(xx)))(x))
    scale = max(np.abs(gj).max(), 1.0)
    np.testing.assert_allclose(np.asarray(g), gj, atol=5e-5 * scale)


def test_condensed_example_quick():
    """examples/condensed_phase_cv.py end to end (quick mode): LJ
    dynamics at two temperatures, coordination shells, HLDA CV
    separating solid from fluid on held-out frames, blocked fused
    serving parity."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "condensed_phase_cv.py",
    )
    spec = importlib.util.spec_from_file_location("condensed_phase_cv", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main(quick=True)
    assert res["fused_mode"] == "blocked"
    assert res["fused_rel_err"] < 1e-4
    assert res["cv_gap"] > 3 * res["cv_spread"]
    # melting loses first-shell neighbors
    assert res["shell1_fluid"] < res["shell1_solid"] - 1.0
