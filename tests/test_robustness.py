"""Numerical edge cases: acos range, atan2 quadrants, degenerate Kabsch,
NaN guards (SURVEY.md §5.2 — the NaN-relevant edges of the contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.feature import Feature
from molann_tpu.ops.alignment import align_frames
from molann_tpu.ops.features import angle_features, dihedral_features
from molann_tpu.topology import Universe


def test_angle_at_exact_extremes():
    """cos = ±1 exactly: value must be clean; acos grad is inf there by
    construction (the reference does not clamp — molann/ann.py:330)."""
    # three collinear atoms -> angle = pi, cos = -1
    x = jnp.asarray(
        np.array([[[0, 0, 0], [1, 0, 0], [2, 0, 0]]], np.float32)
    )
    cos = angle_features(x, ((0, 1, 2),), False)
    np.testing.assert_allclose(np.asarray(cos), [[-1.0]], atol=1e-7)
    theta = angle_features(x, ((0, 1, 2),), True)
    np.testing.assert_allclose(np.asarray(theta), [[np.pi]], atol=1e-6)
    # folded back on itself -> angle = 0, cos = +1
    x2 = jnp.asarray(
        np.array([[[2, 0, 0], [0, 0, 0], [2, 0, 0]]], np.float32)
    )
    theta2 = angle_features(x2, ((0, 1, 2),), True)
    np.testing.assert_allclose(np.asarray(theta2), [[0.0]], atol=1e-6)


def test_dihedral_quadrants():
    """atan2 hits all four quadrants with correct signs."""
    base = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    for phi in (-2.5, -0.3, 0.7, 3.0):
        rot = np.array(
            [
                [1, 0, 0],
                [0, np.cos(phi), -np.sin(phi)],
                [0, np.sin(phi), np.cos(phi)],
            ],
            np.float32,
        )
        pts = base.copy()
        # rotate the last atom around the central bond axis (y here is not
        # the bond; construct directly instead)
        p = np.array(
            [
                [np.cos(phi), 1.0, np.sin(phi)],
            ],
            np.float32,
        )
        frame = np.array(
            [[[1, -1, 0], [0, 0, 0], [0, 1, 0], *p]], np.float32
        )
        val = dihedral_features(
            jnp.asarray(frame), ((0, 1, 2, 3),), True
        )
        # golden from the documented formula semantics (same convention
        # as the torch oracle, cross-checked in test_parity_torch.py)
        cs = dihedral_features(jnp.asarray(frame), ((0, 1, 2, 3),), False)
        c, s = np.asarray(cs)[0, 0]
        np.testing.assert_allclose(
            np.asarray(val)[0, 0], np.arctan2(s, c), atol=1e-6
        )
        assert abs(np.asarray(val)[0, 0]) <= np.pi


def test_degenerate_dihedral_is_nan_like_reference():
    """All four atoms collinear: ρ = 0 -> cos/ρ is NaN in the reference
    too; we match rather than silently fabricate values."""
    frame = np.array(
        [[[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]]], np.float32
    )
    cs = np.asarray(
        dihedral_features(jnp.asarray(frame), ((0, 1, 2, 3),), False)
    )
    assert np.isnan(cs).all()


@pytest.mark.parametrize("method", ["qcp", "eigh", "svd"])
def test_kabsch_collinear_align_atoms(method, rng):
    """Collinear align atoms leave a rotation freedom; output must still
    be finite and reproduce the align subset's geometry."""
    ref = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    ref -= ref.mean(0)
    x = jnp.asarray(
        np.concatenate(
            [ref + 5.0, rng.normal(size=(4, 3)).astype(np.float32)]
        )[None]
    )
    out = align_frames(x, ref, [0, 1, 2], method=method)
    assert bool(jnp.isfinite(out).all())
    # aligned align-atoms must have the right pairwise distances
    sub = np.asarray(out)[0, :3]
    d01 = np.linalg.norm(sub[1] - sub[0])
    np.testing.assert_allclose(d01, 1.0, atol=1e-5)


@pytest.mark.parametrize("method", ["qcp", "eigh"])
def test_kabsch_gradients_near_degenerate(method, rng):
    """Gradients stay finite near (not at) degenerate configurations."""
    ref = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0.01, 0]], np.float32
    )
    ref -= ref.mean(0)
    x = jnp.asarray(
        (np.concatenate([ref, rng.normal(size=(3, 3)).astype(np.float32)]))[None]
    )
    g = jax.grad(
        lambda v: jnp.sum(align_frames(v, ref, [0, 1, 2], method=method) ** 2)
    )(x)
    assert bool(jnp.isfinite(g).all())


def test_debug_nans_clean_on_fixture(universe):
    """The full model triggers no NaNs under jax_debug_nans on realistic
    frames (SURVEY.md §5.2)."""
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(16, 22, 3)).astype(np.float32)
    )
    with jax.debug_nans(True):
        y = model(x)
        g = jax.grad(lambda v: jnp.sum(model(v)))(x)
    assert bool(jnp.isfinite(y).all()) and bool(jnp.isfinite(g).all())


def test_duplicate_atom_in_alignment_group_ok(universe):
    """AlignmentLayer does not require distinct atoms (matches reference,
    which only validates duplicates in Feature)."""
    from molann_tpu.ann import AlignmentLayer

    ag = universe.select_atoms("bynum 1 2 5")
    layer = AlignmentLayer(ag, universe.atoms)
    x = jnp.asarray(universe.atoms.positions[None])
    assert bool(jnp.isfinite(layer(x)).all())


def test_feature_layer_large_batch_shapes(universe):
    """Non-tile-aligned batch sizes work on the jnp path (the fused path
    handles padding internally)."""
    from molann_tpu.ann import FeatureLayer

    f = Feature("b", "bond", universe.select_atoms("bynum 1 2"))
    layer = FeatureLayer([f], universe.atoms)
    for l in (1, 7, 129):
        out = layer(jnp.zeros((l, 22, 3)) + jnp.asarray(universe.atoms.positions))
        assert out.shape == (l, 1)
