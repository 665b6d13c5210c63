"""Golden-value tests: exact reference numerics on the fixture geometry
(SURVEY.md §2.2 / BASELINE.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import GOLDEN, GOLDEN_REF_X
from molann_tpu.ann import AlignmentLayer, FeatureLayer
from molann_tpu.feature import FeatureFileReader

TOL = 1e-6


@pytest.fixture(scope="module")
def histogram_features(universe, feature_file):
    return FeatureFileReader(feature_file, "Histogram", universe).read()


@pytest.mark.parametrize("use_angle_value", [False, True])
def test_golden_feature_values(universe, histogram_features, use_angle_value):
    layer = FeatureLayer(histogram_features, universe.atoms, use_angle_value)
    x = jnp.asarray(universe.atoms.positions)[None]
    out = np.asarray(layer(x))[0]

    expected = []
    for f in histogram_features:
        g = GOLDEN[f.get_name()][1 if use_angle_value else 0]
        if f.get_type() == "dihedral" and not use_angle_value:
            expected.extend(g)
        else:
            expected.append(g)
    np.testing.assert_allclose(out, np.asarray(expected, np.float32), atol=TOL)


def test_golden_output_dimension(universe, histogram_features):
    layer = FeatureLayer(histogram_features, universe.atoms, False)
    assert layer.output_dimension() == 8  # 2+2+1+1+1+1
    layer_av = FeatureLayer(histogram_features, universe.atoms, True)
    assert layer_av.output_dimension() == 6


@pytest.mark.parametrize("method", ["svd", "eigh", "qcp"])
def test_golden_alignment(universe, method):
    align = AlignmentLayer(
        universe.select_atoms("bynum 1 2 5"), universe.atoms, method=method
    )
    np.testing.assert_allclose(np.asarray(align.ref_x), GOLDEN_REF_X, atol=TOL)

    x = jnp.asarray(universe.atoms.positions)[None]
    out = np.asarray(align(x))[0]
    # self-alignment reproduces the centered reference on the align subset
    np.testing.assert_allclose(out[[0, 1, 4]], GOLDEN_REF_X, atol=1e-6)


@pytest.mark.parametrize("method", ["svd", "eigh", "qcp"])
def test_golden_rigid_motion_invariance(universe, method):
    align = AlignmentLayer(
        universe.select_atoms("bynum 1 2 5"), universe.atoms, method=method
    )
    x = universe.atoms.positions[None]
    th = 0.7
    rz = np.array(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )
    x2 = x @ rz.T + np.array([5.0, -3.0, 2.0], dtype=np.float32)
    o1 = np.asarray(align(jnp.asarray(x)))
    o2 = np.asarray(align(jnp.asarray(x2)))
    assert np.abs(o1 - o2).max() < 5e-6  # reference measures ~1.9e-6 float32
