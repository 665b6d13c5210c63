"""Layer API tests: composition, jit, grads, column order, pytree behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.ann import (
    AlignmentLayer,
    FeatureLayer,
    FeatureMap,
    Identity,
    MolANN,
    PreprocessingANN,
    create_sequential_nn,
)
from molann_tpu.feature import Feature, FeatureFileReader


@pytest.fixture(scope="module")
def histogram_features(universe, feature_file):
    return FeatureFileReader(feature_file, "Histogram", universe).read()


def frames(universe, rng, l=4, noise=0.1):
    x = universe.atoms.positions[None] + noise * rng.normal(
        size=(l, 22, 3)
    ).astype(np.float32)
    return jnp.asarray(x)


def test_create_sequential_nn():
    nn = create_sequential_nn([10, 5, 1])
    assert nn.output_dimension() == 1
    assert len(nn) == 2
    x = jnp.ones((3, 10))
    assert nn(x).shape == (3, 1)
    with pytest.raises(AssertionError):
        create_sequential_nn([10])
    nn2 = create_sequential_nn([10, 2], activation=jax.nn.relu)
    assert nn2(x).shape == (3, 2)


def test_sequential_nn_init_range():
    nn = create_sequential_nn([100, 50], key=jax.random.PRNGKey(3))
    w, b = nn.params[0]
    bound = 1.0 / np.sqrt(100)
    assert float(jnp.abs(w).max()) <= bound
    assert float(jnp.abs(b).max()) <= bound
    assert float(jnp.abs(w).max()) > 0.5 * bound  # actually spread out


def test_feature_map_dims(universe):
    ag = universe.atoms
    f_angle = Feature("a", "angle", universe.select_atoms("bynum 1 2 3"))
    f_bond = Feature("b", "bond", universe.select_atoms("bynum 1 2"))
    f_dih = Feature("d", "dihedral", universe.select_atoms("bynum 1 2 3 4"))
    f_pos = Feature("p", "position", universe.select_atoms("bynum 1 2 3"))
    assert FeatureMap(f_angle, ag).dim() == 1
    assert FeatureMap(f_bond, ag).dim() == 1
    assert FeatureMap(f_dih, ag, use_angle_value=False).dim() == 2
    assert FeatureMap(f_dih, ag, use_angle_value=True).dim() == 1
    assert FeatureMap(f_pos, ag).dim() == 9


def test_feature_map_atoms_must_be_in_input(universe):
    f = Feature("b", "bond", universe.select_atoms("bynum 21 22"))
    with pytest.raises(ValueError, match="must be among the input"):
        FeatureMap(f, universe.select_atoms("bynum 1:10"))


def test_alignment_atoms_must_be_in_input(universe):
    with pytest.raises(ValueError, match="must be among the input"):
        AlignmentLayer(
            universe.select_atoms("bynum 21 22"),
            universe.select_atoms("bynum 1:10"),
        )


def test_feature_layer_matches_per_feature_maps(universe, histogram_features, rng):
    """The type-grouped compiled path must equal per-feature maps,
    column-for-column (reference column order, molann/ann.py:473)."""
    x = frames(universe, rng, l=5)
    for uav in (False, True):
        layer = FeatureLayer(histogram_features, universe.atoms, uav)
        out = np.asarray(layer(x))
        cols = [
            np.asarray(fm(x)) for fm in layer.feature_map_list
        ]
        expected = np.concatenate(cols, axis=1)
        np.testing.assert_allclose(out, expected, atol=1e-6)
        assert out.shape[1] == layer.output_dimension()


def test_feature_layer_interleaved_order(universe, rng):
    """Mixed type order (bond, dihedral, position, angle) must come back in
    feature-list order after the internal type-grouped compute."""
    feats = [
        Feature("b", "bond", universe.select_atoms("bynum 2 5")),
        Feature("d", "dihedral",
                universe.select_atoms("bynum 5") + universe.select_atoms("bynum 7")
                + universe.select_atoms("bynum 9") + universe.select_atoms("bynum 15")),
        Feature("p", "position", universe.select_atoms("bynum 1 2")),
        Feature("a", "angle",
                universe.select_atoms("bynum 16") + universe.select_atoms("bynum 15")
                + universe.select_atoms("bynum 17")),
    ]
    layer = FeatureLayer(feats, universe.atoms, use_angle_value=False)
    assert layer.output_dimension() == 1 + 2 + 6 + 1
    x = frames(universe, rng, l=3)
    out = np.asarray(layer(x))
    expected = np.concatenate(
        [np.asarray(fm(x)) for fm in layer.feature_map_list], axis=1
    )
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_feature_layer_empty_list_asserts(universe):
    with pytest.raises(AssertionError):
        FeatureLayer([], universe.atoms)


def test_feature_layer_info_and_getters(universe, histogram_features):
    layer = FeatureLayer(histogram_features, universe.atoms)
    df = layer.get_feature_info()
    assert len(df) == 6
    assert layer.get_feature(0).get_name() == "d1"


def test_preprocessing_ann(universe, histogram_features, rng):
    align = AlignmentLayer(universe.select_atoms("bynum 1 2 5"), universe.atoms)
    flayer = FeatureLayer(histogram_features, universe.atoms)
    pp = PreprocessingANN(align, flayer)
    assert pp.output_dimension() == 8
    x = frames(universe, rng)
    out = pp(x)
    assert out.shape == (4, 8)
    # features are rigid-motion invariant => alignment must not change them
    pp_noalign = PreprocessingANN(None, flayer)
    assert isinstance(pp_noalign.align_layer, Identity)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(pp_noalign(x)), atol=1e-4
    )


def test_molann_forward_and_jit(universe, histogram_features, rng):
    flayer = FeatureLayer(histogram_features, universe.atoms)
    pp = PreprocessingANN(None, flayer)
    nn = create_sequential_nn([pp.output_dimension(), 5, 3])
    model = MolANN(pp, nn)
    assert model.get_preprocessing_layer() is pp
    x = frames(universe, rng)
    y = model(x)
    assert y.shape == (4, 3)
    # model is a pytree: jit over (model, x)
    fwd = jax.jit(lambda m, xx: m(xx))
    np.testing.assert_allclose(np.asarray(fwd(model, x)), np.asarray(y), atol=1e-6)
    # jit cache: same static structure on rebuild
    leaves, treedef = jax.tree_util.tree_flatten(model)
    model2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(
        np.asarray(fwd(model2, x)), np.asarray(y), atol=1e-6
    )


def test_gradient_locality(universe, rng):
    """Gradients flow only to atoms used by the features
    (SURVEY.md §2.2 gradient check)."""
    feats = [
        Feature("b", "bond", universe.select_atoms("bynum 5 6")),
        Feature(
            "d",
            "dihedral",
            universe.select_atoms("bynum 1") + universe.select_atoms("bynum 3")
            + universe.select_atoms("bynum 2") + universe.select_atoms("bynum 4"),
        ),
    ]
    flayer = FeatureLayer(feats, universe.atoms)
    pp = PreprocessingANN(None, flayer)
    nn = create_sequential_nn([3, 5, 3])
    model = MolANN(pp, nn)
    x = frames(universe, rng, l=2)
    g = np.asarray(jax.grad(lambda xx: float(0) + jnp.sum(model(xx)))(x))
    involved = {0, 1, 2, 3, 4, 5}
    norms = np.abs(g).sum(axis=(0, 2))
    for i in range(22):
        if i in involved:
            assert norms[i] > 1e-8, f"atom {i} should receive gradient"
        else:
            assert norms[i] == 0.0, f"atom {i} should NOT receive gradient"


def test_grad_wrt_model_params(universe, histogram_features, rng):
    flayer = FeatureLayer(histogram_features, universe.atoms)
    pp = PreprocessingANN(None, flayer)
    nn = create_sequential_nn([8, 5, 1])
    model = MolANN(pp, nn)
    x = frames(universe, rng)

    def loss(m, xx):
        return jnp.mean(m(xx) ** 2)

    grads = jax.grad(loss)(model, x)
    # grads mirror the model pytree; MLP weight grads are nonzero
    gw, gb = grads.ann_layers.params[0]
    assert float(jnp.abs(gw).sum()) > 0


def test_input_shape_assertions(universe, histogram_features):
    layer = FeatureLayer(histogram_features, universe.atoms)
    with pytest.raises(AssertionError):
        layer(jnp.zeros((2, 10, 3)))
    align = AlignmentLayer(universe.select_atoms("bynum 1 2 5"), universe.atoms)
    with pytest.raises(AssertionError):
        align(jnp.zeros((2, 22, 2)))


def test_show_info_prints(universe, capsys):
    align = AlignmentLayer(universe.select_atoms("bynum 1 2 5"), universe.atoms)
    align.show_info()
    out = capsys.readouterr().out
    assert "22 atoms used for input" in out
    assert "3 atoms used for alignment" in out
