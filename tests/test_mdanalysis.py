"""Real-MDAnalysis interop (VERDICT r01 #6).

The whole topology front-end is duck-typed to MDAnalysis (reference
setup.cfg:22 hard-depends on it; our topology.py only reads ``.ix``,
``.positions``, ``len()``, iteration and ``+``). This module proves the
claim with the real library: the full Universe -> Feature -> Layer ->
golden-value pipeline runs on genuine MDAnalysis objects. Skips unless
MDAnalysis is importable (it is an optional dependency — not installed in
the CI image; run with any MDAnalysis>=2.0 to execute).
"""

import jax.numpy as jnp
import numpy as np
import pytest

mda = pytest.importorskip("MDAnalysis")

from fixtures import write_fixture_files  # noqa: E402

from molann_tpu import (  # noqa: E402
    AlignmentLayer,
    Feature,
    FeatureFileReader,
    FeatureLayer,
    MolANN,
    PreprocessingANN,
    create_sequential_nn,
)

GOLDEN = {
    "d1": [-1.0, 0.0],
    "d2": [-1.0, 0.0],
    "b1": [1.529683],
    "b2": [1.2300372],
    "a1": [-0.33281142],
    "a2": [-0.5423109],
}


@pytest.fixture(scope="module")
def mda_universe(tmp_path_factory):
    d = write_fixture_files(tmp_path_factory.mktemp("mda"))
    return mda.Universe(str(d / "alanine.pdb"))


def test_feature_accepts_mda_atomgroup(mda_universe):
    ag = mda_universe.select_atoms("bynum 2 5")
    f = Feature("b1", "bond", ag)
    assert f.get_atom_indices() == [2, 5]  # 1-based, like the reference


def test_feature_file_reader_with_mda(mda_universe, tmp_path_factory):
    d = write_fixture_files(tmp_path_factory.mktemp("ff"))
    feats = FeatureFileReader(
        str(d / "features.txt"), "Histogram", mda_universe
    ).read()
    assert [f.get_name() for f in feats] == ["d1", "d2", "b1", "b2", "a1", "a2"]


def test_golden_values_with_mda_groups(mda_universe):
    u = mda_universe

    def ordered(nums):
        ag = None
        for n in nums:
            s = u.select_atoms(f"bynum {n}")
            ag = s if ag is None else ag + s
        return ag

    feats = [
        Feature("d1", "dihedral", ordered((5, 7, 9, 15))),
        Feature("d2", "dihedral", ordered((7, 9, 15, 17))),
        Feature("b1", "bond", u.select_atoms("bynum 2 5")),
        Feature("b2", "bond", u.select_atoms("bynum 5 6")),
        Feature("a1", "angle", ordered((20, 19, 21))),
        Feature("a2", "angle", ordered((16, 15, 17))),
    ]
    layer = FeatureLayer(feats, u.atoms)
    x0 = jnp.asarray(u.atoms.positions[None])
    out = np.asarray(layer(x0))[0]
    expected = np.concatenate([GOLDEN[f.get_name()] for f in feats])
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=2e-6)


def test_full_model_with_mda_groups(mda_universe):
    u = mda_universe
    align = AlignmentLayer(u.select_atoms("bynum 1 2 5"), u.atoms)
    feats = [Feature("p", "position", u.select_atoms("resid 2"))]
    feats.append(Feature("b", "bond", u.select_atoms("bynum 2 5")))
    pp = PreprocessingANN(align, FeatureLayer(feats, u.atoms))
    model = MolANN(pp, create_sequential_nn([pp.output_dimension(), 5, 2]))
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * np.random.default_rng(0).normal(size=(8, 22, 3))
    ).astype(jnp.float32)
    y = model(x)
    assert y.shape == (8, 2) and bool(jnp.isfinite(y).all())
