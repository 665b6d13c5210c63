"""TorchScript export: molann_tpu models serialize as reference-layout
``torch.jit.script(...).save`` artifacts that LibTorch-embedded engines
(the reference's downstream consumers) can run unchanged.

Independence note: parity here is checked against torch AUTOGRAD on the
loaded artifact (an oracle independent of this repo's JAX code), and
the artifact structure is asserted attribute-by-attribute against the
reference layout (reference molann/ann.py:131-141, 252-263)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molann_tpu.io.torch_export import export_torchscript  # noqa: E402
from molann_tpu.io.torch_import import load_torchscript  # noqa: E402
from molann_tpu.systems import alanine_model, alanine_universe  # noqa: E402


@pytest.fixture(scope="module")
def model_u():
    return alanine_model()


@pytest.fixture(scope="module")
def frames(model_u):
    _, u = model_u
    rng = np.random.default_rng(11)
    return (
        u.atoms.positions[None] + 0.05 * rng.normal(size=(24, 22, 3))
    ).astype(np.float32)


def _jax_values_and_grads(model, frames):
    x = jnp.asarray(frames)
    y = np.asarray(model(x))
    g = np.asarray(jax.grad(lambda v: jnp.sum(model(v)))(x))
    return y, g


def test_exported_artifact_matches_on_values_and_grads(
    model_u, frames, tmp_path
):
    """Saved .pt reloaded by plain torch.jit.load: forward AND autograd
    coordinate gradients match the JAX model."""
    model, _ = model_u
    path = tmp_path / "model.pt"
    export_torchscript(model, path)
    loaded = torch.jit.load(str(path))
    xt = torch.tensor(frames, requires_grad=True)
    yt = loaded(xt)
    yt.sum().backward()
    y_ref, g_ref = _jax_values_and_grads(model, frames)
    np.testing.assert_allclose(yt.detach().numpy(), y_ref, atol=2e-5)
    np.testing.assert_allclose(xt.grad.numpy(), g_ref, atol=2e-4)


def test_reference_layout_attributes(model_u, tmp_path):
    """The artifact exposes the reference's module tree and attribute
    names — what a reference-ecosystem consumer would reach for."""
    model, _ = model_u
    path = tmp_path / "model.pt"
    export_torchscript(model, path)
    m = torch.jit.load(str(path))
    pp = m.preprocessing_layer
    al = pp.align_layer
    assert al.original_name == "AlignmentLayer"
    assert list(al.ref_x.shape) == [3, 3]
    assert [int(i) for i in al._local_align_atom_indices] == [0, 1, 4]
    fmaps = list(pp.feature_layer.feature_map_list.children())
    # alanine_model: position(resid 2) + 2 dihedrals + 2 bonds + 2 angles
    assert [int(f.type_id) for f in fmaps] == [3, 2, 2, 1, 1, 0, 0]
    assert int(pp.feature_layer.input_atom_num) == 22
    children = [c.original_name for c in m.ann_layers.children()]
    assert children[0] == "Linear" and "Tanh" in children


def test_roundtrip_import_of_export(model_u, frames, tmp_path):
    """export -> import returns a model equal in outputs to the original
    (the two directions are inverse up to float32 noise)."""
    model, _ = model_u
    path = tmp_path / "rt.pt"
    export_torchscript(model, path)
    back = load_torchscript(str(path))
    y0, g0 = _jax_values_and_grads(model, frames)
    y1, g1 = _jax_values_and_grads(back, frames)
    np.testing.assert_allclose(y1, y0, atol=2e-5)
    np.testing.assert_allclose(g1, g0, atol=2e-4)
    # ref_x survives up to one f32 re-centering rounding (the importer
    # re-centers the already-centered buffer)
    np.testing.assert_allclose(
        np.asarray(back.preprocessing_layer.align_layer.ref_x),
        np.asarray(model.preprocessing_layer.align_layer.ref_x),
        atol=1e-6,
    )


def test_export_without_alignment(frames, tmp_path):
    from molann_tpu.ann import FeatureLayer, PreprocessingANN
    from molann_tpu.feature import Feature

    u = alanine_universe()
    pp = PreprocessingANN(
        None,
        FeatureLayer(
            [Feature("b", "bond", u.select_atoms("bynum 2 5"))], u.atoms
        ),
    )
    path = tmp_path / "pp.pt"
    export_torchscript(pp, path)
    m = torch.jit.load(str(path))
    assert m.align_layer.original_name == "Identity"
    y = m(torch.tensor(frames)).detach().numpy()
    np.testing.assert_allclose(
        y, np.asarray(pp(jnp.asarray(frames))), atol=2e-5
    )


def test_export_standalone_layers(model_u, frames, tmp_path):
    """Every class the reference itself exports round-trips standalone."""
    model, u = model_u
    pp = model.preprocessing_layer
    x = torch.tensor(frames)
    for i, layer in enumerate(
        [pp.feature_layer, pp.align_layer, pp, model.ann_layers]
    ):
        path = tmp_path / f"layer{i}.pt"
        export_torchscript(layer, path)
        m = torch.jit.load(str(path))
        if layer is model.ann_layers:
            xin = torch.tensor(
                np.asarray(pp(jnp.asarray(frames)), np.float32)
            )
            got = m(xin).detach().numpy()
            want = np.asarray(layer(jnp.asarray(xin.numpy())))
        else:
            got = m(x).detach().numpy()
            want = np.asarray(layer(jnp.asarray(frames)))
        np.testing.assert_allclose(got, want, atol=3e-5)


def test_export_preserves_global_numbering(tmp_path):
    """Features defined on a subset input group keep their global atom
    ids in the artifact (recovered from the Feature objects)."""
    from molann_tpu.ann import FeatureLayer
    from molann_tpu.feature import Feature
    from molann_tpu.topology import FrozenAtomGroup

    group = FrozenAtomGroup([4, 6, 8, 14])  # global ids, 4-atom input
    flayer = FeatureLayer(
        [Feature("d", "dihedral", group)], group
    )
    path = tmp_path / "sub.pt"
    export_torchscript(flayer, path)
    m = torch.jit.load(str(path))
    fmap = next(m.feature_map_list.children())
    assert [int(i) for i in fmap.input_atom_indices] == [4, 6, 8, 14]
    back = load_torchscript(str(path))
    np.testing.assert_array_equal(
        back.get_feature(0).get_atom_indices(), [5, 7, 9, 15]
    )


def test_trained_model_exports(tmp_path):
    """The headline migration story: train on TPU-side JAX, export, and
    the artifact reproduces the trained outputs under LibTorch."""
    import optax

    from molann_tpu.systems import alanine_model
    from molann_tpu.train import fit, mse_loss

    model, u = alanine_model()
    rng = np.random.default_rng(2)
    frames = (
        u.atoms.positions[None] + 0.05 * rng.normal(size=(256, 22, 3))
    ).astype(np.float32)
    targets = frames[:, 4, :3].astype(np.float32)

    def batches():
        while True:
            yield jnp.asarray(frames), jnp.asarray(targets)

    res = fit(model, mse_loss, batches(), optimizer=optax.adam(1e-3),
              num_steps=15, log_every=0)
    trained = res.model
    path = tmp_path / "trained.pt"
    export_torchscript(trained, path)
    loaded = torch.jit.load(str(path))
    got = loaded(torch.tensor(frames[:32])).detach().numpy()
    want = np.asarray(trained(jnp.asarray(frames[:32])))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_export_torch_cli(tmp_path, capsys):
    from molann_tpu.cli import main
    from molann_tpu.io import save_model
    from molann_tpu.systems import alanine_model

    model, _ = alanine_model()
    npz = tmp_path / "m.npz"
    save_model(npz, model)
    out = tmp_path / "m.pt"
    assert main(["export-torch", str(npz), "--out", str(out)]) == 0
    assert "TorchScript" in capsys.readouterr().out
    m = torch.jit.load(str(out))
    assert m.original_name == "MolANN"


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000), data=st.data())
def test_random_model_roundtrips_through_torchscript(tmp_path_factory,
                                                     seed, data):
    """Fuzz the interop: random feature sets (types, atoms, order), random
    MLP widths/activations, optional alignment — export -> torch.jit.load
    forward parity AND export -> import output equality."""
    import jax.random as jrandom

    from molann_tpu.ann import (
        AlignmentLayer,
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from molann_tpu.feature import Feature
    from molann_tpu.systems import alanine_universe

    u = alanine_universe()
    rng = np.random.default_rng(seed)
    n = len(u.atoms)

    def group(k):
        ids = rng.choice(n, size=k, replace=False) + 1  # 1-based serials
        g = u.select_atoms(f"bynum {ids[0]}")
        for i in ids[1:]:
            g = g + u.select_atoms(f"bynum {i}")
        return g

    n_feats = data.draw(st.integers(1, 4))
    feats = []
    for i in range(n_feats):
        ftype = data.draw(st.sampled_from(
            ["bond", "angle", "dihedral", "position"]))
        k = {"bond": 2, "angle": 3, "dihedral": 4}.get(
            ftype, data.draw(st.integers(1, 5)))
        feats.append(Feature(f"r{i}", ftype, group(k)))
    uav = data.draw(st.booleans())
    flayer = FeatureLayer(feats, u.atoms, uav)
    align = None
    if data.draw(st.booleans()):
        align = AlignmentLayer(group(data.draw(st.integers(3, 6))), u.atoms)
    pp = PreprocessingANN(align, flayer)
    hidden = data.draw(
        st.lists(st.integers(2, 8), min_size=1, max_size=3))
    act = data.draw(st.sampled_from(["tanh", "relu", "sigmoid", "elu"]))
    from molann_tpu.io.serialize import ACTIVATIONS

    model = MolANN(pp, create_sequential_nn(
        [pp.output_dimension(), *hidden], activation=ACTIVATIONS[act],
        key=jrandom.PRNGKey(seed)))

    frames = (
        u.atoms.positions[None] + 0.05 * rng.normal(size=(8, n, 3))
    ).astype(np.float32)
    path = tmp_path_factory.mktemp("fuzz") / "m.pt"
    export_torchscript(model, path)

    want = np.asarray(model(jnp.asarray(frames)))
    got_torch = torch.jit.load(str(path))(
        torch.tensor(frames)).detach().numpy()
    np.testing.assert_allclose(got_torch, want, atol=5e-5)
    back = load_torchscript(str(path))
    np.testing.assert_allclose(
        np.asarray(back(jnp.asarray(frames))), want, atol=5e-5
    )
