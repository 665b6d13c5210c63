"""TorchScript artifact import: reference users' .pt exports load as
molann_tpu models with matching values AND coordinate gradients.

The fixture modules (tests/torchscript_fixture.py) reproduce the
reference's scripted module tree and attribute names — the artifact
format — so ``torch.jit.script(...).save(...)`` archives here are
structurally identical to real reference exports (reference
test/test_molann.py:36-114)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molann_tpu.io.torch_import import load_torchscript  # noqa: E402
from molann_tpu.systems import alanine_universe  # noqa: E402

import torchscript_fixture as tsf  # noqa: E402


@pytest.fixture(scope="module")
def u():
    return alanine_universe()


@pytest.fixture(scope="module")
def frames(u):
    rng = np.random.default_rng(3)
    return (
        u.atoms.positions[None] + 0.05 * rng.normal(size=(32, 22, 3))
    ).astype(np.float32)


def _roundtrip(torch_module, tmp_path, name="m.pt"):
    path = tmp_path / name
    torch.jit.script(torch_module).save(str(path))
    return load_torchscript(str(path))


def _torch_values_and_grads(torch_module, frames):
    x = torch.tensor(frames, requires_grad=True)
    y = torch_module(x)
    y.sum().backward()
    return y.detach().numpy(), x.grad.numpy()


def _assert_model_parity(torch_module, imported, frames, atol=2e-5):
    y_ref, g_ref = _torch_values_and_grads(torch_module, frames)
    x = jnp.asarray(frames)
    y = np.asarray(imported(x))
    g = np.asarray(jax.grad(lambda v: jnp.sum(imported(v)))(x))
    np.testing.assert_allclose(y, y_ref, atol=atol)
    np.testing.assert_allclose(g, g_ref, atol=10 * atol)


@pytest.mark.parametrize("use_angle_value", [False, True])
def test_molann_roundtrip(u, frames, tmp_path, use_angle_value):
    """Full MolANN .pt → molann_tpu: values + coordinate gradients match
    torch autograd through the scripted artifact."""
    tm = tsf.alanine_reference_model(u, use_angle_value=use_angle_value)
    imported = _roundtrip(tm, tmp_path)
    from molann_tpu.models.ann import MolANN

    assert isinstance(imported, MolANN)
    _assert_model_parity(tm, imported, frames)


def test_molann_without_alignment(u, frames, tmp_path):
    """Identity align layer in the artifact → PreprocessingANN(None, ...)."""
    tm = tsf.alanine_reference_model(u, with_alignment=False)
    imported = _roundtrip(tm, tmp_path)
    from molann_tpu.models.ann import Identity

    assert isinstance(imported.preprocessing_layer.align_layer, Identity)
    _assert_model_parity(tm, imported, frames)


def test_feature_layer_roundtrip(u, frames, tmp_path):
    """Standalone FeatureLayer artifact, incl. a position feature (the
    reshape layout x,y,z per atom must survive the import)."""
    n = len(u.atoms)
    input_ix = list(range(n))
    tm = tsf.FeatureLayer(
        [
            tsf.FeatureMap(1, [1, 4], input_ix),
            tsf.FeatureMap(3, [5, 3, 0], input_ix),  # position, 3 atoms
            tsf.FeatureMap(2, [4, 6, 8, 14], input_ix),
        ],
        n,
    )
    imported = _roundtrip(tm, tmp_path)
    assert imported.output_dimension() == 1 + 9 + 2
    _assert_model_parity(tm, imported, frames)
    # atom order inside the position feature is preserved (6,4,1 1-based)
    info = imported.get_feature_info()
    np.testing.assert_array_equal(
        list(info["atom indices (1-based)"])[1], [6, 4, 1]
    )


def test_alignment_roundtrip(u, frames, tmp_path):
    tm = tsf.AlignmentLayer(
        u.atoms.positions[[0, 1, 4]], [0, 1, 4], list(range(22))
    )
    imported = _roundtrip(tm, tmp_path)
    np.testing.assert_allclose(
        np.asarray(imported.ref_x),
        tm.ref_x.numpy(),
        atol=1e-6,
    )
    y_ref, g_ref = _torch_values_and_grads(tm, frames)
    x = jnp.asarray(frames)
    np.testing.assert_allclose(np.asarray(imported(x)), y_ref, atol=2e-5)
    g = np.asarray(jax.grad(lambda v: jnp.sum(imported(v)))(x))
    np.testing.assert_allclose(g, g_ref, atol=2e-4)


def test_sequential_roundtrip(tmp_path):
    tm = tsf.sequential_mlp([4, 8, 3], seed=5)
    imported = _roundtrip(tm, tmp_path)
    assert imported.layer_dims == (4, 8, 3)
    xb = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(imported(jnp.asarray(xb))),
        tm(torch.tensor(xb)).detach().numpy(),
        atol=2e-6,
    )


def test_sequential_relu_activation(tmp_path):
    tm = tsf.sequential_mlp([3, 6, 2], activation=torch.nn.ReLU())
    imported = _roundtrip(tm, tmp_path)
    xb = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(imported(jnp.asarray(xb))),
        tm(torch.tensor(xb)).detach().numpy(),
        atol=2e-6,
    )


def test_feature_map_roundtrip(u, frames, tmp_path):
    tm = tsf.FeatureMap(0, [19, 18, 20], list(range(22)),
                        use_angle_value=True)
    imported = _roundtrip(tm, tmp_path)
    assert imported.dim() == 1
    y_ref, _ = _torch_values_and_grads(tm, frames)
    np.testing.assert_allclose(
        np.asarray(imported(jnp.asarray(frames))), y_ref, atol=2e-5
    )


def test_global_indices_preserved(u, tmp_path):
    """Archived global atom numbering (a subset input group) survives
    into get_feature_info / get_atom_indices (1-based, reference
    convention)."""
    input_ix = [4, 6, 8, 14, 1]  # a 5-atom input group, global ids
    tm = tsf.FeatureLayer(
        [tsf.FeatureMap(2, [0, 1, 2, 3], input_ix)], len(input_ix)
    )
    imported = _roundtrip(tm, tmp_path)
    feat = imported.get_feature(0)
    np.testing.assert_array_equal(
        feat.get_atom_indices(), np.asarray([5, 7, 9, 15])
    )


def test_identity_fallback_when_globals_missing():
    """If the archive lost the global index lists, atoms renumber
    0..n-1 — forward semantics are unchanged."""
    from molann_tpu.io.torch_import import _input_group

    class Stub:
        input_atom_num = 7

    g = _input_group(Stub())
    np.testing.assert_array_equal(g.ix, np.arange(7))


def test_mixed_use_angle_value_rejected(u, tmp_path):
    tm = tsf.FeatureLayer(
        [
            tsf.FeatureMap(1, [1, 4], list(range(22)), use_angle_value=False),
            tsf.FeatureMap(0, [19, 18, 20], list(range(22)),
                           use_angle_value=True),
        ],
        22,
    )
    with pytest.raises(ValueError, match="use_angle_value"):
        _roundtrip(tm, tmp_path)


def test_imported_model_serves_and_checkpoints(u, frames, tmp_path):
    """The imported pytree model round-trips through save_model/load_model
    and runs through the fused serving path."""
    from molann_tpu.io import load_model, save_model
    from molann_tpu.ops.fused import fused_model_forward

    tm = tsf.alanine_reference_model(u)
    imported = _roundtrip(tm, tmp_path)
    save_model(tmp_path / "imported.npz", imported)
    reloaded = load_model(tmp_path / "imported.npz")
    x = jnp.asarray(frames)
    np.testing.assert_allclose(
        np.asarray(reloaded(x)), np.asarray(imported(x)), atol=1e-6
    )
    fused = np.asarray(fused_model_forward(reloaded, x, interpret=True))
    np.testing.assert_allclose(fused, np.asarray(imported(x)), atol=5e-5)


def test_import_torch_cli(u, tmp_path, capsys):
    from molann_tpu.cli import main

    tm = tsf.alanine_reference_model(u)
    pt = tmp_path / "ref_model.pt"
    torch.jit.script(tm).save(str(pt))
    out = tmp_path / "imported.npz"
    assert main(["import-torch", str(pt), "--out", str(out)]) == 0
    printed = capsys.readouterr().out
    assert "imported MolANN" in printed and "dihedral" in printed
    assert main(["info", str(out)]) == 0
