"""Cross-validation against the GENUINE reference library.

When the upstream molann source tree is available (env var
``MOLANN_REFERENCE_PATH`` or the conventional /root/reference), build
real reference models (molann/ann.py) with duck-typed atom groups,
script-save them exactly as reference users do (reference
test/test_molann.py:36-114), and check that:

- our TorchScript importer reconstructs them with matching values AND
  coordinate gradients, and
- our exporter's artifacts agree with the real reference forward on the
  same inputs (both are loaded by plain torch.jit.load).

This removes the one correlation in the interop tests: everything else
validates against fixtures written by this repo's author, while here the
oracle is the reference itself. Skips cleanly when the reference tree or
torch is unavailable (molann's modules import only torch+pandas —
MDAnalysis is needed to *construct* its groups, not to run its code, so
our FrozenAtomGroup/Universe groups satisfy the duck-typed surface)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = os.environ.get("MOLANN_REFERENCE_PATH", "/root/reference")

if not os.path.isdir(os.path.join(REFERENCE, "molann")):
    pytest.skip(
        "reference molann tree not available "
        "(set MOLANN_REFERENCE_PATH)",
        allow_module_level=True,
    )

sys.path.insert(0, REFERENCE)
try:
    from molann.ann import (  # noqa: E402
        AlignmentLayer as RefAlignmentLayer,
        FeatureLayer as RefFeatureLayer,
        MolANN as RefMolANN,
        PreprocessingANN as RefPreprocessingANN,
        create_sequential_nn as ref_create_sequential_nn,
    )
finally:
    sys.path.remove(REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molann_tpu.feature import Feature  # noqa: E402
from molann_tpu.io.torch_export import export_torchscript  # noqa: E402
from molann_tpu.io.torch_import import load_torchscript  # noqa: E402
from molann_tpu.systems import alanine_universe  # noqa: E402


@pytest.fixture(scope="module")
def u():
    return alanine_universe()


@pytest.fixture(scope="module")
def frames(u):
    rng = np.random.default_rng(17)
    return (
        u.atoms.positions[None] + 0.05 * rng.normal(size=(20, 22, 3))
    ).astype(np.float32)


def _features(u):
    # the reference's [Output]+[Histogram] observables (test/feature.txt)
    def sel(*serials):
        g = u.select_atoms(f"bynum {serials[0]}")
        for s in serials[1:]:
            g = g + u.select_atoms(f"bynum {s}")
        return g

    return [
        Feature("d1", "dihedral", sel(5, 7, 9, 15)),
        Feature("b1", "bond", sel(2, 5)),
        Feature("a1", "angle", sel(20, 19, 21)),
    ]


def _ref_model(u, use_angle_value=False, seed=0):
    """A genuine reference MolANN (duck-typed groups; our Feature objects
    satisfy the get_type_id/get_atom_indices surface the reference's
    FeatureMap consumes, molann/ann.py:252-263)."""
    torch.manual_seed(seed)
    flayer = RefFeatureLayer(_features(u), u.atoms, use_angle_value)
    align = RefAlignmentLayer(u.select_atoms("bynum 1 2 5"), u.atoms)
    pp = RefPreprocessingANN(align, flayer)
    d = flayer.output_dimension()
    return RefMolANN(pp, ref_create_sequential_nn([d, 5, 2]))


def _torch_values_and_grads(m, frames):
    x = torch.tensor(frames, requires_grad=True)
    y = m(x)
    y.sum().backward()
    return y.detach().numpy(), x.grad.numpy()


@pytest.mark.parametrize("use_angle_value", [False, True])
def test_import_genuine_reference_artifact(u, frames, tmp_path,
                                           use_angle_value):
    """script-save a REAL reference model; our importer must reproduce
    its values and coordinate gradients."""
    ref = _ref_model(u, use_angle_value)
    path = tmp_path / "ref.pt"
    torch.jit.script(ref).save(str(path))
    imported = load_torchscript(str(path))

    y_ref, g_ref = _torch_values_and_grads(ref, frames)
    x = jnp.asarray(frames)
    np.testing.assert_allclose(np.asarray(imported(x)), y_ref, atol=2e-5)
    g = np.asarray(jax.grad(lambda v: jnp.sum(imported(v)))(x))
    np.testing.assert_allclose(g, g_ref, atol=2e-4)
    # structure: feature identities recovered 1:1
    info = imported.preprocessing_layer.feature_layer.get_feature_info()
    assert list(info["type"]) == ["dihedral", "bond", "angle"]
    got_idx = [list(ix) for ix in info["atom indices (1-based)"]]
    assert got_idx == [[5, 7, 9, 15], [2, 5], [20, 19, 21]]


def test_imported_reference_layers_standalone(u, frames, tmp_path):
    """Layer-level artifacts (the reference scripts every layer in its
    own tests) import and match."""
    flayer = RefFeatureLayer(_features(u), u.atoms, False)
    align = RefAlignmentLayer(u.select_atoms("bynum 1 2 5"), u.atoms)
    x = jnp.asarray(frames)
    for name, layer in [("flayer", flayer), ("align", align)]:
        path = tmp_path / f"{name}.pt"
        torch.jit.script(layer).save(str(path))
        ours = load_torchscript(str(path))
        want = layer(torch.tensor(frames)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours(x)), want, atol=2e-5)


def test_export_agrees_with_genuine_reference(u, frames, tmp_path):
    """Build the SAME model twice — once with reference classes, once
    with ours (weights copied via import) — export ours, and check the
    two .pt artifacts agree under plain torch.jit.load."""
    ref = _ref_model(u)
    ref_path = tmp_path / "ref.pt"
    torch.jit.script(ref).save(str(ref_path))
    ours = load_torchscript(str(ref_path))
    out_path = tmp_path / "ours.pt"
    export_torchscript(ours, out_path)

    a = torch.jit.load(str(ref_path))
    b = torch.jit.load(str(out_path))
    xt = torch.tensor(frames)
    np.testing.assert_allclose(
        b(xt).detach().numpy(), a(xt).detach().numpy(), atol=2e-5
    )
    # the reference-layout attributes our exporter writes match the
    # genuine artifact's
    ra, rb = a.preprocessing_layer.align_layer, \
        b.preprocessing_layer.align_layer
    assert [int(i) for i in ra._local_align_atom_indices] == \
        [int(i) for i in rb._local_align_atom_indices]
    np.testing.assert_allclose(rb.ref_x.numpy(), ra.ref_x.numpy(),
                               atol=1e-6)
