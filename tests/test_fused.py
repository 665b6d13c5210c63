"""Fused-kernel parity tests.

The Pallas kernels share their math with ``_forward_tiles`` (component-
style "tile math"); on CPU we verify that math directly against the
reference-path model, plus a small interpret-mode run of the actual
``pallas_call``. Full compiled-kernel parity (values, coordinate grads,
parameter grads) runs on real TPU — exercised in this session's TPU drives
and by bench.py; marked skip here on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.ops import fused as F
from molann_tpu.systems import alanine_model


@pytest.fixture(scope="module")
def model_and_frames(rng_module):
    model, u = alanine_model()
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng_module.normal(size=(64, 22, 3)).astype(np.float32)
    )
    return model, x


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def tiles_forward(model, x):
    """Evaluate the kernel's tile math directly (no pallas_call)."""
    l = x.shape[0]
    spec = model.preprocessing_layer.feature_layer.spec
    align_layer = model.preprocessing_layer.align_layer
    align_idx = tuple(align_layer._local_align_atom_indices)
    ref_rows = align_layer.ref_x.reshape(-1, 1)
    params = tuple(
        (w.T, b.reshape(-1, 1)) for (w, b) in model.ann_layers.params
    )
    xt = x.reshape(l, 66).T.reshape(66, F._sub_for(l), l // F._sub_for(l))
    atoms = [(xt[3 * a], xt[3 * a + 1], xt[3 * a + 2]) for a in range(22)]
    tensors = [ref_rows]
    for (w, b) in params:
        tensors.append(w)
        tensors.append(b)
    rows = F._forward_tiles(atoms, tensors, spec, align_idx, jnp.tanh)
    return jnp.concatenate([r.reshape(1, l) for r in rows], axis=0).T


def test_tile_math_matches_model(model_and_frames):
    model, x = model_and_frames
    y_ref = np.asarray(model(x))
    y_tiles = np.asarray(tiles_forward(model, x))
    np.testing.assert_allclose(y_tiles, y_ref, atol=5e-6)


def test_tile_math_gradients_match(model_and_frames):
    model, x = model_and_frames
    g_ref = np.asarray(jax.grad(lambda v: jnp.sum(jnp.sin(model(v))))(x))
    g_tiles = np.asarray(
        jax.grad(lambda v: jnp.sum(jnp.sin(tiles_forward(model, v))))(x)
    )
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_tiles, g_ref, atol=5e-5 * scale)


@pytest.mark.slow
def test_pallas_interpret_forward(model_and_frames):
    """Small interpret-mode run of the real pallas_call (slow on CPU)."""
    model, x = model_and_frames
    x_small = x[:32]
    y_ref = np.asarray(model(x_small))
    y_pal = np.asarray(
        F.fused_model_forward(model, x_small, tile=32, interpret=True)
    )
    np.testing.assert_allclose(y_pal, y_ref, atol=5e-6)


def test_packed_input_shape_roundtrip(model_and_frames):
    """Packed [l, 3n] input: tile math gives identical results, and the
    fused wrapper accepts both shapes (compiled parity is TPU-tested)."""
    model, x = model_and_frames
    xp = x.reshape(x.shape[0], 66)
    y3 = np.asarray(tiles_forward(model, x))
    yp = np.asarray(tiles_forward(model, xp.reshape(-1, 22, 3)))
    np.testing.assert_allclose(y3, yp, atol=0)


def test_fused_wrapper_rejects_unknown_models():
    with pytest.raises(TypeError):
        F.fused_model_forward(object(), jnp.zeros((4, 22, 3)))


def cv_forces_reference(model, x, component=None):
    """jnp-path oracle for fused_cv_forces."""
    def objective(v):
        out = model(v)
        if component is not None:
            out = out[:, component]
        return jnp.sum(out)

    return model(x), jax.grad(objective)(x)


@pytest.mark.slow
@pytest.mark.parametrize("component", [None, 0])
def test_cv_forces_interpret(model_and_frames, component):
    """Single-kernel CV+forces op matches the jnp path (interpret mode)."""
    model, x = model_and_frames
    x = x[:32]
    y_ref, g_ref = cv_forces_reference(model, x, component)
    y, g = F.fused_cv_forces(
        model, x, component=component, tile=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-6)
    scale = max(float(jnp.abs(g_ref).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=1e-5 * scale
    )


@pytest.mark.slow
def test_cv_forces_remat_interpret():
    """Interleaved-remat backward (large-system path) is exact."""
    from molann_tpu.ann import (
        AlignmentLayer,
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from molann_tpu.feature import Feature
    from molann_tpu.systems import peptide_backbone_features, synthetic_peptide

    u = synthetic_peptide(4)
    feats = [
        Feature("pos", "position", u.select_atoms("name CA"))
    ] + peptide_backbone_features(u)
    pp = PreprocessingANN(
        AlignmentLayer(u.select_atoms("name CA"), u.atoms),
        FeatureLayer(feats, u.atoms),
    )
    model = MolANN(
        pp, create_sequential_nn([pp.output_dimension(), 8, 2],
                                 key=jax.random.PRNGKey(0))
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.02 * rng.normal(size=(32, u.n_atoms, 3)).astype(np.float32)
    )
    y_ref = model(x)
    g_ref = jax.grad(lambda v: jnp.sum(model(v)))(x)
    y, g = F.fused_cv_forces(model, x, tile=32, interpret=True, remat=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=5e-6)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=5e-5 * scale
    )


@pytest.mark.slow
def test_cv_forces_transposed_interpret(model_and_frames):
    model, x = model_and_frames
    x = x[:32]
    y_ref, g_ref = cv_forces_reference(model, x)
    xt = x.reshape(32, 66).T
    yt, gt = F.fused_cv_forces(
        model, xt, tile=32, transposed_input=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(yt.T), np.asarray(y_ref), atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(gt.T), np.asarray(g_ref.reshape(32, 66)), atol=1e-5
    )


def test_cv_forces_remat_tile_guard():
    """ADVICE r2 medium: fused_cv_forces(remat=True, tile!=1024) must hit
    the clear _check_tile error when compiled, not a raw Mosaic lowering
    failure (the remat flag was previously hardcoded False in the
    guard)."""
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()
    x = jnp.asarray(u.atoms.positions[None])
    with pytest.raises(ValueError, match="interleaved-remat"):
        F.fused_cv_forces(model, x, tile=2048, remat=True, interpret=False,
                          mode="unrolled")
