"""Built-in example systems: alanine flagship + synthetic peptide scaling."""

import jax
import jax.numpy as jnp
import numpy as np

from molann_tpu.systems import (
    alanine_model,
    alanine_universe,
    peptide_backbone_features,
    peptide_model,
    synthetic_peptide,
)


def test_alanine_model_shapes(rng):
    model, u = alanine_model()
    pp = model.get_preprocessing_layer()
    # p1 position (10 atoms -> 30) + 2 dihedrals (4) + 2 bonds + 2 angles
    assert pp.output_dimension() == 38
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(4, 22, 3)).astype(np.float32)
    )
    assert model(x).shape == (4, 3)


def test_synthetic_peptide_topology():
    u = synthetic_peptide(10)
    assert u.n_atoms == 50
    assert len(u.select_atoms("name CA")) == 10
    assert len(u.select_atoms("resid 3")) == 5
    feats = peptide_backbone_features(u)
    # per residue: angle; plus phi+dCA for r>first, psi for r<last
    assert len(feats) == 10 + 9 + 9 + 9


def test_peptide_model_forward_and_grad(rng):
    model, u = peptide_model(6)
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.02 * rng.normal(size=(8, u.n_atoms, 3)).astype(np.float32)
    )
    y = jax.jit(lambda m, v: m(v))(model, x)
    assert y.shape == (8, 2)
    g = jax.grad(lambda v: jnp.sum(model(v)))(x)
    assert bool(jnp.isfinite(g).all())


def test_peptide_scaling_compiles():
    """A 300-atom / ~240-feature system stays cheap to build and compile
    (static-spec unrolling must not blow up trace time)."""
    model, u = peptide_model(60)
    assert u.n_atoms == 300
    x = jnp.asarray(u.atoms.positions[None])
    y = jax.jit(lambda m, v: m(v))(model, x)
    assert y.shape == (1, 2)


def test_peptide_fused_tile_math(rng):
    """Fused tile math matches the jnp path on the bigger system."""
    from molann_tpu.ops import fused as F

    model, u = peptide_model(6)
    n = u.n_atoms
    l = 16
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.02 * rng.normal(size=(l, n, 3)).astype(np.float32)
    )
    spec = model.preprocessing_layer.feature_layer.spec
    align_layer = model.preprocessing_layer.align_layer
    params = tuple(
        (w.T, b.reshape(-1, 1)) for (w, b) in model.ann_layers.params
    )
    xt = x.reshape(l, 3 * n).T.reshape(3 * n, F._sub_for(l), l // F._sub_for(l))
    atoms = [(xt[3 * a], xt[3 * a + 1], xt[3 * a + 2]) for a in range(n)]
    tensors = [align_layer.ref_x.reshape(-1, 1)]
    for (w, b) in params:
        tensors.extend([w, b])
    rows = F._forward_tiles(
        atoms, tensors, spec,
        tuple(align_layer._local_align_atom_indices), jnp.tanh,
    )
    y_tiles = jnp.concatenate([r.reshape(1, l) for r in rows], axis=0).T
    np.testing.assert_allclose(
        np.asarray(y_tiles), np.asarray(model(x)), atol=1e-5
    )
