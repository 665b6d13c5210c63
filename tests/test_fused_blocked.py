"""Blocked fused-kernel parity tests (ops/fused_blocked.py).

The blocked formulation keeps the kernel op count O(1) in atoms/features
(edge-matrix matmuls + vectorized per-type math) so 300+-atom systems
compile; these tests pin its numerics against the reference-path model and
the unrolled kernels in interpret mode. Compiled parity on real TPU is
exercised by scripts/tpu_validation.py (artifact committed per round).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.feature import Feature
from molann_tpu.models.ann import (
    AlignmentLayer,
    FeatureLayer,
    PreprocessingANN,
)
from molann_tpu.ops import fused_blocked as FB
from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward, select_mode
from molann_tpu.systems import (
    alanine_histogram_features,
    alanine_model,
    alanine_universe,
    peptide_model,
)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(11)


def frames_for(u, l, rng):
    n = len(u.atoms)
    return jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(l, n, 3)).astype(np.float32)
    )


def blocked_fwd(model, x):
    return fused_model_forward(
        model, x, tile=32, bwd_tile=32, interpret=True, mode="blocked"
    )


@pytest.mark.parametrize("use_angle_value", [False, True])
def test_blocked_forward_matches_model(rng_module, use_angle_value):
    model, u = alanine_model(use_angle_value=use_angle_value)
    x = frames_for(u, 32, rng_module)
    np.testing.assert_allclose(
        np.asarray(blocked_fwd(model, x)), np.asarray(model(x)), atol=5e-6
    )


def test_blocked_gradients_match_model(rng_module):
    model, u = alanine_model()
    x = frames_for(u, 32, rng_module)

    def loss_ref(m, v):
        return jnp.sum(jnp.sin(m(v)))

    def loss_blk(m, v):
        return jnp.sum(jnp.sin(blocked_fwd(m, v)))

    gm_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(model, x)
    gm_b, gx_b = jax.grad(loss_blk, argnums=(0, 1))(model, x)
    scale = np.abs(np.asarray(gx_r)).max()
    np.testing.assert_allclose(
        np.asarray(gx_b), np.asarray(gx_r), atol=5e-5 * scale
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gm_r), jax.tree_util.tree_leaves(gm_b)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4
        )


def test_blocked_peptide_parity(rng_module):
    """A multi-residue peptide (the blocked path's raison d'etre)."""
    model, u = peptide_model(n_residues=6)
    x = frames_for(u, 32, rng_module)
    np.testing.assert_allclose(
        np.asarray(blocked_fwd(model, x)), np.asarray(model(x)), atol=1e-5
    )
    g_r = jax.grad(lambda v: model(v).sum())(x)
    _, g_b = fused_cv_forces(model, x, tile=32, interpret=True, mode="blocked")
    scale = np.abs(np.asarray(g_r)).max()
    np.testing.assert_allclose(
        np.asarray(g_b), np.asarray(g_r), atol=5e-5 * max(scale, 1.0)
    )


def test_blocked_no_mlp_perm_and_component(rng_module):
    """FeatureLayer-only model: the output permutation is applied outside
    the kernel; component selection must address the FINAL column."""
    u = alanine_universe()
    feats = [Feature("p1", "position", u.select_atoms("resid 2"))]
    feats += alanine_histogram_features(u)
    fl = FeatureLayer(feats, u.atoms)
    al = AlignmentLayer(u.select_atoms("bynum 1 2 5"), u.atoms)
    pp = PreprocessingANN(al, fl)
    x = frames_for(u, 32, rng_module)
    np.testing.assert_allclose(
        np.asarray(blocked_fwd(pp, x)), np.asarray(pp(x)), atol=5e-6
    )
    for comp in (0, 5, 30):
        y_b, g_b = fused_cv_forces(
            pp, x, component=comp, tile=32, interpret=True, mode="blocked"
        )
        g_r = jax.grad(lambda v: pp(v)[:, comp].sum())(x)
        np.testing.assert_allclose(
            np.asarray(y_b), np.asarray(pp(x)), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_b), np.asarray(g_r), atol=2e-5
        )


def test_blocked_layout_invariants():
    model, u = peptide_model(n_residues=4)
    spec = model.preprocessing_layer.feature_layer.spec
    lay = FB.blocked_layout(spec, None)
    # all segment offsets sublane-aligned
    for o in (lay.o_r21, lay.o_r23, lay.o_b, lay.o_d12, lay.o_d23,
              lay.o_d34, lay.o_al, lay.o_pos, lay.f_ang, lay.f_b, lay.f_d,
              lay.f_pos, lay.d_pad, lay.m):
        assert o % 8 == 0
    # D exactly representable in bf16 (enables the 3-pass split matmul)
    assert set(np.unique(lay.D)) <= {-1.0, 0.0, 1.0}
    # perm_b is an injection into the padded rows
    assert len(set(lay.perm_b.tolist())) == spec.out_dim
    assert lay.perm_b.max() < lay.d_pad


def test_split3_matmul_is_f32_accurate(rng_module):
    D = np.zeros((16, 24), np.float32)
    idx = rng_module.integers(0, 24, size=(16, 2))
    for r, (a, b) in enumerate(idx):
        D[r, a] += 1.0
        D[r, b] -= 1.0
    x = (100.0 * rng_module.normal(size=(24, 64))).astype(np.float32)
    got = np.asarray(FB._split3_mm(jnp.asarray(D, jnp.bfloat16), jnp.asarray(x)))
    want = D.astype(np.float64) @ x.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=3e-7, atol=1e-4)


def test_auto_tile_lane_aligned():
    model, _ = peptide_model(n_residues=6)
    spec = model.preprocessing_layer.feature_layer.spec
    lay = FB.blocked_layout(spec, None)
    for backward in (False, True):
        t = FB.auto_tile(lay, 2, backward=backward)
        assert t % 128 == 0 and 128 <= t <= 2048


def test_select_mode_dispatch():
    small, _ = alanine_model()
    big, _ = peptide_model(n_residues=30)
    s_spec = small.preprocessing_layer.feature_layer.spec
    b_spec = big.preprocessing_layer.feature_layer.spec
    assert select_mode(s_spec, s_spec.n_input_atoms) == "unrolled"
    assert select_mode(b_spec, b_spec.n_input_atoms) == "blocked"


def test_precision_modes_error_budget(rng_module):
    """Reduced-precision modes stay within their DOCUMENTED budgets
    (docs/design.md): tf32 (2-pass) <= 1e-3 relative on values, bf16
    (1-pass) is loose by design (coordinate differences cancel
    catastrophically when raw coordinates are rounded to 8 mantissa
    bits)."""
    model, u = peptide_model(n_residues=6)
    x = frames_for(u, 32, rng_module)
    kw = dict(tile=32, interpret=True, mode="blocked")
    y_e, g_e = fused_cv_forces(model, x, precision="exact", **kw)
    y_t, g_t = fused_cv_forces(model, x, precision="tf32", **kw)
    rel_y = float(jnp.abs(y_t - y_e).max() / jnp.abs(y_e).max())
    rel_g = float(jnp.abs(g_t - g_e).max() / jnp.abs(g_e).max())
    assert rel_y < 1e-3 and rel_g < 2e-2, (rel_y, rel_g)
    # exact mode really is f32-exact: matches the f32 XLA model path
    y_r = np.asarray(model(x))
    np.testing.assert_allclose(np.asarray(y_e), y_r, atol=1e-5)
    # bf16 runs and stays finite (budget documented as loose)
    y_b, g_b = fused_cv_forces(model, x, precision="bf16", **kw)
    assert bool(jnp.isfinite(y_b).all() and jnp.isfinite(g_b).all())


def test_blocked_layout_conversions(rng_module):
    """All four input layouts give identical results; gradients come back
    in the input's layout."""
    model, u = alanine_model()
    l, n = 32, 22
    x = np.asarray(frames_for(u, l, rng_module))
    kw = dict(tile=32, interpret=True, mode="blocked")
    y0, g0 = fused_cv_forces(model, jnp.asarray(x), **kw)
    assert g0.shape == (l, n, 3)
    # packed [l, 3n]
    y1, g1 = fused_cv_forces(model, jnp.asarray(x.reshape(l, 3 * n)), **kw)
    assert g1.shape == (l, 3 * n)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1).reshape(l, n, 3), np.asarray(g0), atol=1e-6
    )
    # transposed [3n, l]
    y2, g2 = fused_cv_forces(
        model, jnp.asarray(x.reshape(l, 3 * n).T), transposed_input=True, **kw
    )
    assert y2.shape[1] == l and g2.shape == (3 * n, l)
    np.testing.assert_allclose(np.asarray(y2).T, np.asarray(y0), atol=1e-6)
    # component-major [3, n, l]
    xc = jnp.asarray(np.transpose(x, (2, 1, 0)))
    y3, g3 = fused_cv_forces(model, xc, **kw)
    assert g3.shape == (3, n, l)
    np.testing.assert_allclose(np.asarray(y3).T, np.asarray(y0), atol=1e-6)
    np.testing.assert_allclose(
        np.transpose(np.asarray(g3), (2, 1, 0)), np.asarray(g0), atol=1e-6
    )


def test_active_atom_compaction_large_sparse_system(rng_module):
    """A large universe with a small feature set runs the blocked kernel on
    the ACTIVE atoms only (kernel cost scales with the feature set, not the
    system), with full-width gradients: zero on untouched atoms, parity on
    touched ones."""
    from molann_tpu.systems import synthetic_peptide

    u = synthetic_peptide(40)  # 200 atoms
    n = len(u.atoms)
    sel = lambda name, resid: u.select_atoms(f"name {name} and resid {resid}")
    feats = [
        Feature("b1", "bond", sel("CA", 3) + sel("CA", 17)),
        Feature("a1", "angle", sel("N", 9) + sel("CA", 9) + sel("C", 9)),
        Feature(
            "d1", "dihedral",
            sel("C", 24) + sel("N", 25) + sel("CA", 25) + sel("C", 25),
        ),
        Feature("p1", "position", sel("CA", 30) + sel("CA", 31)),
    ]
    align = AlignmentLayer(u.select_atoms("name CA and resid 1:5"), u.atoms)
    pp = PreprocessingANN(align, FeatureLayer(feats, u.atoms))
    from molann_tpu.models.ann import MolANN, create_sequential_nn

    model = MolANN(pp, create_sequential_nn(
        [pp.output_dimension(), 8, 2], key=jax.random.PRNGKey(3)))

    # the compiled layout really is compact
    from molann_tpu.ops.fused import _extract_model
    spec, align_idx, _, _, _ = _extract_model(model, jnp.float32)
    lay = FB.blocked_layout(spec, align_idx)
    assert lay.active_idx is not None
    assert lay.n_active < n // 4  # 200-atom system, ~18 active atoms

    x = frames_for(u, 16, rng_module)
    y_blk = blocked_fwd(model, x)
    np.testing.assert_allclose(
        np.asarray(y_blk), np.asarray(model(x)), atol=5e-6
    )

    # cv+forces: gradients land on active atoms only, exact zeros elsewhere
    y_cv, gx = fused_cv_forces(model, x, tile=32, interpret=True,
                               mode="blocked")
    gx_ref = jax.grad(lambda v: jnp.sum(model(v)))(x)
    scale = np.abs(np.asarray(gx_ref)).max()
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), atol=5e-5 * scale
    )
    inactive = np.setdiff1d(np.arange(n), lay.active_idx)
    assert np.all(np.asarray(gx)[:, inactive, :] == 0.0)

    # blocked_apply autodiff path (separate fwd/bwd kernels) agrees too
    def loss_blk(v):
        return jnp.sum(jnp.sin(blocked_fwd(model, v)))

    def loss_ref(v):
        return jnp.sum(jnp.sin(model(v)))

    gb = jax.grad(loss_blk)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(
        np.asarray(gb), np.asarray(gr), atol=5e-5 * scale
    )


def test_compact_grads_serving_shape(rng_module):
    """compact_grads returns gradients on the active rows only, matching
    the full-width gradient gathered at active_atom_indices."""
    from molann_tpu.ops.fused import active_atom_indices
    from molann_tpu.systems import synthetic_peptide

    u = synthetic_peptide(20)  # 100 atoms
    sel = lambda name, resid: u.select_atoms(f"name {name} and resid {resid}")
    feats = [
        Feature("b", "bond", sel("CA", 2) + sel("CA", 12)),
        Feature(
            "d", "dihedral",
            sel("C", 5) + sel("N", 6) + sel("CA", 6) + sel("C", 6),
        ),
    ]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    from molann_tpu.models.ann import MolANN, create_sequential_nn

    model = MolANN(pp, create_sequential_nn(
        [pp.output_dimension(), 4, 1], key=jax.random.PRNGKey(7)))
    active = active_atom_indices(model)
    assert active is not None and len(active) == 6

    x = frames_for(u, 16, rng_module)
    kw = dict(tile=32, interpret=True, mode="blocked")
    y_full, g_full = fused_cv_forces(model, x, **kw)
    y_c, g_c = fused_cv_forces(model, x, compact_grads=True, **kw)
    assert g_c.shape == (3, len(active), 16)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_full), atol=1e-6)
    # compact rows == full-width gradient gathered at the active indices
    g_gathered = np.transpose(np.asarray(g_full), (2, 1, 0))[:, active, :]
    np.testing.assert_allclose(np.asarray(g_c), g_gathered, atol=1e-6)
    # unrolled mode refuses rather than silently returning full width
    small_model, su = alanine_model()
    with pytest.raises(ValueError):
        fused_cv_forces(small_model, frames_for(su, 8, rng_module),
                        compact_grads=True, tile=32, interpret=True,
                        mode="auto")


def test_auto_tile_rejects_oversized_working_set():
    """A dense feature set on thousands of atoms overflows VMEM; auto_tile
    must say so clearly instead of letting Mosaic OOM opaquely."""
    from molann_tpu.spec import compile_features
    from molann_tpu.systems import synthetic_peptide

    u = synthetic_peptide(500)  # 2500 atoms
    feats = [Feature("p", "position", u.atoms)]  # dense: every atom active
    spec = compile_features(feats, u.atoms.ix, False)
    lay = FB.blocked_layout(spec, None)
    with pytest.raises(ValueError, match="edge matrix"):
        FB.auto_tile(lay, 4, backward=False)
