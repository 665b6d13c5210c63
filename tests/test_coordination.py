"""Coordination-number features (extension beyond the reference feature
set): switching-function math vs numpy oracles, validation, layer/perm
integration, fused-kernel parity (unrolled AND blocked formulations),
serialization, file grammar, and periodic-box minimum-image distances."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molann_tpu import (
    Feature,
    FeatureFileReader,
    FeatureLayer,
    FeatureMap,
    MolANN,
    PreprocessingANN,
    create_sequential_nn,
)
from molann_tpu.ops.features import switching_function
from molann_tpu.systems import alanine_universe


@pytest.fixture(scope="module")
def u():
    return alanine_universe()


@pytest.fixture(scope="module")
def groups(u):
    return u.select_atoms("bynum 2 5 9"), u.select_atoms("bynum 15 17 19")


def oracle(xf, a, b, r0, nn, mm):
    """Plain-python pair sum (0-based index lists; b=None = within-a)."""
    pairs = ([(i, j) for i in a for j in b] if b else
             [(a[i], a[j]) for i in range(len(a))
              for j in range(i + 1, len(a))])
    s = 0.0
    for i, j in pairs:
        t = np.linalg.norm(xf[i] - xf[j]) / r0
        s += (1 - t**nn) / (1 - t**mm)
    return s


# ------------------------------------------------------------ validation


def test_validation(u, groups):
    ag_a, ag_b = groups
    with pytest.raises(ValueError, match="r0 > 0"):
        Feature("c", "coordination", ag_a, group_b=ag_b)
    with pytest.raises(ValueError, match="r0 > 0"):
        Feature("c", "coordination", ag_a, group_b=ag_b, r0=-1.0)
    with pytest.raises(ValueError, match="mm > nn"):
        Feature("c", "coordination", ag_a, r0=3.0, nn=6, mm=6)
    with pytest.raises(ValueError, match="at least 2 atoms"):
        Feature("c", "coordination", u.select_atoms("bynum 2"), r0=3.0)
    with pytest.raises(ValueError, match="group_b is empty"):
        Feature("c", "coordination", ag_a,
                group_b=u.select_atoms("bynum 99999"), r0=3.0)
    # overlapping groups hit the reference's duplicate-atom check
    with pytest.raises(IndexError, match="repeated"):
        Feature("c", "coordination", ag_a,
                group_b=u.select_atoms("bynum 5 15"), r0=3.0)
    # an empty group A (typo'd selector) must fail loudly, not build a
    # zero-pair feature that is constant-0 on one path and crashes another
    with pytest.raises(ValueError, match="group A is empty"):
        Feature("c", "coordination", u.select_atoms("bynum 99999"),
                group_b=ag_b, r0=3.0)
    # coordination kwargs on reference types are rejected — ALL of them,
    # matching the error message's promise
    with pytest.raises(ValueError, match="coordination-feature parameters"):
        Feature("b", "bond", u.select_atoms("bynum 2 5"), r0=3.0)
    with pytest.raises(ValueError, match="coordination-feature parameters"):
        Feature("b", "bond", u.select_atoms("bynum 2 5"), nn=6)
    with pytest.raises(ValueError, match="coordination-feature parameters"):
        Feature("b", "bond", u.select_atoms("bynum 2 5"), mm=8)
    # reference validation unchanged
    with pytest.raises(NotImplementedError):
        Feature("x", "contact", ag_a)


def test_params_and_info(u, groups):
    ag_a, ag_b = groups
    c = Feature("c1", "coordination", ag_a, group_b=ag_b, r0=3.0)
    assert c.get_type_id() == 4
    assert c.get_coordination_params() == (3, 3.0, 6, 12)  # mm = 2*nn
    assert c.get_atom_indices().tolist() == [2, 5, 9, 15, 17, 19]
    info = c.get_feature_info()
    assert info["type"][0] == "coordination" and info["type_id"][0] == 4
    assert "r0=3" in repr(c)
    with pytest.raises(ValueError, match="no coordination params"):
        Feature("b", "bond", u.select_atoms("bynum 2 5")) \
            .get_coordination_params()


# ------------------------------------------------------------ the math


def test_values_against_oracle(u, groups, rng):
    ag_a, ag_b = groups
    feats = [
        Feature("cab", "coordination", ag_a, group_b=ag_b, r0=3.0),
        Feature("cself", "coordination", ag_a, r0=4.0, nn=4, mm=10),
    ]
    fl = FeatureLayer(feats, u.atoms)
    assert fl.output_dimension() == 2
    x = (u.atoms.positions[None]
         + 0.3 * rng.normal(size=(6, 22, 3))).astype(np.float32)
    y = np.asarray(fl(jnp.asarray(x)))
    a = [1, 4, 8]
    b = [14, 16, 18]
    for f in range(x.shape[0]):
        assert y[f, 0] == pytest.approx(
            oracle(np.float64(x[f]), a, b, 3.0, 6, 12), rel=1e-5)
        assert y[f, 1] == pytest.approx(
            oracle(np.float64(x[f]), a, None, 4.0, 4, 10), rel=1e-5)


def test_switching_function_r0_crossing():
    # mm = 2*nn closed form: exactly nn/mm-smooth at r = r0
    v = float(switching_function(jnp.float32(3.0), 3.0, 6, 12))
    assert v == pytest.approx(0.5)
    # general path: guarded 0/0 gives the analytic limit nn/mm
    v = float(switching_function(jnp.float32(4.0), 4.0, 4, 10))
    assert v == pytest.approx(0.4)
    # and the gradient is finite through the window
    g = jax.grad(lambda r: switching_function(r, 4.0, 4, 10))(
        jnp.float32(4.0 + 1e-9))
    assert np.isfinite(float(g))
    # decays: ~1 well inside, ~0 well outside
    assert float(switching_function(jnp.float32(0.5), 3.0, 6, 12)) > 0.99
    assert float(switching_function(jnp.float32(12.0), 3.0, 6, 12)) < 0.01
    # non-positive exponents are a clear error, not a deep TypeError
    for nn, mm in ((0, 0), (0, 6), (6, 0), (-2, 4)):
        with pytest.raises(ValueError, match="positive"):
            switching_function(jnp.float32(1.0), 3.0, nn, mm)


def test_rigid_motion_invariance(u, groups, rng):
    ag_a, ag_b = groups
    fl = FeatureLayer(
        [Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0)], u.atoms)
    x = (u.atoms.positions[None]
         + 0.1 * rng.normal(size=(4, 22, 3))).astype(np.float32)
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    moved = x @ rot.T + np.float32([5.0, -3.0, 2.0])
    np.testing.assert_allclose(np.asarray(fl(jnp.asarray(moved))),
                               np.asarray(fl(jnp.asarray(x))),
                               atol=2e-5)


def test_gradient_locality_and_values(u, groups, rng):
    ag_a, ag_b = groups
    fl = FeatureLayer(
        [Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0)], u.atoms)
    x = jnp.asarray((u.atoms.positions[None]
                     + 0.2 * rng.normal(size=(1, 22, 3))).astype(np.float32))
    g = np.asarray(jax.grad(lambda xx: jnp.sum(fl(xx)))(x))[0]
    touched = {1, 4, 8, 14, 16, 18}
    for atom in range(22):
        nz = np.abs(g[atom]).max() > 0
        assert nz == (atom in touched)
    # finite-difference check on one participating coordinate
    eps = 1e-3
    xp = np.asarray(x).copy()
    xp[0, 4, 1] += eps
    xm = np.asarray(x).copy()
    xm[0, 4, 1] -= eps
    fd = (float(jnp.sum(fl(jnp.asarray(xp))))
          - float(jnp.sum(fl(jnp.asarray(xm))))) / (2 * eps)
    assert g[4, 1] == pytest.approx(fd, rel=2e-3)


# ------------------------------------------------- layers / column order


def test_feature_map_and_column_order(u, groups, rng):
    ag_a, ag_b = groups
    c = Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0)
    fm = FeatureMap(c, u.atoms)
    assert fm.dim() == 1
    x = jnp.asarray((u.atoms.positions[None]).astype(np.float32))
    assert fm(x).shape == (1, 1)
    # mixed list: coordination interleaved between reference types keeps
    # feature-list column order (the perm path)
    feats = [
        Feature("b1", "bond", u.select_atoms("bynum 2 5")),
        c,
        Feature("d1", "dihedral", u.select_atoms("bynum 5")
                + u.select_atoms("bynum 7") + u.select_atoms("bynum 9")
                + u.select_atoms("bynum 15")),
    ]
    fl = FeatureLayer(feats, u.atoms)
    assert fl.output_dimension() == 4  # 1 + 1 + 2
    xr = jnp.asarray((u.atoms.positions[None]
                      + 0.1 * rng.normal(size=(3, 22, 3))).astype(np.float32))
    y = np.asarray(fl(xr))
    np.testing.assert_allclose(
        y[:, 0:1], np.asarray(FeatureMap(feats[0], u.atoms)(xr)), atol=1e-6)
    np.testing.assert_allclose(
        y[:, 1:2], np.asarray(fm(xr)), atol=1e-6)
    np.testing.assert_allclose(
        y[:, 2:4], np.asarray(FeatureMap(feats[2], u.atoms)(xr)), atol=1e-6)


# --------------------------------------------------------- fused kernels


@pytest.fixture(scope="module")
def coord_model(u, groups):
    ag_a, ag_b = groups
    feats = [
        Feature("b1", "bond", u.select_atoms("bynum 2 5")),
        Feature("c1", "coordination", ag_a, group_b=ag_b, r0=3.0),
        Feature("c2", "coordination", ag_a, r0=4.0, nn=4, mm=10),
    ]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    return MolANN(pp, create_sequential_nn(
        [3, 5, 2], key=jax.random.PRNGKey(0)))


def test_fused_kernels_match_jnp(u, coord_model, rng):
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward

    m = coord_model
    x = jnp.asarray((u.atoms.positions[None]
                     + 0.2 * rng.normal(size=(8, 22, 3))).astype(np.float32))
    yk = fused_model_forward(m, x, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(m(x)),
                               atol=2e-6)
    yv, g = fused_cv_forces(m, x, tile=8, interpret=True)
    gj = jax.grad(lambda xx: jnp.sum(m(xx)))(x)
    np.testing.assert_allclose(np.asarray(g).reshape(x.shape),
                               np.asarray(gj), atol=2e-6)


def test_fused_train_grads_match_jnp(u, coord_model, rng):
    from molann_tpu.ops.fused import fused_train_grads

    m = coord_model
    x = jnp.asarray((u.atoms.positions[None]
                     + 0.2 * rng.normal(size=(8, 22, 3))).astype(np.float32))
    y_t = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
    loss_k, grads_k = fused_train_grads(m, x, y_t, tile=8, interpret=True)

    def loss_fn(mm):
        # the library's MSE convention: mean over ALL elements
        return jnp.mean((mm(x) - y_t) ** 2)

    loss_j, grads_j = jax.value_and_grad(loss_fn)(m)
    assert float(loss_k) == pytest.approx(float(loss_j), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_k),
                    jax.tree_util.tree_leaves(grads_j)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)


def test_mode_selection(u, coord_model):
    from molann_tpu.ops.fused import (
        active_atom_indices,
        model_select_mode,
        select_mode,
    )

    # small system, small pair count: unrolled wins
    assert model_select_mode(coord_model) == "unrolled"
    # active set: the 7 touched atoms of 22 (> n/4 -> full-width None)
    assert active_atom_indices(coord_model) is None
    # a large pair list blows the unrolled op count -> blocked
    from molann_tpu.spec import compile_features
    from molann_tpu.systems import synthetic_peptide

    up = synthetic_peptide(10)  # 50 atoms
    ca = up.select_atoms("name CA")  # 10 atoms within-A: 45 pairs
    big = Feature("cbig", "coordination", up.select_atoms("name CA or name N"),
                  r0=6.0)  # 20 atoms -> 190 pairs
    spec = compile_features([big], up.atoms.ix, False)
    assert select_mode(spec, len(up.atoms)) == "blocked"
    small = Feature("csmall", "coordination", ca, r0=6.0)
    spec_s = compile_features([small], up.atoms.ix, False)
    assert select_mode(spec_s, len(up.atoms)) == "unrolled"


def test_blocked_matches_jnp(u, coord_model, rng):
    """Coordination features through the blocked edge-matrix kernels:
    forward, coordinate gradients, and parameter gradients all match the
    XLA path (pair differences are edge rows; switching sums are
    per-feature tile reductions)."""
    from molann_tpu.ops.fused import (
        fused_cv_forces,
        fused_model_forward,
        fused_train_grads,
    )

    m = coord_model
    x = jnp.asarray((u.atoms.positions[None]
                     + 0.2 * rng.normal(size=(8, 22, 3))).astype(np.float32))
    yk = fused_model_forward(m, x, tile=32, interpret=True, mode="blocked")
    np.testing.assert_allclose(np.asarray(yk), np.asarray(m(x)), atol=5e-6)
    yv, g = fused_cv_forces(m, x, tile=32, interpret=True, mode="blocked")
    gj = jax.grad(lambda xx: jnp.sum(m(xx)))(x)
    np.testing.assert_allclose(np.asarray(yv), np.asarray(m(x)), atol=5e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj), atol=5e-6)

    # single-kernel training grads
    y_t = jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32))
    loss_b, grads_b = fused_train_grads(
        m, x, y_t, tile=32, interpret=True, mode="blocked",
        precision="exact")

    def loss_fn(mm):
        return jnp.mean((mm(x) - y_t) ** 2)

    loss_j, grads_j = jax.value_and_grad(loss_fn)(m)
    assert float(loss_b) == pytest.approx(float(loss_j), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_b),
                    jax.tree_util.tree_leaves(grads_j)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_blocked_feature_layer_only_with_box(u, groups, rng):
    """Blocked kernels on a FeatureLayer-only model whose coordination
    features carry a static pbc_box (minimum-image pair distances) plus a
    perm-exercising mixed feature list."""
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward

    ag_a, ag_b = groups
    feats = [
        Feature("c1", "coordination", ag_a, group_b=ag_b, r0=3.0,
                pbc_box=[7.0, 8.0, 9.0]),
        Feature("b1", "bond", u.select_atoms("bynum 2 5")),
        Feature("c2", "coordination", ag_a, r0=4.0, nn=4, mm=10),
    ]
    fl = FeatureLayer(feats, u.atoms)
    pp = PreprocessingANN(None, fl)
    x = jnp.asarray((u.atoms.positions[None]
                     + 2.0 * rng.normal(size=(8, 22, 3))).astype(np.float32))
    y_b = fused_model_forward(pp, x, tile=32, interpret=True, mode="blocked")
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(pp(x)), atol=5e-6)
    yv, g = fused_cv_forces(pp, x, tile=32, interpret=True, mode="blocked",
                            component=0)
    gj = jax.grad(lambda xx: jnp.sum(pp(xx)[:, 0]))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj), atol=5e-6)


def test_blocked_large_pair_count_parity(rng):
    """The case the blocked formulation exists for: a pair list far past
    the unrolled envelope still matches the XLA path."""
    from molann_tpu.models.ann import FeatureLayer as FL
    from molann_tpu.ops.fused import (
        fused_cv_forces,
        fused_model_forward,
        model_select_mode,
    )
    from molann_tpu.systems import synthetic_peptide

    up = synthetic_peptide(8)  # 40 atoms
    heavy = up.select_atoms("name CA or name N or name C")  # 24 atoms
    feats = [
        Feature("cbig", "coordination", heavy, r0=5.0),  # 276 pairs
        Feature("b", "bond", up.select_atoms("name CA and resid 1")
                + up.select_atoms("name CA and resid 8")),
    ]
    pp = PreprocessingANN(None, FL(feats, up.atoms))
    assert model_select_mode(pp) == "blocked"
    x = jnp.asarray((up.atoms.positions[None]
                     + 0.3 * rng.normal(size=(4, 40, 3))).astype(np.float32))
    y_b = fused_model_forward(pp, x, tile=32, interpret=True, mode="auto")
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(pp(x)),
                               rtol=2e-5, atol=2e-5)
    yv, g = fused_cv_forces(pp, x, tile=32, interpret=True, mode="auto")
    gj = jax.grad(lambda xx: jnp.sum(pp(xx)))(x)
    scale = np.abs(np.asarray(gj)).max()
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj),
                               atol=5e-5 * max(scale, 1.0))


# ------------------------------------------------- persistence / interop


def test_save_load_roundtrip(u, coord_model, rng, tmp_path):
    from molann_tpu.io import load_model, save_model

    x = jnp.asarray((u.atoms.positions[None]
                     + 0.2 * rng.normal(size=(4, 22, 3))).astype(np.float32))
    path = tmp_path / "coord_model.npz"
    save_model(path, coord_model)
    back = load_model(path)
    np.testing.assert_allclose(np.asarray(back(x)),
                               np.asarray(coord_model(x)), atol=1e-6)
    # the reloaded spec carries the pair tables
    spec = back.preprocessing_layer.feature_layer._spec
    assert spec.n_coordinations == 2
    assert spec.coord_params[0] == (3.0, 6, 12)


def test_torch_export_rejected(coord_model):
    torch = pytest.importorskip("torch")  # noqa: F841
    from molann_tpu.io.torch_export import export_torchscript

    with pytest.raises(ValueError, match="no counterpart"):
        export_torchscript(coord_model, "/tmp/never_written.pt")


# ------------------------------------------------------------ the file


def test_feature_file_grammar(u, tmp_path):
    path = tmp_path / "features.txt"
    path.write_text(
        "[Output]\n"
        "b1, bond, bynum 2 5\n"
        "c1, coordination[r0=3.0], bynum 2 5 9, bynum 15 17 19\n"
        "c2, coordination[r0=4.0 n=4 m=10], bynum 2 5 9\n"
        "[End]\n"
    )
    feats = FeatureFileReader(str(path), "Output", u).read()
    assert [f.get_name() for f in feats] == ["b1", "c1", "c2"]
    assert feats[1].get_coordination_params() == (3, 3.0, 6, 12)
    assert feats[2].get_coordination_params() == (3, 4.0, 4, 10)
    # group A = first selector only; B = the rest
    assert feats[1].get_atom_indices().tolist() == [2, 5, 9, 15, 17, 19]

    bad = tmp_path / "bad.txt"
    for line, err in [
        ("c, coordination, bynum 2 5", "need parameters"),
        ("c, coordination[q=1], bynum 2 5", "unknown coordination"),
        ("c, coordination[r0], bynum 2 5", "key=value"),
        ("c, coordination[n=6], bynum 2 5", "include r0"),
        ("c, coordination[r0=3.0]", "at least one selector"),
    ]:
        bad.write_text(f"[Output]\n{line}\n[End]\n")
        with pytest.raises(ValueError, match=err):
            FeatureFileReader(str(bad), "Output", u).read()


# ------------------------------------------------------- periodic boxes


def pbc_oracle(xf, a, b, r0, nn, mm, box_diag):
    s = 0.0
    for i in a:
        for j in b:
            d = xf[j] - xf[i]
            d -= np.round(d / box_diag) * box_diag
            t = np.linalg.norm(d) / r0
            s += (1 - t**nn) / (1 - t**mm)
    return s


def test_pbc_box_validation(u, groups):
    ag_a, ag_b = groups
    with pytest.raises(ValueError, match="3 lengths or a"):
        Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0,
                pbc_box=[8.0, 8.0])
    with pytest.raises(ValueError, match="diagonal must be positive"):
        Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0,
                pbc_box=[8.0, -8.0, 8.0])
    with pytest.raises(ValueError, match="lower-triangular"):
        Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0,
                pbc_box=[[8, 1, 0], [0, 8, 0], [0, 0, 8]])
    with pytest.raises(ValueError, match="coordination-feature"):
        Feature("b", "bond", u.select_atoms("bynum 2 5"),
                pbc_box=[8, 8, 8])
    c = Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0,
                pbc_box=[8.0, 9.0, 10.0])
    assert c.pbc_box[1][1] == 9.0
    assert "box=(8, 9, 10)" in repr(c)


def test_pbc_minimum_image_values(u, groups, rng):
    ag_a, ag_b = groups
    box = np.array([8.0, 8.0, 8.0])
    fl = FeatureLayer(
        [Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0,
                 pbc_box=box)], u.atoms)
    # shift group B by one lattice vector: with PBC the count must be
    # unchanged; without, the contacts vanish
    x0 = u.atoms.positions.astype(np.float32)
    shifted = x0.copy()
    shifted[[14, 16, 18]] += np.float32([8.0, 0.0, 0.0])
    xb = jnp.asarray(np.stack([x0, shifted]))
    y = np.asarray(fl(xb))
    assert y[0, 0] == pytest.approx(y[1, 0], rel=1e-5)
    nopbc = FeatureLayer(
        [Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0)],
        u.atoms)
    y2 = np.asarray(nopbc(xb))
    assert y2[1, 0] < 0.5 * y2[0, 0]
    # random frames against the numpy minimum-image oracle
    xr = (x0[None] + 3.0 * rng.normal(size=(5, 22, 3))).astype(np.float32)
    yr = np.asarray(fl(jnp.asarray(xr)))
    for f in range(5):
        assert yr[f, 0] == pytest.approx(
            pbc_oracle(np.float64(xr[f]), [1, 4, 8], [14, 16, 18],
                       3.0, 6, 12, box), rel=1e-4)


def test_pbc_fused_kernel_parity(u, groups, rng):
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward

    ag_a, ag_b = groups
    feats = [
        Feature("c", "coordination", ag_a, group_b=ag_b, r0=3.0,
                pbc_box=[8.0, 8.0, 8.0]),
        Feature("b1", "bond", u.select_atoms("bynum 2 5")),
    ]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    m = MolANN(pp, create_sequential_nn([2, 4, 1],
                                        key=jax.random.PRNGKey(1)))
    x = jnp.asarray((u.atoms.positions[None]
                     + 2.0 * rng.normal(size=(8, 22, 3))).astype(np.float32))
    yk = fused_model_forward(m, x, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(m(x)), atol=2e-6)
    yv, g = fused_cv_forces(m, x, tile=8, interpret=True)
    gj = jax.grad(lambda xx: jnp.sum(m(xx)))(x)
    np.testing.assert_allclose(np.asarray(g).reshape(x.shape),
                               np.asarray(gj), atol=2e-6)


def test_pbc_file_grammar_and_roundtrip(u, tmp_path, rng):
    from molann_tpu.io import load_model, save_model

    path = tmp_path / "features.txt"
    path.write_text(
        "[Output]\n"
        "c1, coordination[r0=3.0 box=8:9:10], bynum 2 5 9, bynum 15 17\n"
        "[End]\n"
    )
    feats = FeatureFileReader(str(path), "Output", u).read()
    assert feats[0].pbc_box == ((8.0, 0.0, 0.0), (0.0, 9.0, 0.0),
                                (0.0, 0.0, 10.0))
    bad = tmp_path / "bad.txt"
    bad.write_text("[Output]\nc, coordination[r0=3 box=8x8x8], bynum 2 5\n"
                   "[End]\n")
    with pytest.raises(ValueError, match="box=lx:ly:lz"):
        FeatureFileReader(str(bad), "Output", u).read()

    m = MolANN(
        PreprocessingANN(None, FeatureLayer(feats, u.atoms)),
        create_sequential_nn([1, 3, 1], key=jax.random.PRNGKey(2)))
    x = jnp.asarray((u.atoms.positions[None]
                     + 2.0 * rng.normal(size=(3, 22, 3))).astype(np.float32))
    out = tmp_path / "m.npz"
    save_model(out, m)
    back = load_model(out)
    np.testing.assert_allclose(np.asarray(back(x)), np.asarray(m(x)),
                               atol=1e-6)
    spec = back.preprocessing_layer.feature_layer._spec
    assert spec.coord_boxes[0][2][2] == 10.0
