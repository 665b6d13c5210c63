"""Cutoff-culled coordination pairs (VERDICT r3 weak #2 / ask #2).

The cell list is a build-time accelerator only — every test here pins
the culled result to the exact brute-force distance filter over the
all-pairs table, then checks the culled spec/model stays within its
documented ``n_culled × tol`` error bound against the all-pairs
evaluation on the LJ demo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.ops.neighbor import (CullReport, cull_model, cull_spec,
                                     max_displacement, neighbor_pairs,
                                     switching_cutoff)
from molann_tpu.spec import coordination_pair_list


def _switch(r, r0, nn, mm):
    y = r / r0
    return (1 - y**nn) / (1 - y**mm)


def test_switching_cutoff_bisection():
    for r0, nn, mm, tol in [(1.0, 6, 12, 1e-6), (2.3, 4, 8, 1e-4),
                            (0.5, 6, 10, 1e-8)]:
        rc = switching_cutoff(r0, nn, mm, tol)
        assert rc > r0
        assert _switch(rc * 1.0000001, r0, nn, mm) <= tol
        assert _switch(rc * 0.999, r0, nn, mm) > tol


def _brute(pos, a, b, r_cut, box):
    from molann_tpu.ops.neighbor import _min_image

    keep = []
    for (i, j) in coordination_pair_list(list(a), list(b)):
        d = (pos[j] - pos[i])[None].astype(np.float64).copy()
        if box is not None:
            d = _min_image(d, box)
        if (d * d).sum() <= r_cut * r_cut:
            keep.append((i, j))
    return keep


@pytest.mark.parametrize("boxed", [False, True])
@pytest.mark.parametrize("cross", [False, True])
def test_neighbor_pairs_match_brute_force(rng, boxed, cross):
    n = 90
    L = 9.0
    pos = (L * rng.uniform(size=(n, 3))).astype(np.float32)
    box = np.diag([L, L, L]) if boxed else None
    if cross:
        a, b = list(range(0, 40)), list(range(40, n))
    else:
        a, b = list(range(n)), []
    for r_cut in (1.5, 2.8):
        got = neighbor_pairs(pos, a, b, r_cut=r_cut, box=box)
        assert got == _brute(pos, a, b, r_cut, box)
        # and it actually culled something / kept something
        assert 0 < len(got) < len(coordination_pair_list(a, b))


def test_neighbor_pairs_triclinic_fallback(rng):
    n = 40
    box = np.array([[8.0, 0, 0], [2.0, 7.0, 0], [1.0, 1.5, 9.0]])
    pos = (rng.uniform(size=(n, 3)) @ box).astype(np.float32)
    got = neighbor_pairs(pos, list(range(n)), r_cut=2.5, box=box)
    assert got == _brute(pos, list(range(n)), [], 2.5, box)


def test_neighbor_pairs_tiny_periodic_box_falls_back(rng):
    # fewer than 3 cells along an axis -> exact filter, same answer
    n = 20
    L = 3.0
    pos = (L * rng.uniform(size=(n, 3))).astype(np.float32)
    box = np.diag([L, L, L])
    got = neighbor_pairs(pos, list(range(n)), r_cut=1.4, box=box)
    assert got == _brute(pos, list(range(n)), [], 1.4, box)


@pytest.fixture(scope="module")
def lj():
    from molann_tpu.systems import lj_fluid_model

    return lj_fluid_model(5)


def test_cull_spec_parity_within_bound(lj, rng):
    """Culled spec vs all-pairs spec on the LJ demo (d_max-truncated
    shells, the PLUMED-standard finite-ranged form): outputs agree to
    f32 sum-order noise — the cull is EXACT for d_max features — and
    the report says so."""
    from molann_tpu.ops.features import apply_compiled_features

    model, u, box = lj
    spec = model.preprocessing_layer.feature_layer.spec
    ref = u.atoms.positions
    x = jnp.asarray(ref[None]
                    + 0.15 * rng.normal(size=(8,) + ref.shape)
                    ).astype(jnp.float32)
    # skin sized to the batch: every frame inside the validity window
    md = max_displacement(ref, np.asarray(x))
    culled, report = cull_spec(spec, ref, tol=1e-6, skin=2 * md + 0.05)
    n_before = sum(n for _, n in spec.coord_slices)
    n_after = sum(n for _, n in culled.coord_slices)
    assert n_after < n_before
    assert report.exact == (True, True)
    assert report.error_bound == (0.0, 0.0)
    assert report.n_pairs_before == tuple(
        n for _, n in spec.coord_slices)
    assert "exact" in str(report)
    full = np.asarray(apply_compiled_features(spec, x))
    part = np.asarray(apply_compiled_features(culled, x))
    np.testing.assert_allclose(part, full, atol=5e-4)  # f32 sum order


def test_cull_pair_reduction_scales(rng):
    """At a physically meaningful system size the cull is an order of
    magnitude: 8^3 atoms, box 13.6, shells truncated at 3.4/4.76 ->
    >4x fewer pairs (and growing with N: the kept count is O(N), the
    all-pairs table O(N^2))."""
    from molann_tpu.systems import lj_fluid_model

    model, u, box = lj_fluid_model(8)
    spec = model.preprocessing_layer.feature_layer.spec
    culled, report = cull_spec(spec, u.atoms.positions, skin=0.5)
    n_before = sum(report.n_pairs_before)
    n_after = sum(report.n_pairs_after)
    assert n_before == 2 * (512 * 511) // 2
    assert n_after < n_before / 4, (n_before, n_after)


def test_untruncated_features_cull_by_tol(rng):
    """Features WITHOUT d_max fall back to the tol-based cutoff with
    the n_culled x tol bound — exact stays False and the bound is
    honest (nonzero)."""
    from molann_tpu.ops.features import apply_compiled_features
    from molann_tpu.systems import lj_fluid_model

    model, u, box = lj_fluid_model(5, d_max=False)
    spec = model.preprocessing_layer.feature_layer.spec
    # rational y^-6 tails: an honest 1e-6 cutoff exceeds this tiny box,
    # so nothing culls — the bound machinery must still be correct
    culled, report = cull_spec(spec, u.atoms.positions, tol=1e-6)
    assert report.exact == (False, False)
    assert report.n_pairs_after == report.n_pairs_before  # box < r_cut
    # a loose tolerance culls, and the bound covers the error
    x = jnp.asarray(u.atoms.positions[None]
                    + 0.05 * rng.normal(size=(4,) + u.atoms.positions.shape)
                    ).astype(jnp.float32)
    md = max_displacement(u.atoms.positions, np.asarray(x))
    culled, report = cull_spec(spec, u.atoms.positions, tol=5e-3,
                               skin=2 * md + 0.02)
    assert sum(report.n_pairs_after) < sum(report.n_pairs_before)
    full = np.asarray(apply_compiled_features(spec, x))
    part = np.asarray(apply_compiled_features(culled, x))
    bound = np.asarray(report.error_bound) + 5e-4
    assert (np.abs(full - part) <= bound[None, :]).all(), (
        np.abs(full - part).max(axis=0), bound)


def test_cull_model_forward_grad_and_fused(lj, rng):
    """cull_model returns a drop-in MolANN: jits, differentiates, and
    runs through the blocked fused kernel path with the smaller pair
    table."""
    from molann_tpu.ops.fused import fused_model_forward

    model, u, box = lj
    ref = u.atoms.positions
    culled, report = cull_model(model, ref, tol=1e-6, skin=1.0)
    assert sum(report.n_pairs_after) < sum(report.n_pairs_before)

    x = jnp.asarray(ref[None]
                    + 0.1 * rng.normal(size=(4,) + ref.shape)
                    ).astype(jnp.float32)
    y_full = np.asarray(jax.jit(lambda m, v: m(v))(model, x))
    y_cull = np.asarray(jax.jit(lambda m, v: m(v))(culled, x))
    np.testing.assert_allclose(y_cull, y_full, atol=5e-4)

    g_full = np.asarray(jax.grad(lambda v: jnp.sum(model(v)))(x))
    g_cull = np.asarray(jax.grad(lambda v: jnp.sum(culled(v)))(x))
    np.testing.assert_allclose(g_cull, g_full, atol=5e-4)

    y_fused = np.asarray(fused_model_forward(culled, x, mode="blocked",
                                             interpret=True))
    np.testing.assert_allclose(y_fused, y_cull, atol=5e-4)


def test_cull_model_rejects_unknown_and_empty_spec(rng):
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()
    # no coordination features: culling is a no-op
    culled, report = cull_model(model, u.atoms.positions)
    assert report.n_pairs_before == ()
    x = jnp.asarray(u.atoms.positions[None])
    np.testing.assert_allclose(np.asarray(culled(x)),
                               np.asarray(model(x)), atol=1e-6)
    with pytest.raises(TypeError):
        cull_model(object(), u.atoms.positions)


def test_max_displacement_monitor(rng):
    ref = rng.normal(size=(30, 3)).astype(np.float32)
    x = ref.copy()
    x[7] += [0.4, 0, 0]
    assert max_displacement(ref, x) == pytest.approx(0.4, abs=1e-6)
    # batch form
    xs = np.stack([ref, x])
    assert max_displacement(ref, xs) == pytest.approx(0.4, abs=1e-6)
    # wrapping across a periodic boundary is not motion
    L = 10.0
    x2 = ref.copy()
    x2[3] += [L, 0, 0]
    assert max_displacement(ref, x2, box=np.diag([L, L, L])) < 1e-5


def test_chunk_matrix_operand_path(lj, rng):
    """model_chunk_matrix + c_mat= reproduces the closure-constant path
    exactly — the route that keeps multi-GB pair tables out of the HLO
    (they ride the jit boundary as ONE device buffer)."""
    import jax

    from molann_tpu.ops.fused import (fused_cv_forces, fused_train_grads,
                                      model_chunk_matrix)

    model, u, box = lj
    C = model_chunk_matrix(model)
    assert C is not None and C.dtype == jnp.bfloat16
    x = jnp.asarray(u.atoms.positions[None]
                    + 0.1 * rng.normal(size=(4,) + u.atoms.positions.shape)
                    ).astype(jnp.float32)
    f = jax.jit(lambda m, v, c: fused_cv_forces(
        m, v, mode="blocked", interpret=True, c_mat=c))
    y1, g1 = f(model, x, jax.device_put(C))
    y0, g0 = fused_cv_forces(model, x, mode="blocked", interpret=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))

    # the FORWARD entry point too (the only fused route past the backward
    # envelope, where forward-only serving must not bake the table)
    from molann_tpu.ops.fused import fused_model_forward

    ff = jax.jit(lambda m, v, c: fused_model_forward(
        m, v, mode="blocked", interpret=True, c_mat=c))
    yf1 = ff(model, x, jax.device_put(C))
    yf0 = fused_model_forward(model, x, mode="blocked", interpret=True)
    np.testing.assert_array_equal(np.asarray(yf1), np.asarray(yf0))
    # autodiff through the forward still works with the operand route
    gf1 = jax.grad(lambda v: jnp.sum(fused_model_forward(
        model, v, mode="blocked", interpret=True,
        c_mat=jax.device_put(C))))(x)
    gf0 = jax.grad(lambda v: jnp.sum(fused_model_forward(
        model, v, mode="blocked", interpret=True)))(x)
    np.testing.assert_array_equal(np.asarray(gf1), np.asarray(gf0))

    yt = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    l1, gr1 = fused_train_grads(model, x, yt, mode="blocked",
                                interpret=True, c_mat=jax.device_put(C))
    l0, gr0 = fused_train_grads(model, x, yt, mode="blocked",
                                interpret=True)
    assert float(l1) == float(l0)
    for a, b in zip(jax.tree_util.tree_leaves(gr1),
                    jax.tree_util.tree_leaves(gr0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong shape/dtype and wrong-mode errors are loud
    with pytest.raises(ValueError, match="c_mat"):
        fused_cv_forces(model, x, mode="blocked", interpret=True,
                        c_mat=jnp.zeros((3, 3), jnp.bfloat16))
    from molann_tpu.systems import alanine_model

    am, au = alanine_model()
    xa = jnp.asarray(au.atoms.positions[None])
    with pytest.raises(ValueError, match="blocked"):
        fused_cv_forces(am, xa, mode="unrolled", interpret=True,
                        c_mat=jnp.zeros((3, 3), jnp.bfloat16))
    with pytest.raises(ValueError, match="blocked"):
        fused_model_forward(am, xa, mode="unrolled", interpret=True,
                            c_mat=jnp.zeros((3, 3), jnp.bfloat16))
    with pytest.raises(ValueError, match="c_mat"):
        fused_model_forward(model, x, mode="blocked", interpret=True,
                            c_mat=jnp.zeros((3, 3), jnp.bfloat16))
