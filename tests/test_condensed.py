"""Condensed-phase workflow: periodic LJ fluid, minimum-image pair
potential, coordination-shell CVs at thousands-of-pairs scale through the
blocked fused formulation, and the end-to-end example."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.sampling import LennardJonesPotential
from molann_tpu.systems import lj_fluid, lj_fluid_model

SPACING = 1.7


def lj_oracle(xf, box, epsilon, sigma, cutoff):
    """Double-precision numpy reference for one frame."""
    n = len(xf)
    e = 0.0
    shift = 4 * epsilon * ((sigma / cutoff) ** 12 - (sigma / cutoff) ** 6)
    for i in range(n):
        for j in range(i + 1, n):
            d = xf[j] - xf[i]
            d -= np.round(d / box) * box
            r = np.linalg.norm(d)
            if r < cutoff:
                e += 4 * epsilon * ((sigma / r) ** 12 - (sigma / r) ** 6)
                e -= shift
    return e


def test_lj_fluid_construction():
    u, box = lj_fluid(3)
    assert len(u.atoms) == 27
    np.testing.assert_allclose(box, 3 * SPACING)
    pos = u.atoms.positions
    assert pos.min() > 0.0 and pos.max() < 3 * SPACING
    # deterministic for a given seed
    u2, _ = lj_fluid(3)
    np.testing.assert_array_equal(pos, u2.atoms.positions)


def test_lj_potential_matches_numpy_oracle(rng):
    u, box = lj_fluid(3, SPACING, jitter=0.08)
    sigma = SPACING / 2 ** (1 / 6)
    pot = LennardJonesPotential(27, box, epsilon=1.0, sigma=sigma)
    x = (u.atoms.positions[None]
         + 0.05 * rng.normal(size=(3, 27, 3))).astype(np.float32)
    got = np.asarray(pot(jnp.asarray(x)))
    want = [lj_oracle(np.float64(xf), box, 1.0, sigma, pot.cutoff)
            for xf in x]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lj_potential_periodicity():
    """Moving one atom by a lattice vector leaves energy (and forces)
    unchanged — the minimum image at work."""
    u, box = lj_fluid(3)
    pot = LennardJonesPotential(27, box, sigma=SPACING / 2 ** (1 / 6))
    x0 = jnp.asarray(u.atoms.positions[None])
    x1 = np.asarray(x0).copy()
    x1[0, 5] += np.float32([box[0], -box[1], 2 * box[2]])
    e0, e1 = float(pot(x0)[0]), float(pot(jnp.asarray(x1))[0])
    assert e0 == pytest.approx(e1, rel=1e-5)
    g0 = np.asarray(jax.grad(lambda xx: jnp.sum(pot(xx)))(x0))
    g1 = np.asarray(jax.grad(lambda xx: jnp.sum(pot(xx)))(jnp.asarray(x1)))
    np.testing.assert_allclose(g0, g1, atol=1e-4)


def test_lj_lattice_is_low_energy(rng):
    """The jittered lattice sits far below a random gas at equal
    density (the solid/fluid contrast the example's CV detects)."""
    u, box = lj_fluid(3)
    pot = LennardJonesPotential(27, box, sigma=SPACING / 2 ** (1 / 6))
    e_lattice = float(pot(jnp.asarray(u.atoms.positions[None]))[0])
    gas = rng.uniform(0, box, size=(4, 27, 3)).astype(np.float32)
    e_gas = np.asarray(pot(jnp.asarray(gas)))
    assert e_lattice < np.min(e_gas) - 5.0


def test_lj_validation():
    with pytest.raises(ValueError, match="3 positive orthorhombic"):
        LennardJonesPotential(8, [5.0, -5.0, 5.0])
    with pytest.raises(ValueError, match="half the shortest box side"):
        LennardJonesPotential(8, [5.0, 5.0, 5.0], cutoff=4.0)


def test_fluid_model_dispatches_blocked():
    from molann_tpu.ops.fused import model_select_mode

    model, u, box = lj_fluid_model(3)
    assert model_select_mode(model) == "blocked"
    spec = model.preprocessing_layer.feature_layer._spec
    assert sum(n for _, n in spec.coord_slices) == 2 * 27 * 26 // 2
    assert spec.coord_boxes[0][0][0] == pytest.approx(3 * SPACING)


def test_fluid_blocked_parity(rng):
    """Blocked fused kernels on the condensed-phase model (702
    minimum-image pairs): forward + CV forces match the XLA path on
    frames that straddle the periodic boundary."""
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward

    model, u, box = lj_fluid_model(3)
    x = jnp.asarray(
        (u.atoms.positions[None]
         + 1.5 * rng.normal(size=(8, 27, 3))).astype(np.float32)
    )
    y_f = fused_model_forward(model, x, tile=8, interpret=True, mode="auto")
    y_j = np.asarray(model(x))
    np.testing.assert_allclose(np.asarray(y_f), y_j, atol=5e-5)
    yv, g = fused_cv_forces(model, x, tile=8, interpret=True, mode="auto")
    gj = np.asarray(jax.grad(lambda xx: jnp.sum(model(xx)))(x))
    scale = max(np.abs(gj).max(), 1.0)
    np.testing.assert_allclose(np.asarray(g), gj, atol=5e-5 * scale)


def test_chunked_pair_path(rng):
    """Past _COORD_RESIDENT_MAX pairs a coordination feature's edge rows
    move OUT of the resident matrix D into the streamed chunk matrix C
    (fori_loop + manual-remat backward — the formulation that keeps
    scoped VMEM bounded on hardware): layout partition, forward, CV
    forces, and single-kernel training grads all match the XLA path;
    mixing with resident features and bonds exercises both routes in
    one kernel."""
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import (
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from molann_tpu.ops.fused import (
        fused_cv_forces,
        fused_model_forward,
        fused_train_grads,
    )
    from molann_tpu.ops.fused_blocked import (
        _COORD_CHUNK,
        _COORD_RESIDENT_MAX,
        blocked_layout,
    )

    u, box = lj_fluid(4)  # 64 atoms -> 2016 pairs all-pairs
    feats = [
        Feature("big", "coordination", u.atoms, r0=1.35 * SPACING,
                pbc_box=box),
        Feature("small", "coordination", u.select_atoms("resid 1:10"),
                r0=3.0),
        Feature("b", "bond",
                u.select_atoms("bynum 1") + u.select_atoms("bynum 40")),
    ]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    lay = blocked_layout(pp.feature_layer._spec, None)
    assert lay.coord_resident == (False, True)
    assert lay.coord_npairs[0] > _COORD_RESIDENT_MAX
    assert lay.mc % lay.chunk == 0 and lay.mc >= lay.coord_npairs[0]
    assert lay.chunk == _COORD_CHUNK  # narrow layout keeps the 512 max

    x = jnp.asarray(
        (u.atoms.positions[None]
         + 0.2 * rng.normal(size=(4, 64, 3))).astype(np.float32)
    )
    y_j = np.asarray(pp(x))
    y_b = fused_model_forward(pp, x, tile=32, interpret=True,
                              mode="blocked")
    np.testing.assert_allclose(np.asarray(y_b), y_j,
                               atol=2e-5 * np.abs(y_j).max())
    yv, g = fused_cv_forces(pp, x, tile=32, interpret=True, mode="blocked",
                            component=0)
    gj = np.asarray(jax.grad(lambda xx: jnp.sum(pp(xx)[:, 0]))(x))
    assert np.abs(gj).max() > 0.1
    np.testing.assert_allclose(np.asarray(g), gj,
                               atol=5e-6 * max(np.abs(gj).max(), 1.0))

    # single-kernel training grads (rows constant w.r.t. params); scale
    # the first layer down so tanh does not saturate to zero gradients
    nn_p = create_sequential_nn([3, 8, 1], key=jax.random.PRNGKey(3))
    (w0, b0), *rest = nn_p.params
    nn_p = type(nn_p)(((w0 * 1e-3, b0), *rest), nn_p.layer_dims,
                      nn_p.activation)
    m = MolANN(pp, nn_p)
    yt = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
    loss_b, grads_b = fused_train_grads(m, x, yt, tile=32, interpret=True,
                                        mode="blocked", precision="exact")
    loss_j, grads_j = jax.value_and_grad(
        lambda mm: jnp.mean((mm(x) - yt) ** 2))(m)
    assert float(loss_b) == pytest.approx(float(loss_j), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_b),
                    jax.tree_util.tree_leaves(grads_j)):
        scale = max(float(jnp.abs(b).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * scale)


def test_adaptive_chunk_selection():
    """Per-layout streaming-chunk + tile admission under the r5 kernel
    structure (single-buffered HBM x/gx + in-place gx accumulation —
    the restructure that moved the backward envelope past 12^3, r4
    VERDICT #4). 10^3 all-active keeps the full 512-row chunk; 12^3
    shrinks to 128 and the backward now ADMITS tile=128 (r4's model
    refused here — 16.23 MB measured vs the 16 MB limit with the
    functional gx carry; the in-place walk compiles and runs on HW).
    The next wall is ~13^3+, where the model refuses with the XLA-path
    escape."""
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import FeatureLayer, PreprocessingANN
    from molann_tpu.ops.fused_blocked import auto_tile, blocked_layout
    from molann_tpu.systems import lj_fluid

    u, box = lj_fluid(10)  # 1000 atoms, every one CV-active
    feats = [Feature("c", "coordination", u.atoms, r0=1.35 * 1.7,
                     pbc_box=box, d_max=2.0 * 1.7)]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    lay = blocked_layout(pp.feature_layer._spec, None)
    assert lay.chunk == 512  # leaner model: full chunk again at 10^3
    assert lay.mc % lay.chunk == 0
    # the selection criterion: backward admits the minimum tile
    assert auto_tile(lay, 1, backward=True) >= 128

    u2, box2 = lj_fluid(12)  # 1728 atoms: ran on HW (probe r5)
    feats2 = [Feature("c", "coordination", u2.atoms, r0=1.35 * 1.7,
                      pbc_box=box2, d_max=2.0 * 1.7)]
    pp2 = PreprocessingANN(None, FeatureLayer(feats2, u2.atoms))
    lay2 = blocked_layout(pp2.feature_layer._spec, None)
    # windowed streaming engages at this width: the walk terms scale
    # with 2W, so the full 512-row chunk survives here too
    assert lay2.windowed and lay2.chunk == 512
    assert auto_tile(lay2, 1, backward=False) >= 128  # forward fits
    assert auto_tile(lay2, 1, backward=True) >= 128   # backward now too

    # past the envelope the model still refuses with the XLA escape
    # (a wide head inflates the working set the same way very large
    # all-active widths do, without the minutes-long all-pairs build)
    with pytest.raises(ValueError, match="XLA path"):
        auto_tile(lay2, 16384, backward=True)


def test_windowed_chunk_parity(rng, monkeypatch):
    """The windowed streaming formulation (r5): pair rows bucketed into
    static (i-window, j-window) groups, streamed as [rows, 2W] — 2W
    MACs per pair row instead of c_cols (O(1) in system size). Forced
    on at toy scale via small W/chunk; parity of every entry point vs
    XLA, plus the c_mat operand route with the windowed matrix."""
    import jax
    import jax.numpy as jnp

    import molann_tpu.ops.fused_blocked as fb
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import FeatureLayer, PreprocessingANN
    from molann_tpu.ops.fused import (fused_cv_forces,
                                      fused_model_forward,
                                      fused_train_grads,
                                      model_chunk_matrix)

    monkeypatch.setattr(fb, "_WIN_W", 16)
    monkeypatch.setattr(fb, "_COORD_CHUNK", 64)
    fb.blocked_layout.cache_clear()
    try:
        from molann_tpu.systems import lj_fluid_model

        m, u, box = lj_fluid_model(4)  # 64 atoms, 2 x 2016 pairs
        lay = fb.blocked_layout(
            m.preprocessing_layer.feature_layer._spec, None)
        assert lay.windowed and lay.mw > 0 and lay.mc == 0
        assert lay.C is None and lay.CW is not None
        assert lay.CW.shape == (lay.mw, 2 * lay.win_w)
        # every real pair row has exactly one -1 (i side) and one +1
        nz = np.count_nonzero(lay.CW, axis=1)
        assert set(nz.tolist()) <= {0, 2}
        assert (lay.CW.sum() == 0.0  # -1/+1 balance
                and np.count_nonzero(nz) == sum(lay.coord_npairs))

        x = jnp.asarray(
            u.atoms.positions[None]
            + 0.1 * rng.normal(size=(4, len(u.atoms), 3)), jnp.float32)
        y0 = np.asarray(m(x))
        g0 = np.asarray(jax.grad(lambda v: jnp.sum(m(v)))(x))
        tol = 2e-5 * max(abs(y0).max(), 1.0)

        y1 = np.asarray(fused_model_forward(m, x, mode="blocked",
                                            interpret=True))
        np.testing.assert_allclose(y1, y0, atol=tol)
        yc, gc = fused_cv_forces(m, x, mode="blocked", interpret=True)
        np.testing.assert_allclose(np.asarray(yc), y0, atol=tol)
        np.testing.assert_allclose(np.asarray(gc), g0,
                                   atol=2e-5 * abs(g0).max())
        g1 = jax.grad(lambda v: jnp.sum(fused_model_forward(
            m, v, mode="blocked", interpret=True)))(x)
        np.testing.assert_allclose(np.asarray(g1), g0,
                                   atol=2e-5 * abs(g0).max())
        # the c_mat operand route streams the WINDOWED matrix
        C = model_chunk_matrix(m)
        assert C.shape == (lay.mw, 2 * lay.win_w)
        yc2, gc2 = fused_cv_forces(m, x, mode="blocked", interpret=True,
                                   c_mat=jax.device_put(C))
        np.testing.assert_array_equal(np.asarray(yc2), np.asarray(yc))
        np.testing.assert_array_equal(np.asarray(gc2), np.asarray(gc))
        # train grads parity vs autodiff of the XLA model
        yt = jnp.asarray(rng.normal(size=(4, 1)).astype(np.float32))
        loss, _grads = fused_train_grads(
            m, x, yt, mode="blocked", interpret=True)
        l0 = float(jnp.mean((m(x) - yt) ** 2))
        assert abs(float(loss) - l0) < 1e-5 * max(abs(l0), 1.0)
    finally:
        fb.blocked_layout.cache_clear()


def test_windowed_padding_guard():
    """Sparse wide features whose pairs scatter thinly over buckets pay
    more in chunk-padded group tails than the narrow stream saves —
    the layout falls back to the full-width stream past 2x row
    inflation."""
    import molann_tpu.ops.fused_blocked as fb
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import FeatureLayer, PreprocessingANN
    from molann_tpu.topology import Universe

    # 2048 atoms all active (via the position feature), plus ONE
    # chunked coordination feature of 2048 pairs scattered over ~64
    # (i, j) buckets — ~32 pairs per bucket against 512-row chunk
    # padding would inflate the windowed matrix ~16x
    n = 2048
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 50
    u = Universe.from_arrays(pos)
    a = u.atoms[::64]   # 32 atoms spanning every i-bucket
    b = u.atoms[1::32]  # 64 atoms spanning every j-bucket
    feats = [
        Feature("p", "position", u.atoms),  # all atoms active
        Feature("c", "coordination", a, group_b=b, r0=2.0),
    ]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    lay = fb.blocked_layout(pp.feature_layer._spec, None)
    assert lay.chunked and lay.c_cols == 2048  # windowing was eligible
    assert not lay.windowed and lay.mw == 0    # ...but the guard tripped
    assert lay.mc == -(-2048 // lay.chunk) * lay.chunk  # full-width C


def test_small_chunk_parity(rng, monkeypatch):
    """Numerical parity of the streamed walk at a non-default chunk size:
    force the 128-row chunk on a small system (multiple chunks + masked
    tail) and check forward and coordinate gradients against XLA."""
    import molann_tpu.ops.fused_blocked as fb
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import FeatureLayer, PreprocessingANN
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward

    monkeypatch.setattr(fb, "_COORD_CHUNK", 128)
    fb.blocked_layout.cache_clear()
    try:
        u, box = lj_fluid(4)  # 64 atoms -> 2016 pairs -> 16 chunks of 128
        feats = [Feature("c", "coordination", u.atoms, r0=1.35 * 1.7,
                         pbc_box=box)]
        pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
        lay = fb.blocked_layout(pp.feature_layer._spec, None)
        assert lay.chunk == 128 and lay.mc == 2048
        x = jnp.asarray(
            (u.atoms.positions[None]
             + 0.2 * rng.normal(size=(4, 64, 3))).astype(np.float32)
        )
        y_j = np.asarray(pp(x))
        y_b = fused_model_forward(pp, x, tile=32, interpret=True,
                                  mode="blocked")
        np.testing.assert_allclose(np.asarray(y_b), y_j,
                                   atol=2e-5 * np.abs(y_j).max())
        _, g = fused_cv_forces(pp, x, tile=32, interpret=True,
                               mode="blocked", component=0)
        gj = np.asarray(jax.grad(lambda xx: jnp.sum(pp(xx)[:, 0]))(x))
        assert np.abs(gj).max() > 0.01
        np.testing.assert_allclose(np.asarray(g), gj,
                                   atol=5e-6 * max(np.abs(gj).max(), 1.0))
    finally:
        fb.blocked_layout.cache_clear()


def test_fluid_model_not_saturated(rng):
    """lj_fluid_model folds feature standardization into its first
    Linear: outputs vary across frames and coordinate gradients are
    nonzero (raw contact counts in the hundreds would pin tanh at +-1
    with exactly-zero gradients)."""
    model, u, box = lj_fluid_model(3)
    x = jnp.asarray(
        (u.atoms.positions[None]
         + 0.3 * rng.normal(size=(6, 27, 3))).astype(np.float32)
    )
    y = np.asarray(model(x))
    assert y.std() > 1e-4
    g = np.asarray(jax.grad(lambda xx: jnp.sum(model(xx)))(x))
    assert np.abs(g).max() > 1e-3


def test_condensed_example_quick():
    """examples/condensed_phase_cv.py end to end (quick mode): LJ
    dynamics at two temperatures, coordination shells, HLDA CV
    separating solid from fluid on held-out frames, blocked fused
    serving parity."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "condensed_phase_cv.py",
    )
    spec = importlib.util.spec_from_file_location("condensed_phase_cv", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main(quick=True)
    assert res["fused_mode"] == "blocked"
    assert res["fused_rel_err"] < 1e-4
    assert res["cv_gap"] > 3 * res["cv_spread"]
    # melting loses first-shell neighbors
    assert res["shell1_fluid"] < res["shell1_solid"] - 1.0
