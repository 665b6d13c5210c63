"""Training-layer tests: data pipeline, forces, losses."""

import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.systems import alanine_model
from molann_tpu.train import (
    TrajectoryDataset,
    autoencoder_loss,
    batch_iterator,
    coordinate_gradients,
    force_fn,
    save_trajectory,
)


def test_trajectory_roundtrip(tmp_path, rng):
    frames = rng.normal(size=(100, 22, 3)).astype(np.float32)
    path = save_trajectory(tmp_path / "traj.npy", frames)
    ds = TrajectoryDataset(path)
    assert ds.n_frames == 100 and ds.n_atoms == 22
    np.testing.assert_array_equal(ds[3:5], frames[3:5])


def test_batch_iterator_shapes(tmp_path, rng):
    frames = rng.normal(size=(100, 22, 3)).astype(np.float32)
    ds = TrajectoryDataset(save_trajectory(tmp_path / "t.npy", frames))
    it = batch_iterator(ds, 30, multiple_of=8, epochs=1, seed=1)
    batches = list(it)
    # 30 -> 24 (multiple of 8); 100//24 = 4 batches
    assert all(b.shape == (24, 22, 3) for b in batches)
    assert len(batches) == 4


def test_batch_iterator_no_shuffle_covers_in_order(tmp_path, rng):
    frames = rng.normal(size=(16, 4, 3)).astype(np.float32)
    ds = TrajectoryDataset(save_trajectory(tmp_path / "t.npy", frames))
    batches = list(batch_iterator(ds, 8, shuffle=False, epochs=1))
    np.testing.assert_array_equal(np.concatenate(batches), frames)


def test_coordinate_gradients_and_forces(rng):
    model, u = alanine_model()
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(4, 22, 3)).astype(np.float32)
    )
    g = coordinate_gradients(model, x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    f = force_fn(model, component=0)(x)
    g0 = coordinate_gradients(model, x, component=0)
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g0), atol=1e-6)


def test_autoencoder_loss(rng):
    from molann_tpu.ann import create_sequential_nn
    import jax

    model, u = alanine_model()
    pp = model.get_preprocessing_layer()
    d = pp.output_dimension()
    enc = create_sequential_nn([d, 4, 2], key=jax.random.PRNGKey(1))
    dec = create_sequential_nn([2, 4, d], key=jax.random.PRNGKey(2))
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(8, 22, 3)).astype(np.float32)
    )
    loss = autoencoder_loss(enc, dec, pp, x)
    assert np.isfinite(float(loss))
    w = jnp.ones((8,))
    loss_w = autoencoder_loss(enc, dec, pp, x, weights=w)
    assert abs(float(loss) - float(loss_w)) < 1e-6


def test_tail_batch_respects_multiple_of(tmp_path, rng):
    """drop_remainder=False tail batches are trimmed to multiple_of so
    device-count divisibility survives (round-1 advisor finding)."""
    from molann_tpu.train.data import (
        TrajectoryDataset,
        batch_iterator,
        packed_batch_iterator,
        save_trajectory,
    )

    frames = rng.normal(size=(23, 4, 3)).astype(np.float32)
    path = tmp_path / "t.npy"
    save_trajectory(path, frames)

    # 23 frames, batch 8, multiple_of 4: two full batches + tail of 7 -> 4
    batches = list(batch_iterator(
        TrajectoryDataset(path), 8, shuffle=False, epochs=1,
        drop_remainder=False, multiple_of=4,
    ))
    assert [b.shape[0] for b in batches] == [8, 8, 4]

    for backend in ("auto", "numpy"):
        batches = list(packed_batch_iterator(
            path, 8, shuffle=False, epochs=1, drop_remainder=False,
            multiple_of=4, backend=backend,
        ))
        assert [b.shape[0] for b in batches] == [8, 8, 4]

    # remainder smaller than multiple_of disappears entirely (25 % 8 = 1)
    frames = rng.normal(size=(17, 4, 3)).astype(np.float32)
    save_trajectory(path, frames)
    batches = list(packed_batch_iterator(
        path, 8, shuffle=False, epochs=1, drop_remainder=False,
        multiple_of=4, backend="numpy",
    ))
    assert [b.shape[0] for b in batches] == [8, 8]


def test_resolve_precision_policy():
    from molann_tpu.ops.fused import resolve_precision

    assert resolve_precision("auto", training=True) == "tf32"
    assert resolve_precision("auto", training=False) == "exact"
    for p in ("exact", "tf32", "bf16"):
        assert resolve_precision(p, training=True) == p
        assert resolve_precision(p, training=False) == p
    with pytest.raises(ValueError, match="unknown precision"):
        resolve_precision("fp8", training=True)


def test_tf32_policy_convergence(rng):
    """The shipped precision='auto' (tf32) training policy (VERDICT r2
    next #4): same model, same data, tf32-vs-exact training tracks within
    tolerance and both converge (blocked formulation, where the edge
    matmul pass count is what precision controls)."""
    import jax
    import optax

    from molann_tpu.ops.fused import fused_train_grads
    from molann_tpu.systems import alanine_model

    model, u = alanine_model(hidden_dims=(8, 2))
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.standard_normal((256, 22, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.standard_normal((256, 2)).astype(np.float32))

    def train(precision):
        opt = optax.adam(5e-3)
        m = model
        state = opt.init(m)

        @jax.jit
        def step(m, state):
            loss, grads = fused_train_grads(
                m, x, y, mode="blocked", interpret=True, tile=64,
                precision=precision,
            )
            updates, state = opt.update(grads, state, m)
            return optax.apply_updates(m, updates), state, loss

        losses = []
        for _ in range(40):
            m, state, loss = step(m, state)
            losses.append(float(loss))
        return losses

    exact = train("exact")
    tf32 = train("auto")  # auto -> tf32 on the training path
    assert exact[-1] < exact[0] and tf32[-1] < tf32[0]  # both converge
    # tf32 noise (~2^-17 relative on the edge matmuls) is far beneath
    # optimization noise: final losses agree to a fraction of the total
    # loss decrease
    drop = exact[0] - exact[-1]
    assert abs(tf32[-1] - exact[-1]) < 0.05 * drop


def test_cv_coordinate_gradients_matches_per_component(rng):
    from molann_tpu.train import cv_coordinate_gradients

    model, u = alanine_model()
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(3, 22, 3)).astype(np.float32)
    )
    g = cv_coordinate_gradients(model, x)
    k = model(x).shape[1]
    assert g.shape == (k, *x.shape)
    for i in range(k):
        np.testing.assert_allclose(
            np.asarray(g[i]),
            np.asarray(coordinate_gradients(model, x, component=i)),
            atol=1e-6,
        )


def test_eigenfunction_loss_recovers_ou_spectrum(rng):
    """On a quadratic potential V = ½ xᵀAx (an OU process) the generator's
    first nontrivial eigenfunctions are the linear maps along A's
    eigenvectors with eigenvalues = A's eigenvalues. Train a 2-CV MLP on
    Boltzmann samples (here beta=1, A=diag(1,4,9), so x ~ N(0, A⁻¹)) and
    check the learned spectrum and mode order."""
    import jax
    import optax

    from molann_tpu.ann import create_sequential_nn
    from molann_tpu.train import eigenfunction_loss

    a = np.array([1.0, 4.0, 9.0], np.float32)
    xs = (rng.normal(size=(4096, 1, 3)) / np.sqrt(a)).astype(np.float32)
    xs = jnp.asarray(xs)

    mlp = create_sequential_nn([3, 16, 2], key=jax.random.PRNGKey(0))

    def loss_fn(m):
        return eigenfunction_loss(
            lambda xx: m(xx.reshape(xx.shape[0], -1)), xs, alpha=20.0
        )

    opt = optax.adam(5e-3)
    state = opt.init(mlp)
    step = jax.jit(
        lambda m, s: (lambda l, g: (l, *_apply(opt, m, s, g)))(
            *jax.value_and_grad(loss_fn)(m)
        )
    )
    for _ in range(400):
        loss, mlp, state = step(mlp, state)

    _, aux = eigenfunction_loss(
        lambda xx: mlp(xx.reshape(xx.shape[0], -1)), xs, alpha=20.0,
        return_aux=True,
    )
    eigs = np.sort(np.asarray(aux["eigenvalues"]))
    # slowest two modes of A = diag(1, 4, 9) under the sampled measure
    assert abs(eigs[0] - 1.0) < 0.4
    assert abs(eigs[1] - 4.0) < 1.5
    # output 0 (largest eig_weight) is the SLOWEST mode: along x-axis
    z = np.asarray(mlp(xs.reshape(-1, 3)))
    c = np.corrcoef(z[:, 0], np.asarray(xs)[:, 0, 0])[0, 1]
    assert abs(c) > 0.9


def _apply(opt, model, state, grads):
    import optax

    updates, state = opt.update(grads, state, model)
    return optax.apply_updates(model, updates), state


def test_eigenfunction_loss_weights_equal_duplication(rng):
    """Importance weighting is exact: weight-2 on a frame == listing the
    frame twice (the reweighted estimator the sampling module's
    frame_weights feeds)."""
    import jax

    from molann_tpu.ann import create_sequential_nn
    from molann_tpu.train import eigenfunction_loss

    mlp = create_sequential_nn([3, 8, 2], key=jax.random.PRNGKey(1))
    model = lambda xx: mlp(xx.reshape(xx.shape[0], -1))  # noqa: E731
    xs = jnp.asarray(rng.normal(size=(10, 1, 3)).astype(np.float32))
    w = np.ones(10, np.float32)
    w[3] = 2.0
    dup = jnp.concatenate([xs, xs[3:4]])
    a = eigenfunction_loss(model, xs, weights=jnp.asarray(w))
    b = eigenfunction_loss(model, dup)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_make_eigenfunction_loss_batch_forms(rng):
    import jax

    from molann_tpu.ann import create_sequential_nn
    from molann_tpu.train import make_eigenfunction_loss

    mlp = create_sequential_nn([3, 8, 1], key=jax.random.PRNGKey(2))
    model = lambda xx: mlp(xx.reshape(xx.shape[0], -1))  # noqa: E731
    xs = jnp.asarray(rng.normal(size=(6, 1, 3)).astype(np.float32))
    loss_fn = make_eigenfunction_loss(alpha=5.0)
    plain = loss_fn(model, xs)
    pair = loss_fn(model, (xs, jnp.ones(6)))
    np.testing.assert_allclose(float(plain), float(pair), rtol=1e-6)


def test_eigenfunction_example_learns_slow_mode():
    """examples/train_eigenfunction_cv.py end to end (quick mode):
    eigenfunctions trained on REWEIGHTED biased data put the interbasin
    hopping mode on output 0 with a clear spectral gap."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "train_eigenfunction_cv.py",
    )
    spec = importlib.util.spec_from_file_location(
        "train_eigenfunction_cv", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main(quick=True)
    assert res["gap"] > 3.0                 # slow mode well separated
    assert abs(res["corr_basin"]) > 0.5     # CV0 tracks the hopping mode
    assert abs(res["corr_cvs"]) < 0.5       # orthonormality held
    assert 0.0 < res["pop_b"] < 0.5         # reweighting is sane


def test_batch_iterator_clamps_oversized_batch(tmp_path, rng):
    """batch_size > n_frames must yield whole-dataset batches, not spin
    forever yielding nothing (the epochs=None busy-loop regression)."""
    frames = rng.normal(size=(10, 4, 3)).astype(np.float32)
    ds = TrajectoryDataset(save_trajectory(tmp_path / "t.npy", frames))
    batches = list(batch_iterator(ds, 1024, epochs=1, shuffle=False))
    assert len(batches) == 1 and batches[0].shape == (10, 4, 3)
    # rounding still honors multiple_of after the clamp
    batches = list(batch_iterator(ds, 1024, epochs=1, multiple_of=4))
    assert len(batches) == 1 and batches[0].shape == (8, 4, 3)
    # an infinite iterator now actually produces batches
    it = batch_iterator(ds, 1024, epochs=None, seed=3)
    assert next(it).shape == (10, 4, 3)
    with pytest.raises(ValueError, match="fewer than"):
        next(batch_iterator(ds, 1024, epochs=1, multiple_of=16))


def test_lagged_pair_iterator_clamps_oversized_batch(tmp_path, rng):
    from molann_tpu.train import lagged_pair_iterator

    frames = rng.normal(size=(12, 4, 3)).astype(np.float32)
    ds = TrajectoryDataset(save_trajectory(tmp_path / "t.npy", frames))
    it = lagged_pair_iterator(ds, 100, lag=2, epochs=None, shuffle=False)
    x_t, x_tau = next(it)
    assert x_t.shape == (10, 4, 3) and x_tau.shape == (10, 4, 3)
    np.testing.assert_array_equal(x_tau, frames[2:])
