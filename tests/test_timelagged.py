"""Time-lagged CV learning (TICA + VAMP-2) against an analytic
AR(1)/Ornstein-Uhlenbeck oracle.

A discrete OU process ``z_{t+1} = a z_t + sqrt(1-a^2) xi`` has transfer-
operator eigenvalues exactly ``a_i`` on linear observables, so TICA on an
invertibly mixed observation ``x = W z`` must recover the ``a_i`` and
unmix the slow direction; the VAMP-2 score of a sufficient model equals
``sum a_i^2``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.train import (
    TrajectoryDataset,
    fit,
    lagged_pair_iterator,
    make_vamp_loss,
    tica,
    vamp2_loss,
    vamp2_score,
)

A = np.array([0.9, 0.6, 0.3])
T = 60_000


@pytest.fixture(scope="module")
def ou_mixed():
    rng = np.random.default_rng(42)
    z = np.empty((T, 3), dtype=np.float64)
    z[0] = rng.normal(size=3)
    noise = rng.normal(size=(T - 1, 3)) * np.sqrt(1.0 - A**2)
    for t in range(T - 1):
        z[t + 1] = A * z[t] + noise[t]
    w_mix = np.array([[1.0, 0.4, -0.2],
                      [0.3, 1.2, 0.5],
                      [-0.5, 0.2, 0.8]])
    x = (z @ w_mix.T).astype(np.float32)
    return x, w_mix


def test_tica_recovers_ou_eigenvalues(ou_mixed):
    x, _ = ou_mixed
    r = tica(x[:-1], x[1:])
    np.testing.assert_allclose(r.eigenvalues, A, atol=0.03)


def test_tica_modes_unmix_and_decorrelate(ou_mixed):
    x, w_mix = ou_mixed
    r = tica(x[:-1], x[1:])
    # slowest mode = the z1 linear functional: align with e1^T W^{-1}
    true_dir = np.linalg.inv(w_mix).T[:, 0]
    got = np.asarray(r.modes[:, 0])
    cos = abs(got @ true_dir) / (
        np.linalg.norm(got) * np.linalg.norm(true_dir)
    )
    assert cos > 0.99
    # projections are C00-orthonormal: unit variance, zero cross-corr
    y = np.asarray(r.transform(x))
    cov = np.cov(y.T)
    np.testing.assert_allclose(cov, np.eye(3), atol=0.05)
    # per-mode empirical lag autocorrelation ~ the reported eigenvalue
    ac = np.mean(y[:-1] * y[1:], axis=0)
    np.testing.assert_allclose(ac, r.eigenvalues, atol=0.03)


def test_tica_timescales():
    r = tica(np.zeros((4, 1), np.float32), np.zeros((4, 1), np.float32))
    r.eigenvalues = np.array([0.8, 1.0, -0.1])
    r.lag = 2.0
    ts = r.timescales()
    assert ts[0] == pytest.approx(-2.0 / np.log(0.8))
    assert np.isinf(ts[1]) and np.isnan(ts[2])


def test_tica_lag_longer_than_one(ou_mixed):
    x, _ = ou_mixed
    r = tica(x[:-3], x[3:], lag=3.0)
    np.testing.assert_allclose(r.eigenvalues, A**3, atol=0.03)
    # implied timescale is lag-invariant for a Markov process
    r1 = tica(x[:-1], x[1:], lag=1.0)
    np.testing.assert_allclose(
        r.timescales()[0], r1.timescales()[0], rtol=0.1
    )


def test_vamp2_score_of_sufficient_model(ou_mixed):
    x, _ = ou_mixed
    score = float(vamp2_score(jnp.asarray(x[:-1]), jnp.asarray(x[1:])))
    assert score == pytest.approx(float(np.sum(A**2)), abs=0.05)


def test_vamp2_uniform_weights_match_none(ou_mixed):
    x, _ = ou_mixed
    f0, ft = jnp.asarray(x[:1000]), jnp.asarray(x[1 : 1001])
    s1 = float(vamp2_score(f0, ft))
    s2 = float(vamp2_score(f0, ft, weights=jnp.full((1000,), 3.5)))
    assert s1 == pytest.approx(s2, rel=1e-5)


def test_vamp_training_finds_slow_direction(ou_mixed):
    """A trainable linear model maximizing VAMP-2 with ONE output must
    align with the slowest TICA direction."""
    from molann_tpu.ann import create_sequential_nn

    x, w_mix = ou_mixed
    model = create_sequential_nn([3, 1], key=jax.random.PRNGKey(0))
    f0 = jnp.asarray(x[:-1][:20000])
    ft = jnp.asarray(x[1:][:20000])

    def batches():
        while True:
            yield (f0, ft)

    import optax

    res = fit(model, make_vamp_loss(), batches(), num_steps=120,
              optimizer=optax.adam(0.05))
    assert res.losses[-1] < res.losses[0]
    # VAMP-2 of the trained 1-output model ~ a_0^2
    assert -res.losses[-1] == pytest.approx(A[0] ** 2, abs=0.05)
    w = np.asarray(res.model.params[0][0]).reshape(3)
    true_dir = np.linalg.inv(w_mix).T[:, 0]
    cos = abs(w @ true_dir) / (np.linalg.norm(w) * np.linalg.norm(true_dir))
    assert cos > 0.97


def test_vamp2_loss_aux(ou_mixed):
    x, _ = ou_mixed
    model = lambda f: f  # identity featurization
    loss, aux = vamp2_loss(model, jnp.asarray(x[:-1]), jnp.asarray(x[1:]),
                           return_aux=True)
    assert float(aux["vamp2"]) == pytest.approx(-float(loss))
    np.testing.assert_allclose(
        np.asarray(aux["autocorrelations"]), A, atol=0.03
    )


def test_lagged_pair_iterator(tmp_path):
    frames = np.arange(10, dtype=np.float32)[:, None, None] * np.ones(
        (10, 2, 3), np.float32
    )
    p = tmp_path / "traj.npy"
    np.save(p, frames)
    ds = TrajectoryDataset(p)
    it = lagged_pair_iterator(ds, 4, 3, shuffle=False, epochs=1)
    x_t, x_tau = next(it)
    assert x_t.shape == (4, 2, 3) and x_tau.shape == (4, 2, 3)
    np.testing.assert_array_equal(x_tau[:, 0, 0], x_t[:, 0, 0] + 3.0)
    # weighted variant yields the start frame's weight
    w = np.arange(10, dtype=np.float32)
    it = lagged_pair_iterator(ds, 4, 3, shuffle=False, epochs=1, weights=w)
    x_t, _, w_t = next(it)
    np.testing.assert_array_equal(w_t, x_t[:, 0, 0])
    with pytest.raises(ValueError, match="lag"):
        next(lagged_pair_iterator(ds, 4, 10))
    with pytest.raises(ValueError, match="weights"):
        next(lagged_pair_iterator(ds, 4, 2, weights=np.ones(3)))


def test_tica_shape_validation():
    with pytest.raises(ValueError, match="matching"):
        tica(np.zeros((5, 2), np.float32), np.zeros((4, 2), np.float32))


def test_timelagged_example_learns_hopping_mode():
    """examples/train_timelagged_cv.py end to end (quick mode): the
    VAMP-2-trained CV on unbiased two-basin dynamics IS the interbasin
    hopping mode (|corr| with the basin indicator ~1) and matches or
    beats the linear TICA autocorrelation."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "train_timelagged_cv.py",
    )
    spec = importlib.util.spec_from_file_location("train_timelagged_cv",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main(quick=True)
    assert res["hops"] > 10
    assert res["corr_basin"] > 0.9
    assert res["vamp_ac"] > res["tica_ac"] - 0.02
    assert res["vamp2"] > 0.9


def test_tae_training_finds_slow_direction():
    """Time-lagged autoencoder: on an unmixed 3-d OU process the rank-1
    bottleneck must select the slowest coordinate — fast modes
    decorrelate over the lag and cannot help predict x_{t+1}."""
    import optax

    from molann_tpu.ann import create_sequential_nn
    from molann_tpu.train import timelagged_autoencoder_loss

    rng = np.random.default_rng(7)
    t_len = 30_000
    z = np.empty((t_len, 3), dtype=np.float64)
    z[0] = rng.normal(size=3)
    noise = rng.normal(size=(t_len - 1, 3)) * np.sqrt(1.0 - A**2)
    for t in range(t_len - 1):
        z[t + 1] = A * z[t] + noise[t]
    x = z.astype(np.float32)

    enc = create_sequential_nn([3, 1], key=jax.random.PRNGKey(0))
    dec = create_sequential_nn([1, 3], key=jax.random.PRNGKey(1))
    pp = lambda v: v  # features = coordinates

    def loss_fn(pair, batch):
        e, d = pair
        return timelagged_autoencoder_loss(e, d, pp, batch[0], batch[1])

    f0, ft = jnp.asarray(x[:-1]), jnp.asarray(x[1:])

    def batches():
        while True:
            yield (f0, ft)

    res = fit((enc, dec), loss_fn, batches(), num_steps=150,
              optimizer=optax.adam(0.05))
    assert res.losses[-1] < res.losses[0]
    enc_t, _ = res.model
    w = np.asarray(enc_t.params[0][0]).reshape(3)
    cos = abs(w[0]) / np.linalg.norm(w)
    assert cos > 0.97  # bottleneck = the a=0.9 coordinate
    # the learned CV's lag autocorrelation matches the slow mode
    y = np.asarray(enc_t(f0)).reshape(-1)
    y = y - y.mean()
    ac = float(np.mean(y[:-1] * y[1:]) / np.mean(y * y))
    assert ac == pytest.approx(A[0], abs=0.05)


def test_tae_loss_weights_and_shapes():
    from molann_tpu.ann import create_sequential_nn
    from molann_tpu.train import timelagged_autoencoder_loss

    enc = create_sequential_nn([6, 2], key=jax.random.PRNGKey(0))
    dec = create_sequential_nn([2, 6], key=jax.random.PRNGKey(1))
    pp = lambda v: v.reshape(v.shape[0], -1)
    x = jax.random.normal(jax.random.PRNGKey(2), (33, 2, 3))
    plain = float(timelagged_autoencoder_loss(enc, dec, pp, x[:-1], x[1:]))
    wtd = float(timelagged_autoencoder_loss(
        enc, dec, pp, x[:-1], x[1:], weights=jnp.full((32,), 2.5)))
    assert plain == pytest.approx(wtd, rel=1e-6)
