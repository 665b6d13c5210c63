"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from molann_tpu.parallel import (
    data_mesh,
    make_data_parallel_fn,
    shard_batch,
)
from molann_tpu.parallel.mesh import replicated_sharding
from molann_tpu.systems import alanine_model
from molann_tpu.train import (
    make_train_step,
    masked_optimizer,
    mse_loss,
    trainable_mask,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return data_mesh(8)


@pytest.fixture(scope="module")
def model_and_data():
    model, u = alanine_model()
    rng = np.random.default_rng(0)
    x = u.atoms.positions[None] + 0.05 * rng.normal(size=(64, 22, 3)).astype(
        np.float32
    )
    y = rng.normal(size=(64, 3)).astype(np.float32)
    return model, jnp.asarray(x), jnp.asarray(y)


def test_shard_batch_places_on_mesh(mesh, model_and_data):
    _, x, _ = model_and_data
    xs = shard_batch(x, mesh)
    assert xs.sharding.num_devices == 8
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x), atol=0)


def test_shard_map_loss_matches_single_device(mesh, model_and_data):
    model, x, y = model_and_data
    dp_loss = make_data_parallel_fn(mse_loss, mesh)
    batch = shard_batch((x, y), mesh)
    got = float(dp_loss(model, batch))
    want = float(mse_loss(model, (x, y)))
    assert abs(got - want) < 1e-5


def test_shard_map_grads_match_single_device(mesh, model_and_data):
    model, x, y = model_and_data

    def grad_fn(m, batch):
        return jax.grad(mse_loss)(m, batch)

    dp_grads = make_data_parallel_fn(grad_fn, mesh)
    batch = shard_batch((x, y), mesh)
    g_dp = dp_grads(model, batch)
    g_1d = grad_fn(model, (x, y))
    for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_1d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_data_parallel_train_step(mesh, model_and_data):
    """Full jitted train step with sharded batch == replicated-model GSPMD."""
    model, x, y = model_and_data
    optimizer = masked_optimizer(optax.adam(1e-2), trainable_mask(model))
    repl = replicated_sharding(mesh)

    # data-parallel step
    model_dp = jax.device_put(model, repl)
    opt_state_dp = jax.device_put(optimizer.init(model_dp), repl)
    step_dp = make_train_step(mse_loss, optimizer, mesh)
    batch = shard_batch((x, y), mesh)
    model_dp, opt_state_dp, loss_dp = step_dp(model_dp, opt_state_dp, batch)

    # single-device step
    step_1d = make_train_step(mse_loss, optimizer)
    model_1d, _, loss_1d = step_1d(model, optimizer.init(model), (x, y))

    assert abs(float(loss_dp) - float(loss_1d)) < 1e-5
    w_dp = np.asarray(model_dp.ann_layers.params[0][0])
    w_1d = np.asarray(model_1d.ann_layers.params[0][0])
    np.testing.assert_allclose(w_dp, w_1d, atol=1e-5)


def test_trainable_mask_freezes_ref_x(model_and_data):
    model, _, _ = model_and_data
    mask = trainable_mask(model)
    # ref_x frozen, MLP params trainable
    assert mask.preprocessing_layer.align_layer.ref_x is False
    for (mw, mb) in mask.ann_layers.params:
        assert mw is True and mb is True


def test_training_reduces_loss(model_and_data):
    from molann_tpu.train import fit

    model, x, y = model_and_data
    ref_x_before = np.asarray(model.preprocessing_layer.align_layer.ref_x)

    def batches():
        while True:
            yield (x, y)

    res = fit(model, mse_loss, batches(), num_steps=60,
              optimizer=optax.adam(5e-3))
    assert res.losses[-1] < res.losses[0] * 0.9
    ref_x_after = np.asarray(
        res.model.preprocessing_layer.align_layer.ref_x
    )
    np.testing.assert_array_equal(ref_x_before, ref_x_after)  # buffer frozen


def test_data_parallel_eigenfunction_step(mesh, model_and_data):
    """The eigenfunction objective's weighted mean/covariance are GLOBAL
    batch statistics; under GSPMD the sharded-batch step must reduce them
    across devices exactly (not per-shard-normalize). Weighted batch ==
    the reweighted-biased-data training mode."""
    from molann_tpu.train import make_eigenfunction_loss

    model, x, _ = model_and_data
    w = jnp.asarray(
        np.random.default_rng(7).uniform(0.1, 2.0, size=(64,)).astype(
            np.float32
        )
    )
    loss_fn = make_eigenfunction_loss(beta=4.0, alpha=10.0)
    optimizer = masked_optimizer(optax.adam(1e-2), trainable_mask(model))
    repl = replicated_sharding(mesh)

    model_dp = jax.device_put(model, repl)
    opt_state_dp = jax.device_put(optimizer.init(model_dp), repl)
    step_dp = make_train_step(loss_fn, optimizer, mesh)
    batch = shard_batch((x, w), mesh)
    model_dp, opt_state_dp, loss_dp = step_dp(model_dp, opt_state_dp, batch)

    step_1d = make_train_step(loss_fn, optimizer)
    model_1d, _, loss_1d = step_1d(model, optimizer.init(model), (x, w))

    assert abs(float(loss_dp) - float(loss_1d)) < 1e-4
    w_dp = np.asarray(model_dp.ann_layers.params[0][0])
    w_1d = np.asarray(model_1d.ann_layers.params[0][0])
    np.testing.assert_allclose(w_dp, w_1d, atol=1e-5)


def test_data_parallel_vamp_step(mesh, model_and_data):
    """The VAMP-2 objective's lagged covariances are GLOBAL batch
    moments; the sharded-batch GSPMD step must equal the single-device
    step exactly (weighted pairs = reweighted-biased-data mode)."""
    from molann_tpu.train import make_vamp_loss

    model, x, _ = model_and_data
    x_t, x_tau = x[:32], x[32:]
    w = jnp.asarray(
        np.random.default_rng(9).uniform(0.1, 2.0, size=(32,)).astype(
            np.float32
        )
    )
    loss_fn = make_vamp_loss()
    optimizer = masked_optimizer(optax.adam(1e-2), trainable_mask(model))
    repl = replicated_sharding(mesh)

    model_dp = jax.device_put(model, repl)
    opt_state_dp = jax.device_put(optimizer.init(model_dp), repl)
    step_dp = make_train_step(loss_fn, optimizer, mesh)
    batch = shard_batch((x_t, x_tau, w), mesh)
    model_dp, opt_state_dp, loss_dp = step_dp(model_dp, opt_state_dp, batch)

    step_1d = make_train_step(loss_fn, optimizer)
    model_1d, _, loss_1d = step_1d(
        model, optimizer.init(model), (x_t, x_tau, w)
    )

    assert abs(float(loss_dp) - float(loss_1d)) < 1e-4
    w_dp = np.asarray(model_dp.ann_layers.params[0][0])
    w_1d = np.asarray(model_1d.ann_layers.params[0][0])
    np.testing.assert_allclose(w_dp, w_1d, atol=1e-5)
