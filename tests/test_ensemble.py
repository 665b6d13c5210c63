"""Deep-ensemble (committee) training tests.

The ensemble trainer vmaps K models through ONE compiled step
(molann_tpu/train/ensemble.py); these tests pin (a) exactness — the
stacked step reproduces K independent single-model steps bit-for-bit,
(b) the committee-disagreement signal (std small in-distribution, large
out-of-distribution), (c) bagging decorrelation, and (d) the
data-parallel mesh path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from molann_tpu.ann import create_sequential_nn
from molann_tpu.systems import alanine_model
from molann_tpu.train import (
    committee,
    ensemble_apply,
    ensemble_size,
    fit_ensemble,
    make_ensemble_train_step,
    make_train_step,
    masked_optimizer,
    mse_loss,
    stack_models,
    trainable_mask,
    unstack_model,
)


def _mlps(k, dims=(2, 8, 1)):
    return [
        create_sequential_nn(list(dims), key=jax.random.PRNGKey(100 + i))
        for i in range(k)
    ]


def _sine_batches(rng, n_batches=30, l=64):
    """y = sin(2 x0) + 0.5 x1 on x in [-1, 1]^2."""
    out = []
    for _ in range(n_batches):
        x = rng.uniform(-1, 1, size=(l, 2)).astype(np.float32)
        y = (np.sin(2 * x[:, :1]) + 0.5 * x[:, 1:]).astype(np.float32)
        out.append((jnp.asarray(x), jnp.asarray(y)))
    return out


def test_stack_unstack_roundtrip():
    models = _mlps(3)
    stacked = stack_models(models)
    assert ensemble_size(stacked) == 3
    for i, m in enumerate(models):
        got = unstack_model(stacked, i)
        for (gw, gb), (w, b) in zip(got.params, m.params):
            np.testing.assert_array_equal(gw, w)
            np.testing.assert_array_equal(gb, b)


def test_stack_rejects_mismatched_structure():
    a = create_sequential_nn([2, 8, 1], key=jax.random.PRNGKey(0))
    b = create_sequential_nn([2, 4, 1], key=jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="different structure"):
        stack_models([a, b])
    with pytest.raises(ValueError, match="at least 2"):
        stack_models([a])


def test_ensemble_apply_matches_members(rng):
    models = _mlps(4)
    stacked = stack_models(models)
    x = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
    ys = ensemble_apply(stacked, x)
    assert ys.shape == (4, 16, 1)
    for i, m in enumerate(models):
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(m(x)),
                                   rtol=1e-6, atol=1e-7)


def test_ensemble_step_matches_independent_steps(rng):
    """One vmapped committee step == K separate single-model steps."""
    models = _mlps(3)
    stacked = stack_models(models)
    opt = masked_optimizer(optax.adam(1e-2), trainable_mask(stacked))
    batch = _sine_batches(rng, n_batches=1)[0]

    step = make_ensemble_train_step(mse_loss, opt)
    opt_states = jax.vmap(opt.init)(stacked)
    new_stacked, _, losses = step(stacked, opt_states, batch)
    assert losses.shape == (3,)

    single = make_train_step(mse_loss, opt)
    for i, m in enumerate(models):
        m2, _, loss_i = single(m, opt.init(m), batch)
        np.testing.assert_allclose(float(losses[i]), float(loss_i),
                                   rtol=1e-6)
        got = unstack_model(new_stacked, i)
        for (gw, gb), (w, b) in zip(got.params, m2.params):
            np.testing.assert_allclose(np.asarray(gw), np.asarray(w),
                                       rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(gb), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_member_batch_mode(rng):
    """batch_mode='member': each member trains on its own batch slice."""
    models = _mlps(2)
    stacked = stack_models(models)
    opt = masked_optimizer(optax.adam(1e-2), trainable_mask(stacked))
    (x0, y0), (x1, y1) = _sine_batches(rng, n_batches=2)
    kbatch = (jnp.stack([x0, x1]), jnp.stack([y0, y1]))

    step = make_ensemble_train_step(mse_loss, opt, batch_mode="member")
    opt_states = jax.vmap(opt.init)(stacked)
    new_stacked, _, losses = step(stacked, opt_states, kbatch)

    single = make_train_step(mse_loss, opt)
    for i, b in enumerate([(x0, y0), (x1, y1)]):
        m2, _, loss_i = single(models[i], opt.init(models[i]), b)
        np.testing.assert_allclose(float(losses[i]), float(loss_i),
                                   rtol=1e-6)
        got = unstack_model(new_stacked, i)
        np.testing.assert_allclose(np.asarray(got.params[0][0]),
                                   np.asarray(m2.params[0][0]),
                                   rtol=1e-6, atol=1e-7)


def test_fit_ensemble_converges_and_committee_uncertainty(rng):
    """Committee learns the target; disagreement is small where the data
    was and large far outside it (the adaptive-sampling acquisition
    signal)."""
    result = fit_ensemble(
        _mlps(4), mse_loss, _sine_batches(rng, n_batches=120),
        optimizer=optax.adam(3e-2), bagging=True, seed=7,
    )
    losses = np.asarray(result.losses)
    assert losses.shape[1] == 4
    assert losses[-10:].mean() < 0.3 * losses[:5].mean()

    x_in = jnp.asarray(rng.uniform(-1, 1, size=(256, 2)).astype(np.float32))
    x_out = 8.0 * jnp.ones((256, 2), jnp.float32)
    _, std_in = committee(result.models, x_in)
    _, std_out = committee(result.models, x_out)
    assert float(std_out.mean()) > 3.0 * float(std_in.mean())


def test_bagging_decorrelates_identical_inits(rng):
    """With IDENTICAL inits, shared batches keep members identical forever;
    bagging splits them — the decorrelation the committee signal needs."""
    same = [create_sequential_nn([2, 8, 1], key=jax.random.PRNGKey(5))
            for _ in range(2)]
    batches = _sine_batches(rng, n_batches=10)

    shared = fit_ensemble(same, mse_loss, batches,
                          optimizer=optax.adam(1e-2), bagging=False)
    w = shared.models.params[0][0]
    np.testing.assert_array_equal(np.asarray(w[0]), np.asarray(w[1]))

    bagged = fit_ensemble(same, mse_loss, batches,
                          optimizer=optax.adam(1e-2), bagging=True, seed=3)
    wb = bagged.models.params[0][0]
    assert float(jnp.abs(wb[0] - wb[1]).max()) > 1e-5


@pytest.mark.parametrize("bagging", [False, True])
def test_ensemble_mesh_step_runs_and_matches(rng, bagging):
    """Data-parallel committee step over the 8-device CPU mesh; the shared
    mode must match the single-device step exactly (equal shards ->
    pmean == global mean)."""
    from molann_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(8)
    models = _mlps(3)
    stacked = stack_models(models)
    opt = masked_optimizer(optax.adam(1e-2), trainable_mask(stacked))
    batch = _sine_batches(rng, n_batches=1, l=64)[0]
    opt_states = jax.vmap(opt.init)(stacked)

    mode = "bagging" if bagging else "shared"
    mstep = make_ensemble_train_step(mse_loss, opt, mesh, batch_mode=mode)
    if bagging:
        out = mstep(stacked, opt_states, batch, jax.random.PRNGKey(0))
        new_m, _, losses = out
        assert losses.shape == (3,)
        assert bool(jnp.isfinite(losses).all())
        # members updated
        assert float(jnp.abs(new_m.params[0][0] -
                             stacked.params[0][0]).max()) > 0
    else:
        new_m, _, losses = mstep(stacked, opt_states, batch)
        sstep = make_ensemble_train_step(mse_loss, opt)
        ref_m, _, ref_losses = sstep(stacked, opt_states, batch)
        np.testing.assert_allclose(np.asarray(losses),
                                   np.asarray(ref_losses), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new_m.params[0][0]),
                                   np.asarray(ref_m.params[0][0]),
                                   rtol=1e-5, atol=1e-6)


def test_calibrated_committee_removes_gauge(rng):
    """A member that is an exact sign/scale transform of another is NOT
    disagreement: raw committee std sees it, calibrated std does not."""
    from molann_tpu.models.ann import SequentialNN
    from molann_tpu.train import calibrated_committee

    m0 = create_sequential_nn([2, 8, 1], key=jax.random.PRNGKey(0))
    # m1(x) = -3 * m0(x): same CV in a different gauge
    params = list(m0.params)
    w, b = params[-1]
    params[-1] = (-3.0 * w, -3.0 * b)
    m1 = SequentialNN(tuple(params), m0.layer_dims, m0.activation)
    stacked = stack_models([m0, m1])

    x_ref = jnp.asarray(rng.normal(size=(128, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(32, 2)).astype(np.float32))
    _, raw_std = committee(stacked, x)
    assert float(raw_std.mean()) > 0.1          # gauge noise dominates
    mean, cal_std = calibrated_committee(stacked, x, x_ref)
    np.testing.assert_allclose(np.asarray(cal_std), 0.0, atol=1e-4)
    # calibrated mean is the standardized CV (reference mean 0 / std 1)
    z0 = (m0(x_ref) - m0(x_ref).mean()) / m0(x_ref).std()
    z = (m0(x) - m0(x_ref).mean()) / m0(x_ref).std()
    np.testing.assert_allclose(np.asarray(mean), np.asarray(z),
                               rtol=1e-3, atol=1e-4)
    del z0


def test_committee_uncertainty_example_quick():
    """examples/committee_uncertainty.py end to end (quick mode): a
    committee trained ONLY in basin A disagrees much more on basin-B
    frames — uncertainty-guided acquisition without a biased run."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "examples", "committee_uncertainty.py")
    spec = importlib.util.spec_from_file_location("committee_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.main(quick=True)
    assert res["ratio"] > 3.0
    assert np.asarray(res["losses"])[-1].mean() < 0.2


def test_full_molann_committee_freezes_ref_x(rng):
    """End-to-end: a committee of full MolANN models (alignment + features
    + MLP) trains jointly; the alignment ref_x buffer stays frozen and
    identical across members."""
    members = []
    for i in range(3):
        m, u = alanine_model(key=jax.random.PRNGKey(i))
        members.append(m)
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(32, 22, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    result = fit_ensemble(members, mse_loss, [(x, y)] * 20,
                          optimizer=optax.adam(1e-2), bagging=True)
    ref0 = members[0].preprocessing_layer.align_layer.ref_x
    got = result.models.preprocessing_layer.align_layer.ref_x
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref0))
    mean, std = committee(result.models, x)
    assert mean.shape == (32, 3) and std.shape == (32, 3)
    assert bool(jnp.isfinite(std).all())

def test_reinitialized_members(rng):
    """reinitialized_members: fresh MLP params per member from distinct
    keys, shared frozen alignment metadata, tuple handling, validation."""
    from molann_tpu.train import reinitialized_members

    model, u = alanine_model(key=jax.random.PRNGKey(0))
    members = reinitialized_members(model, 3, seed=11)
    assert len(members) == 3
    ref0 = model.preprocessing_layer.align_layer.ref_x
    w = [np.asarray(m.ann_layers.params[0][0]) for m in members]
    assert float(np.abs(w[0] - w[1]).max()) > 1e-4
    assert float(np.abs(w[1] - w[2]).max()) > 1e-4
    for m in members:
        assert m.ann_layers.layer_dims == model.ann_layers.layer_dims
        np.testing.assert_array_equal(
            np.asarray(m.preprocessing_layer.align_layer.ref_x),
            np.asarray(ref0),
        )
    # members stack (identical structure) and differ only in values
    stacked = stack_models(members)
    assert ensemble_size(stacked) == 3

    # (model, decoder) tuples reinitialize both parts
    dec = create_sequential_nn([3, 4, 2], key=jax.random.PRNGKey(9))
    pairs = reinitialized_members((model, dec), 2, seed=0)
    assert isinstance(pairs[0], tuple) and len(pairs[0]) == 2
    assert pairs[0][1].layer_dims == dec.layer_dims
    assert float(np.abs(np.asarray(pairs[0][1].params[0][0])
                        - np.asarray(pairs[1][1].params[0][0])).max()) > 1e-4

    with pytest.raises(ValueError, match="at least 2"):
        reinitialized_members(model, 1)
    with pytest.raises(TypeError, match="cannot reinitialize"):
        reinitialized_members(object(), 2)


def test_committee_calibration_precompute_matches(rng):
    """calibrated_committee(calibration=...) == calibrated_committee(x_ref)
    — the streaming path of the `committee` CLI."""
    from molann_tpu.train import calibrated_committee, committee_calibration

    stacked = stack_models(_mlps(3))
    x_ref = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
    m1, s1 = calibrated_committee(stacked, x, x_ref)
    calib = committee_calibration(stacked, x_ref)
    m2, s2 = calibrated_committee(stacked, x, calibration=calib)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    with pytest.raises(ValueError, match="x_ref or calibration"):
        calibrated_committee(stacked, x)
