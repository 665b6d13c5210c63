"""Training checkpoint/resume tests (SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from molann_tpu.systems import alanine_model
from molann_tpu.train import (
    fit,
    latest_checkpoint,
    load_training_state,
    masked_optimizer,
    mse_loss,
    save_training_state,
    trainable_mask,
)


@pytest.fixture()
def model_and_batch(rng):
    model, u = alanine_model()
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(32, 22, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    return model, (x, y)


def test_state_roundtrip(tmp_path, model_and_batch):
    model, batch = model_and_batch
    opt = masked_optimizer(optax.adam(1e-3), trainable_mask(model))
    opt_state = opt.init(model)

    # take a few steps so optimizer moments are non-trivial
    from molann_tpu.train import make_train_step

    step = make_train_step(mse_loss, opt)
    for _ in range(3):
        model, opt_state, _ = step(model, opt_state, batch)

    save_training_state(tmp_path, model, opt_state, 3)
    prefix = latest_checkpoint(tmp_path)
    assert prefix is not None and prefix.endswith("0000000003")

    model2, opt_state2, step_no = load_training_state(prefix, opt)
    assert step_no == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(opt_state),
        jax.tree_util.tree_leaves(opt_state2),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # continued training must be bit-identical from restored state
    m_a, s_a, _ = step(model, opt_state, batch)
    m_b, s_b, _ = step(model2, opt_state2, batch)
    np.testing.assert_allclose(
        np.asarray(m_a.ann_layers.params[0][0]),
        np.asarray(m_b.ann_layers.params[0][0]),
        atol=0,
    )


def test_fit_resume(tmp_path, model_and_batch):
    model, batch = model_and_batch

    def batches():
        while True:
            yield batch

    ckpt = tmp_path / "ckpts"
    r1 = fit(model, mse_loss, batches(), num_steps=10,
             checkpoint_dir=str(ckpt), checkpoint_every=5)
    assert latest_checkpoint(ckpt).endswith("0000000010")

    # run straight to 20 steps without interruption
    r_full = fit(model, mse_loss, batches(), num_steps=20)

    # resume from step 10 and finish to 20
    r2 = fit(model, mse_loss, batches(), num_steps=20,
             checkpoint_dir=str(ckpt), checkpoint_every=5)
    assert len(r2.losses) == 10  # only steps 11..20 executed

    w_resumed = np.asarray(r2.model.ann_layers.params[0][0])
    w_full = np.asarray(r_full.model.ann_layers.params[0][0])
    np.testing.assert_allclose(w_resumed, w_full, atol=1e-6)


def test_optimizer_mismatch_detected(tmp_path, model_and_batch):
    model, batch = model_and_batch
    opt = masked_optimizer(optax.adam(1e-3), trainable_mask(model))
    save_training_state(tmp_path, model, opt.init(model), 1)
    other = masked_optimizer(optax.sgd(1e-3), trainable_mask(model))
    with pytest.raises(ValueError, match="mismatch"):
        load_training_state(latest_checkpoint(tmp_path), other)
