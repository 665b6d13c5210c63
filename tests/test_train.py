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
