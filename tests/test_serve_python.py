"""Python-side multi-device serving (molann_tpu.serve) on the 8-device
virtual CPU mesh: shard_map'd fused serving matches the plain model,
tail padding trims exactly, and file-based trajectories stream."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.serve import evaluate_trajectory, make_serving_fn
from molann_tpu.systems import alanine_model


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    model, u = alanine_model()
    frames = (
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(200, 22, 3))
    ).astype(np.float32)
    return model, frames


def _reference(model, frames):
    x = jnp.asarray(frames)
    y = np.asarray(model(x))
    g = np.asarray(jax.grad(lambda v: jnp.sum(model(v)))(x))
    return y, g


@pytest.mark.slow
def test_evaluate_matches_model_over_mesh(setup):
    model, frames = setup
    y_ref, g_ref = _reference(model, frames)
    cvs, grads = evaluate_trajectory(
        model, frames, forces=True, interpret=True, batch_size=128,
    )
    assert cvs.shape == y_ref.shape and grads.shape == g_ref.shape
    np.testing.assert_allclose(cvs, y_ref, atol=5e-6)
    np.testing.assert_allclose(grads, g_ref, atol=5e-5)


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 7, 64, 129])
def test_tail_padding_exact(setup, n):
    """Arbitrary frame counts: the padded tail must be trimmed to
    exactly the real frames (200 % 128 != 0 path covered above)."""
    model, frames = setup
    sub = frames[:n]
    y_ref = np.asarray(model(jnp.asarray(sub)))
    cvs = evaluate_trajectory(model, sub, interpret=True, batch_size=128)
    assert cvs.shape == y_ref.shape
    np.testing.assert_allclose(cvs, y_ref, atol=5e-6)


@pytest.mark.slow
def test_streams_from_files(setup, tmp_path):
    model, frames = setup
    from molann_tpu.io.xdr import write_trr

    np.save(tmp_path / "t.npy", frames)
    write_trr(tmp_path / "t.trr", frames)
    y_ref = np.asarray(model(jnp.asarray(frames)))
    for p in (tmp_path / "t.npy", tmp_path / "t.trr"):
        cvs = evaluate_trajectory(model, str(p), interpret=True,
                                  batch_size=64)
        np.testing.assert_allclose(cvs, y_ref, atol=5e-6)


@pytest.mark.slow
def test_serving_fn_single_device_mesh(setup):
    """A 1-device mesh takes the plain-jit path (no shard_map)."""
    from molann_tpu.parallel import data_mesh

    model, frames = setup
    mesh = data_mesh(1)
    fn = make_serving_fn(model, mesh, forces=False, interpret=True)
    y = np.asarray(fn(model, jnp.asarray(frames[:16])))
    np.testing.assert_allclose(
        y, np.asarray(model(jnp.asarray(frames[:16]))), atol=5e-6
    )


def test_empty_trajectory(setup):
    """Zero frames return correctly-shaped empty arrays, not None
    (outputs are preallocated from the model dims, not from the first
    batch)."""
    from molann_tpu.models.ann import model_dims

    model, _ = setup
    n, d = model_dims(model)
    empty = np.zeros((0, n, 3), np.float32)
    cvs, grads = evaluate_trajectory(model, empty, forces=True,
                                     interpret=True)
    assert cvs.shape == (0, d)
    assert grads.shape == (0, n, 3)
    assert evaluate_trajectory(model, empty, interpret=True).shape == (0, d)


@pytest.mark.slow
def test_cpu_fallback_without_interpret(setup):
    """On the CPU backend (which cannot run compiled Mosaic kernels),
    serving WITHOUT interpret=True falls back to the plain-XLA path and
    still matches the model — instead of dying in kernel lowering."""
    model, frames = setup
    sub = frames[:64]
    y_ref, g_ref = _reference(model, sub)
    cvs, grads = evaluate_trajectory(model, sub, forces=True, batch_size=64)
    np.testing.assert_allclose(cvs, y_ref, atol=5e-6)
    np.testing.assert_allclose(grads, g_ref, atol=5e-5)


@pytest.mark.slow
def test_grads_transform_applied_per_batch(setup):
    """grads_transform (the in-flight force-convention hook) is applied
    to every batch, including the trimmed tail."""
    model, frames = setup
    _, g_ref = _reference(model, frames)
    _, forces = evaluate_trajectory(
        model, frames, forces=True, interpret=True, batch_size=128,
        grads_transform=np.negative,
    )
    np.testing.assert_allclose(forces, -g_ref, atol=5e-5)
