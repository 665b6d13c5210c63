"""String method against the Müller-Brown oracle.

The MB surface's minima and saddle points are known to high precision
(standard benchmark for path-finding methods), so the converged string
must pass through both saddles and its energy maximum must equal the
rate-limiting saddle energy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.sampling import grid_interpolator, linear_path, string_method

# Müller-Brown constants
_A = np.array([-200.0, -100.0, -170.0, 15.0])
_a = np.array([-1.0, -1.0, -6.5, 0.7])
_b = np.array([0.0, 0.0, 11.0, 0.6])
_c = np.array([-10.0, -10.0, -6.5, 0.7])
_x0 = np.array([1.0, 0.0, -0.5, -1.0])
_y0 = np.array([0.0, 0.5, 1.5, 1.0])

MIN_A = np.array([-0.5582, 1.4417])   # V = -146.700
MIN_C = np.array([0.6235, 0.0280])    # V = -108.167
SADDLE_1 = np.array([-0.8220, 0.6243])  # V = -72.249
SADDLE_2 = np.array([0.2125, 0.2930])   # V = -40.665


def muller_brown(z):
    x, y = z[..., 0:1], z[..., 1:2]
    return jnp.sum(
        _A * jnp.exp(
            _a * (x - _x0) ** 2
            + _b * (x - _x0) * (y - _y0)
            + _c * (y - _y0) ** 2
        ),
        axis=-1,
    )


@pytest.fixture(scope="module")
def converged_string():
    s0 = linear_path(MIN_A + 0.05, MIN_C - 0.05, 48)
    imgs, e = string_method(muller_brown, s0, n_iterations=6000, step=5e-5)
    return np.asarray(imgs), np.asarray(e)


def test_endpoints_relax_into_minima(converged_string):
    imgs, e = converged_string
    np.testing.assert_allclose(imgs[0], MIN_A, atol=0.02)
    np.testing.assert_allclose(imgs[-1], MIN_C, atol=0.02)
    assert e[0] == pytest.approx(-146.700, abs=0.1)
    assert e[-1] == pytest.approx(-108.167, abs=0.1)


def test_string_passes_through_both_saddles(converged_string):
    imgs, e = converged_string
    for saddle in (SADDLE_1, SADDLE_2):
        dmin = np.min(np.linalg.norm(imgs - saddle, axis=1))
        assert dmin < 0.05, f"string misses saddle {saddle}: {dmin}"
    # rate-limiting barrier = max energy along the path = saddle 2
    assert e.max() == pytest.approx(-40.665, abs=1.0)
    # the barrier is INTERIOR (not an endpoint artifact)
    assert 0 < int(e.argmax()) < len(e) - 1


def test_pinned_endpoints_stay():
    start, end = jnp.asarray([-0.3, 1.0]), jnp.asarray([0.3, 0.2])
    s0 = linear_path(start, end, 16)
    imgs, _ = string_method(muller_brown, s0, n_iterations=200, step=5e-5,
                            pin_ends=True)
    np.testing.assert_allclose(np.asarray(imgs[0]), start, atol=1e-6)
    np.testing.assert_allclose(np.asarray(imgs[-1]), end, atol=1e-6)


def test_string_on_interpolated_fes_matches_analytic(converged_string):
    """The full workflow shape: a gridded FES (as 'fes'/'pmf' produce)
    interpolated multilinearly must yield the same path and barrier."""
    xs = np.linspace(-1.7, 1.3, 301)
    ys = np.linspace(-0.5, 2.1, 261)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    grid = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    table = np.asarray(muller_brown(jnp.asarray(grid))).reshape(301, 261)
    f = grid_interpolator([xs, ys], table)

    # interpolation accuracy off-grid
    rng = np.random.default_rng(0)
    pts = rng.uniform([-1.5, -0.3], [1.1, 1.9], size=(200, 2))
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(pts))),
        np.asarray(muller_brown(jnp.asarray(pts))),
        atol=0.5,
    )

    s0 = linear_path(MIN_A + 0.05, MIN_C - 0.05, 48)
    imgs, e = string_method(f, s0, n_iterations=6000, step=5e-5)
    imgs_ref, e_ref = converged_string
    assert float(np.max(np.asarray(e))) == pytest.approx(
        e_ref.max(), abs=1.5
    )
    # paths agree pointwise (same discretization)
    assert np.max(np.linalg.norm(np.asarray(imgs) - imgs_ref, axis=1)) < 0.1


def test_grid_interpolator_validation_and_fill():
    xs = np.linspace(0.0, 1.0, 5)
    vals = np.zeros((5, 5))
    vals[2, 2] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        grid_interpolator([xs, xs], vals)
    f = grid_interpolator([xs, xs], vals, fill=7.0)
    assert float(f(jnp.asarray([0.5, 0.5]))) == pytest.approx(7.0)
    with pytest.raises(ValueError, match="shape"):
        grid_interpolator([xs], np.zeros((5, 5)))
    with pytest.raises(ValueError, match="uniformly"):
        grid_interpolator([np.array([0.0, 1.0, 3.0])], np.zeros(3))
    # queries outside the hull clamp to the boundary value
    g = grid_interpolator([xs], xs ** 2)
    assert float(g(jnp.asarray([2.0]))) == pytest.approx(1.0)
    assert float(g(jnp.asarray([-1.0]))) == pytest.approx(0.0)


def test_grid_interpolator_1d_matches_interp():
    xs = np.linspace(-1.0, 1.0, 21)
    vals = np.sin(3 * xs)
    f = grid_interpolator([xs], vals)
    q = np.linspace(-1.0, 1.0, 57)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(q[:, None]))),
        np.interp(q, xs, vals),
        atol=1e-6,
    )


def test_string_input_validation():
    with pytest.raises(ValueError, match="n_images"):
        string_method(muller_brown, jnp.zeros((2, 2)))
