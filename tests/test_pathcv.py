"""Path collective variables (Branduardi-style s/t pair).

Oracle: on a semicircular path the progress s must track the arc-length
parameter and the tube coordinate t must vanish on the path and grow as
offset^2 off it; biasing s with metadynamics must drive a walker through
a curved valley that unbiased dynamics never crosses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.sampling import PathCV, metadynamics_langevin


def _semicircle(m=33):
    th = np.linspace(0.0, np.pi, m)
    return np.stack([np.cos(th), np.sin(th)], axis=1)


def test_progress_tracks_arc_length_on_path():
    imgs = _semicircle()
    p = PathCV(imgs)
    s, t = p(imgs)
    s, t = np.asarray(s), np.asarray(t)
    frac = np.linspace(0.0, 1.0, len(imgs))
    # interior images: s equals the arc-length fraction; endpoints are
    # pulled inward by their one-sided neighbours (expected smoothing)
    np.testing.assert_allclose(s[2:-2], frac[2:-2], atol=0.02)
    assert (np.diff(s) > 0).all(), "s must be monotone along the path"
    assert np.abs(t).max() < 0.01  # tube distance ~ 0 on the path


def test_tube_is_squared_offset():
    imgs = _semicircle(65)  # dense path -> discretization error tiny
    p = PathCV(imgs)
    mid = imgs[32]  # (cos(pi/2), sin(pi/2)) = (0, 1)
    for off in (0.05, 0.1):
        q = mid + np.array([0.0, off])  # radially outward at the apex
        s, t = p(q[None])
        assert float(t[0]) == pytest.approx(off**2, rel=0.15)
        assert float(s[0]) == pytest.approx(0.5, abs=0.02)


def test_far_queries_stay_finite():
    p = PathCV(_semicircle())
    s, t = p(np.array([[500.0, -300.0]]))
    assert np.isfinite(s).all() and np.isfinite(t).all()
    # far away, t -> squared distance to the nearest image
    d2 = ((_semicircle() - np.array([500.0, -300.0])) ** 2).sum(1).min()
    assert float(t[0]) == pytest.approx(d2, rel=1e-4)


def test_gradients_are_tangent_and_normal():
    # straight-line path along x: grad s is along x, grad t is ~0 on the
    # path (minimum of the tube coordinate)
    imgs = np.stack([np.linspace(0, 2, 21), np.zeros(21)], axis=1)
    p = PathCV(imgs)
    q = jnp.asarray([0.9, 0.0])
    gs = jax.grad(lambda z: p(z)[0])(q)
    gt = jax.grad(lambda z: p(z)[1])(q)
    assert float(gs[0]) > 0 and abs(float(gs[1])) < 1e-6
    np.testing.assert_allclose(np.asarray(gt), 0.0, atol=1e-5)
    # off the path, grad t points back toward it
    gt_off = jax.grad(lambda z: p(z)[1])(jnp.asarray([0.9, 0.3]))
    assert float(gt_off[1]) > 0


def test_from_mep_roundtrip(tmp_path):
    imgs = _semicircle(9)
    e = np.linspace(0.0, 1.0, 9)
    npy = tmp_path / "path.npy"
    np.save(npy, np.concatenate([imgs, e[:, None]], axis=1))
    csv = tmp_path / "path.csv"
    with open(csv, "w") as fh:
        fh.write("cv0,cv1,free_energy\n")
        for row, v in zip(imgs, e):
            fh.write(f"{row[0]:.8g},{row[1]:.8g},{v:.8g}\n")
    for src in (npy, csv):
        p = PathCV.from_mep(src)
        assert p.images.shape == (9, 2)
        np.testing.assert_allclose(np.asarray(p.images), imgs, atol=1e-6)


def test_validation_errors(tmp_path):
    with pytest.raises(ValueError, match=r"\[m >= 2, d\]"):
        PathCV(np.zeros((1, 2)))
    with pytest.raises(ValueError, match="pairwise distinct"):
        PathCV(np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]))
    with pytest.raises(ValueError, match="lam must be > 0"):
        PathCV(_semicircle(), lam=0.0)
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((3, 1)))
    with pytest.raises(ValueError, match=">= 2 columns"):
        PathCV.from_mep(bad)


def test_wall_is_zero_inside_and_quadratic_outside():
    p = PathCV(_semicircle(65))
    cv = lambda x: x[:, 0, :2]  # single 'atom', xy = CV space
    wall = p.wall(cv, k_wall=10.0, t_max=0.01)
    on = jnp.asarray([[[0.0, 1.0, 0.0]]])       # apex, t ~ 0
    out = jnp.asarray([[[0.0, 1.3, 0.0]]])      # t ~ 0.09
    assert float(wall(on)[0]) == 0.0
    expect = 0.5 * 10.0 * (0.3**2 - 0.01) ** 2
    assert float(wall(out)[0]) == pytest.approx(expect, rel=0.05)
    with pytest.raises(ValueError, match="k_wall"):
        p.wall(cv, k_wall=-1.0, t_max=0.1)


def _curved_valley(z):
    """Double well at x = +-1 joined by a curved valley y = 0.5(1-x^2)."""
    x, y = z[..., 0], z[..., 1]
    return (x**2 - 1.0) ** 2 + 4.0 * (y - 0.5 * (1.0 - x**2)) ** 2


def test_metadynamics_along_path_crosses_curved_valley():
    # the valley floor as the path: x in [-1, 1], y = 0.5(1 - x^2)
    xs = np.linspace(-1.0, 1.0, 41)
    path = PathCV(np.stack([xs, 0.5 * (1.0 - xs**2)], axis=1))
    cv = lambda x: x[:, 0, :2]
    energy = lambda x: _curved_valley(x[:, 0, :2])
    x0 = jnp.asarray([[[-1.0, 0.0, 0.0]]])  # left basin
    kT = 0.12  # barrier 1.0 -> ~8 kT: unbiased stays put
    key = jax.random.PRNGKey(3)
    traj_un, _, _ = metadynamics_langevin(
        energy, path.along(cv), x0, n_steps=6000, dt=2e-3, kT=kT,
        key=key, height=0.0, sigma=0.1, stride=100,
    )
    wall = path.wall(cv, k_wall=50.0, t_max=0.05)
    traj_b, _, bias = metadynamics_langevin(
        lambda x: energy(x) + wall(x), path.along(cv), x0,
        n_steps=6000, dt=2e-3, kT=kT, key=key, height=0.08, sigma=0.08,
        stride=100,
    )
    x_un = np.asarray(traj_un)[..., 0, 0]
    x_b = np.asarray(traj_b)[..., 0, 0]
    assert x_un.max() < 0.0, "unbiased walker should stay in the basin"
    assert x_b.max() > 0.9, "path-metadynamics should reach the far basin"
    # deposits live on the 1-D progress coordinate inside [0, 1]
    c = np.asarray(bias.centers)
    assert c.shape[1] == 1 and c.min() >= 0.0 and c.max() <= 1.0
    # the tube restraint kept the walker near the valley floor
    y_dev = np.abs(np.asarray(traj_b)[..., 0, 1]
                   - 0.5 * (1.0 - x_b**2))
    assert np.median(y_dev) < 0.3
