"""HLDA discriminant CVs against the two-state closed form and a
three-state separation oracle."""

import numpy as np
import pytest

from molann_tpu.train import hlda


def _two_gaussians(rng, n=6000):
    # distinct anisotropic covariances so harmonic != arithmetic
    la = np.linalg.cholesky(np.array([[0.05, 0.02], [0.02, 0.50]]))
    lb = np.linalg.cholesky(np.array([[0.40, -0.05], [-0.05, 0.08]]))
    mu_a, mu_b = np.array([0.0, 0.0]), np.array([1.0, 0.6])
    fa = rng.normal(size=(n, 2)) @ la.T + mu_a
    fb = rng.normal(size=(n, 2)) @ lb.T + mu_b
    f = np.concatenate([fa, fb])
    y = np.repeat([0, 1], n)
    return f, y, (la @ la.T, lb @ lb.T, mu_a, mu_b)


def test_hlda_two_state_closed_form(rng):
    """K=2 HLDA must reproduce w ~ (Sigma_A^-1 + Sigma_B^-1)(mu_A-mu_B)
    (the published closed form), up to sign/scale."""
    f, y, (sa, sb, mu_a, mu_b) = _two_gaussians(rng)
    r = hlda(f, y)
    w = r.directions[:, 0]
    want = (np.linalg.inv(sa) + np.linalg.inv(sb)) @ (mu_a - mu_b)
    want = want / np.linalg.norm(want)
    assert abs(w @ want) > 0.995
    assert r.directions.shape == (2, 1) and len(r.eigenvalues) == 1
    # the discriminant separates the classes cleanly
    z = r.transform(f)[:, 0]
    gap = abs(z[y == 0].mean() - z[y == 1].mean())
    spread = max(z[y == 0].std(), z[y == 1].std())
    assert gap > 2.0 * spread


def test_hlda_differs_from_lda_and_weights_tight_basins(rng):
    """harmonic=False is Fisher LDA; with strongly different class
    covariances the two directions measurably differ, and the harmonic
    one aligns better with the closed form."""
    f, y, (sa, sb, mu_a, mu_b) = _two_gaussians(rng)
    w_h = hlda(f, y).directions[:, 0]
    w_l = hlda(f, y, harmonic=False).directions[:, 0]
    assert abs(w_h @ w_l) < 0.999  # genuinely different estimators
    want = (np.linalg.inv(sa) + np.linalg.inv(sb)) @ (mu_a - mu_b)
    want /= np.linalg.norm(want)
    assert abs(w_h @ want) > abs(w_l @ want)


def test_hlda_three_states(rng):
    """K=3 gives 2 discriminants whose plane separates all classes."""
    mus = np.array([[0.0, 0.0, 0.0], [2.0, 0.0, 0.1], [1.0, 1.8, -0.1]])
    f = np.concatenate([
        rng.normal(size=(3000, 3)) * 0.2 + mus[i] for i in range(3)
    ])
    y = np.repeat([0, 1, 2], 3000)
    r = hlda(f, y)
    assert r.directions.shape == (3, 2)
    z = r.transform(f)
    cm = np.stack([z[y == i].mean(axis=0) for i in range(3)])
    for i in range(3):
        for j in range(i + 1, 3):
            gap = np.linalg.norm(cm[i] - cm[j])
            spread = max(z[y == i].std(), z[y == j].std())
            assert gap > 2.0 * spread


def test_hlda_validation_errors(rng):
    f = rng.normal(size=(20, 3))
    with pytest.raises(ValueError, match="2 distinct"):
        hlda(f, np.zeros(20, int))
    with pytest.raises(ValueError, match="only 2 samples"):
        hlda(f, np.array([0] * 18 + [1] * 2))
    with pytest.raises(ValueError, match="one label per row"):
        hlda(f, np.zeros(19, int))
