"""Markov state models against analytic chain oracles.

A trajectory generated from a KNOWN transition matrix must give back
that matrix, its stationary distribution, and its relaxation timescales;
a reversible chain's MLE must satisfy detailed balance exactly; hiding a
state behind a coarse discretization must fail the Chapman-Kolmogorov
test that the faithful discretization passes.
"""

import numpy as np
import pytest

from molann_tpu.sampling import (
    ck_test,
    count_matrix,
    estimate_msm,
    grid_assign,
    transition_matrix,
)

# a reversible 3-state chain: metastable pair (0, 1) + a fast state 2
T_TRUE = np.array([
    [0.97, 0.02, 0.01],
    [0.01, 0.96, 0.03],
    [0.02, 0.12, 0.86],
])


def _stationary(t):
    w, v = np.linalg.eig(t.T)
    pi = np.abs(v[:, np.argmax(w.real)].real)
    return pi / pi.sum()


def _sample_chain(t, n, seed=0, s0=0):
    rng = np.random.default_rng(seed)
    cum = np.cumsum(t, axis=1)
    s = np.empty(n, np.int64)
    s[0] = s0
    u = rng.random(n)
    for i in range(1, n):
        s[i] = np.searchsorted(cum[s[i - 1]], u[i])
    return s


@pytest.fixture(scope="module")
def chain():
    return _sample_chain(T_TRUE, 200_000)


def test_recovers_transition_matrix(chain):
    m = estimate_msm(chain, 3, lag=1)
    np.testing.assert_allclose(m.transition, T_TRUE, atol=0.01)
    # pi converges at the SLOW timescale (~40 steps -> ~5k independent
    # samples): 2-3 sigma is ~0.02
    np.testing.assert_allclose(m.pi, _stationary(T_TRUE), atol=0.025)


def test_reversible_mle_detailed_balance(chain):
    m = estimate_msm(chain, 3, lag=1, reversible=True)
    flux = m.pi[:, None] * m.transition
    np.testing.assert_allclose(flux, flux.T, atol=1e-12)
    # non-reversible estimate on reversible data agrees
    m2 = estimate_msm(chain, 3, lag=1, reversible=False)
    np.testing.assert_allclose(m.transition, m2.transition, atol=0.01)


def test_timescales_match_eigenvalues(chain):
    lam_true = np.sort(np.abs(np.linalg.eigvals(T_TRUE)))[::-1][1:]
    ts_true = -1.0 / np.log(lam_true)
    m = estimate_msm(chain, 3, lag=1)
    np.testing.assert_allclose(m.timescales(), ts_true, rtol=0.15)
    # implied timescales are lag-consistent for a true Markov chain
    m5 = estimate_msm(chain, 3, lag=5)
    assert m5.timescales()[0] == pytest.approx(ts_true[0], rel=0.2)


def test_multiple_trajectories_and_guards(chain):
    half = len(chain) // 2
    c_split = count_matrix([chain[:half], chain[half:]], 3, 1)
    c_full = count_matrix(chain, 3, 1)
    # one pair lost at the split point, none across series
    assert abs(c_split.sum() - (c_full.sum() - 1)) < 0.5
    with pytest.raises(ValueError, match="lag"):
        count_matrix(chain, 3, 0)
    with pytest.raises(ValueError, match="labels"):
        count_matrix(np.array([0, 3]), 3, 1)
    with pytest.raises(ValueError, match="square"):
        transition_matrix(np.zeros((2, 3)))


def test_empty_state_gets_self_loop():
    s = np.array([0, 1, 0, 1, 1, 0])
    t, pi = transition_matrix(count_matrix(s, 3, 1))
    assert t[2, 2] == 1.0 and pi[2] == 0.0
    np.testing.assert_allclose(t.sum(axis=1), 1.0)


def test_grid_assign_1d_and_2d():
    edges = np.array([0.0, 1.0, 2.0, 3.0])
    vals = np.array([-0.5, 0.5, 1.5, 2.5, 3.5])
    np.testing.assert_array_equal(grid_assign(vals, [edges]),
                                  [0, 0, 1, 2, 2])  # clamped outside
    v2 = np.array([[0.5, 0.5], [2.5, 0.5], [0.5, 2.5]])
    lab = grid_assign(v2, [edges, edges])
    np.testing.assert_array_equal(lab, [0, 6, 2])
    with pytest.raises(ValueError, match="edge arrays"):
        grid_assign(v2, [edges])


def test_ck_test_markov_vs_hidden_state():
    # a chain whose exit rate to state 2 depends 100x on the hidden
    # position within the metastable pair (0, 1)
    t_hidden = np.array([
        [0.989, 0.010, 0.001],
        [0.010, 0.890, 0.100],
        [0.020, 0.100, 0.880],
    ])
    c = _sample_chain(t_hidden, 200_000, seed=3)
    # faithful 3-state discretization: CK holds
    errs = ck_test(c, 3, lag=1, factors=(2, 5))
    assert max(errs.values()) < 0.02
    # lump the metastable pair: the 2-state model hides the slow process
    # behind a memoryful macrostate and CK degrades by an order of
    # magnitude
    lumped = np.where(c == 2, 1, 0)
    errs_bad = ck_test(lumped, 2, lag=1, factors=(5,))
    assert errs_bad[5] > 5 * max(errs.values())


def test_msm_on_continuous_ou_cv():
    """Full pipeline shape: continuous CV series -> grid_assign ->
    MSM; a two-bin MSM over a symmetric AR(1) recovers sign-flip
    kinetics (analytic flip probability per step)."""
    rng = np.random.default_rng(1)
    a = 0.95
    z = np.empty(100_000)
    z[0] = 0.0
    for t in range(1, len(z)):
        z[t] = a * z[t - 1] + np.sqrt(1 - a * a) * rng.normal()
    labels = grid_assign(z, [np.array([-10.0, 0.0, 10.0])])
    m = estimate_msm(labels, 2, lag=1)
    # flip probability of a stationary AR(1) sign process:
    # P(flip) = arccos(a) / pi  (orthant probability of a bivariate
    # normal with correlation a)
    p_flip = np.arccos(a) / np.pi
    assert m.transition[0, 1] == pytest.approx(p_flip, rel=0.1)
    assert m.transition[1, 0] == pytest.approx(p_flip, rel=0.1)
    np.testing.assert_allclose(m.pi, [0.5, 0.5], atol=0.02)
