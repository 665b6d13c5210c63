"""Transition path theory against exactly solvable chains.

Oracles: the gambler's-ruin committor (linear for a symmetric walk),
two-state rate algebra, flux conservation across 1-D cuts, and a
two-channel network whose pathway decomposition is known by
construction.
"""

import numpy as np
import pytest

from molann_tpu.sampling import estimate_msm, forward_committor, tpt


def _birth_death(n, p=0.5):
    """Reflecting birth-death chain: right prob p, left 1-p inside."""
    t = np.zeros((n, n))
    for i in range(1, n - 1):
        t[i, i + 1] = p
        t[i, i - 1] = 1.0 - p
    t[0, 1] = 1.0
    t[n - 1, n - 2] = 1.0
    return t


def _stationary(t):
    w, v = np.linalg.eig(t.T)
    pi = np.abs(v[:, np.argmax(w.real)].real)
    return pi / pi.sum()


def test_committor_is_linear_for_symmetric_walk():
    n = 11
    t = _birth_death(n)
    q = forward_committor(t, [0], [n - 1])
    np.testing.assert_allclose(q, np.arange(n) / (n - 1), atol=1e-10)


def test_backward_committor_complements_forward_for_reversible():
    n = 9
    t = _birth_death(n, p=0.7)  # biased but still reversible (1-D chain)
    r = tpt(t, _stationary(t), [0], [n - 1])
    np.testing.assert_allclose(r.q_minus, 1.0 - r.q_plus, atol=1e-9)


def test_flux_is_conserved_across_every_cut():
    n = 9
    t = _birth_death(n, p=0.35)
    r = tpt(t, _stationary(t), [0], [n - 1])
    for i in range(n - 1):
        cut = r.net_flux[: i + 1, i + 1 :].sum()
        assert cut == pytest.approx(r.total_flux, rel=1e-9)


def test_two_state_rate_is_exact():
    a, b = 0.03, 0.12
    t = np.array([[1 - a, a], [b, 1 - b]])
    pi = np.array([b, a]) / (a + b)
    r = tpt(t, pi, [0], [1], lag=2.0)
    # q+=[0,1], q-=[1,0]: F = pi_0 a, denom = lag * pi_0 -> rate = a/lag
    assert r.rate == pytest.approx(a / 2.0, rel=1e-12)
    assert r.total_flux == pytest.approx(pi[0] * a, rel=1e-12)


def test_pathway_decomposition_finds_both_channels():
    # A=0 -> {1 strong, 2 weak} -> B=3
    t = np.array([
        [0.70, 0.24, 0.06, 0.00],
        [0.30, 0.40, 0.00, 0.30],
        [0.30, 0.00, 0.40, 0.30],
        [0.10, 0.15, 0.05, 0.70],
    ])
    assert np.allclose(t.sum(1), 1.0)
    pi = _stationary(t)
    r = tpt(t, pi, [0], [3])
    paths = r.pathways(n_paths=4)
    assert [p for p, _ in paths[:2]] == [[0, 1, 3], [0, 2, 3]]
    assert paths[0][1] > paths[1][1] > 0
    assert sum(f for _, f in paths) == pytest.approx(r.total_flux,
                                                     rel=1e-6)


def test_placeholder_states_are_harmless():
    # grid MSMs pad never-visited bins with self-loops and pi = 0
    n = 6
    t = np.eye(n)
    t[:4, :4] = _birth_death(4, p=0.5)
    pi = np.zeros(n)
    pi[:4] = _stationary(_birth_death(4))
    r = tpt(t, pi, [0], [3])
    assert np.isfinite(r.rate) and r.rate > 0
    assert r.q_plus[4] == 0.0 and r.flux[4].sum() == 0.0
    q = forward_committor(t, [0], [3])
    np.testing.assert_allclose(q[:4], np.arange(4) / 3, atol=1e-10)


def test_msm_integration_and_validation():
    rng = np.random.default_rng(0)
    # sample a biased birth-death chain long enough to estimate it
    t_true = _birth_death(5, p=0.6)
    s, states = 0, [0]
    for _ in range(20000):
        s = rng.choice(5, p=t_true[s])
        states.append(s)
    m = estimate_msm(np.array(states), 5, lag=1)
    r = m.tpt([0], [4])
    exact = tpt(t_true, _stationary(t_true), [0], [4])
    assert r.rate == pytest.approx(exact.rate, rel=0.2)
    assert r.lag == m.lag
    with pytest.raises(ValueError, match="overlap"):
        tpt(t_true, _stationary(t_true), [0, 1], [1, 4])
    with pytest.raises(ValueError, match="at least one"):
        forward_committor(t_true, [], [4])
    with pytest.raises(ValueError, match="outside"):
        forward_committor(t_true, [0], [7])
