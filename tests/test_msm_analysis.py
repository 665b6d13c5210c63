"""MSM analysis layers: mean first-passage times (analytic oracles) and
PCCA+ metastable coarse-graining (block-structured chain oracle)."""

import numpy as np
import pytest

from molann_tpu.sampling import (
    coarse_grain,
    estimate_msm,
    mfpt,
    pcca_memberships,
)


def test_mfpt_two_state_analytic():
    """T = [[1-p, p], [q, 1-q]]: the first-passage time 0 -> 1 is
    geometric with mean lag/p (and 1 -> 0 is lag/q)."""
    p, q = 0.2, 0.05
    t = np.array([[1 - p, p], [q, 1 - q]])
    m = mfpt(t, [1], lag=3.0)
    assert m[1] == 0.0
    assert m[0] == pytest.approx(3.0 / p)
    m = mfpt(t, [0], lag=1.0)
    assert m[1] == pytest.approx(1.0 / q)


def test_mfpt_birth_death_chain():
    """Symmetric random walk on 0..4 with reflecting ends, target 4:
    matches a brute-force dense solve of the same linear system."""
    n = 5
    t = np.zeros((n, n))
    for i in range(n):
        if i > 0:
            t[i, i - 1] = 0.5
        if i < n - 1:
            t[i, i + 1] = 0.5
    t[0, 0] = 0.5
    t[n - 1, n - 1] = 0.5
    m = mfpt(t, [n - 1])
    # brute force: m = 1 + T m on non-targets
    keep = np.arange(n - 1)
    a = np.eye(n - 1) - t[np.ix_(keep, keep)]
    want = np.linalg.solve(a, np.ones(n - 1))
    np.testing.assert_allclose(m[:-1], want, rtol=1e-10)
    assert m[-1] == 0.0
    # symmetric walk from the far end: classic ~n^2 scaling, m[0] > m[2]
    assert m[0] > m[2] > 0


def test_mfpt_rejects_bad_targets():
    """Out-of-range targets must error (a negative CLI index would
    silently numpy-wrap to the LAST state), and empty target sets too."""
    t = np.full((3, 3), 1.0 / 3.0)
    with pytest.raises(ValueError, match=r"in \[0, 2\].*-1"):
        mfpt(t, [-1])
    with pytest.raises(ValueError, match=r"in \[0, 2\].*5"):
        mfpt(t, [0, 5])
    with pytest.raises(ValueError, match="at least one"):
        mfpt(t, [])


def test_mfpt_unreachable_states_get_inf():
    """A self-loop placeholder state (never visited) must come back inf,
    not crash the solve or poison other states."""
    t = np.array([
        [0.9, 0.1, 0.0],
        [0.2, 0.8, 0.0],
        [0.0, 0.0, 1.0],  # absorbing placeholder, no path to target
    ])
    m = mfpt(t, [1], lag=2.0)
    assert m[1] == 0.0 and np.isinf(m[2])
    assert m[0] == pytest.approx(2.0 / 0.1)
    with pytest.raises(ValueError, match="at least one"):
        mfpt(t, [])


def _block_chain(eps, sizes=(2, 2, 2)):
    """Metastable chain: uniform mixing inside each block, probability
    eps of hopping to a neighboring block."""
    n = sum(sizes)
    t = np.zeros((n, n))
    starts = np.cumsum((0,) + sizes)
    for b, (s, e) in enumerate(zip(starts[:-1], starts[1:])):
        inside = np.full((e - s, e - s), (1.0 - 2 * eps) / (e - s))
        t[s:e, s:e] = inside
        left = starts[b - 1] if b > 0 else s
        right = starts[b + 1] if b + 1 < len(sizes) else s
        t[s:e, left] += eps
        t[s:e, right] += eps
    return t / t.sum(axis=1, keepdims=True)


def test_pcca_recovers_metastable_blocks():
    t = _block_chain(1e-3)
    chi = pcca_memberships(t, 3)
    assert chi.shape == (6, 3)
    np.testing.assert_allclose(chi.sum(axis=1), 1.0, atol=1e-10)
    assign = chi.argmax(axis=1)
    # states pair up exactly into the three blocks
    assert assign[0] == assign[1]
    assert assign[2] == assign[3]
    assert assign[4] == assign[5]
    assert len({assign[0], assign[2], assign[4]}) == 3
    # memberships are crisp for a strongly metastable chain
    assert chi.max(axis=1).min() > 0.95


def test_coarse_grain_block_chain():
    """The PCCA+-projected coarse matrix is row-stochastic, keeps the
    slow eigenvalues of the fine model, and its stationary weights are
    the block sums."""
    t = _block_chain(2e-3)
    # stationary pi of the fine chain
    w, v = np.linalg.eig(t.T)
    pi = np.abs(v[:, np.argmax(w.real)].real)
    pi = pi / pi.sum()
    chi = pcca_memberships(t, 3)
    tc, pic = coarse_grain(t, pi, chi)
    assert tc.shape == (3, 3)
    np.testing.assert_allclose(tc.sum(axis=1), 1.0, atol=1e-8)
    np.testing.assert_allclose(sorted(pic), sorted(
        [pi[:2].sum(), pi[2:4].sum(), pi[4:].sum()]), atol=1e-3)
    fine = np.sort(np.linalg.eigvals(t).real)[-3:]
    coarse = np.sort(np.linalg.eigvals(tc).real)
    np.testing.assert_allclose(coarse, fine, atol=1e-4)


def test_msm_methods_end_to_end(rng):
    """MSM.mfpt / metastable_sets / coarse_grain over labels sampled
    from a known two-block chain."""
    t_true = _block_chain(5e-3, sizes=(2, 2))
    # sample a long trajectory from the true chain
    labels = np.zeros(60_000, np.int64)
    r = rng.random(len(labels) - 1)
    cum = np.cumsum(t_true, axis=1)
    for i in range(len(labels) - 1):
        labels[i + 1] = np.searchsorted(cum[labels[i]], r[i])
    m = estimate_msm(labels, 4, lag=1)
    assign, chi = m.metastable_sets(2)
    assert assign[0] == assign[1] and assign[2] == assign[3]
    assert assign[0] != assign[2]
    fp = m.mfpt(np.flatnonzero(assign == assign[2]))
    assert np.isfinite(fp[0]) and fp[0] > 10  # rare block hop
    tc, pic, _ = m.coarse_grain(2)
    np.testing.assert_allclose(tc.sum(axis=1), 1.0, atol=1e-8)
    assert pic == pytest.approx([0.5, 0.5], abs=0.1)


# ------------------------------------------------------------ bootstrap


def _two_state_series(p, n, rng):
    """Symmetric two-state chain with flip probability p (timescale
    -1/log(1-2p) frames at lag 1)."""
    flips = rng.random(n) < p
    return np.cumsum(flips) % 2


def test_bootstrap_msm_trajectory_resampling_covers_truth():
    from molann_tpu.sampling import bootstrap_msm

    p = 0.05
    true_ts = -1.0 / np.log(1.0 - 2.0 * p)
    rng = np.random.default_rng(0)
    series = [_two_state_series(p, 4000, rng) for _ in range(20)]
    boot = bootstrap_msm(series, 2, 1, n_samples=60, n_timescales=1,
                         seed=1)
    assert boot.timescales.shape == (60, 1)
    assert boot.pi.shape == (60, 2)
    lo, hi = boot.timescale_ci()
    assert lo[0] < true_ts < hi[0]
    assert np.isfinite(boot.timescales).all()
    # the symmetric chain's populations are ~1/2 with a tight CI
    pi_lo, pi_hi = boot.pi_ci()
    assert 0.45 < pi_lo[0] < pi_hi[0] < 0.55
    assert pi_hi[0] - pi_lo[0] < 0.05
    assert boot.n_resampled == 20 and boot.block == 0


def test_bootstrap_msm_single_trajectory_blocks():
    from molann_tpu.sampling import bootstrap_msm

    p = 0.05
    true_ts = -1.0 / np.log(1.0 - 2.0 * p)
    rng = np.random.default_rng(3)
    s = _two_state_series(p, 80_000, rng)
    boot = bootstrap_msm(s, 2, 1, n_samples=50, n_timescales=2, seed=2)
    assert boot.block >= 10  # 10*lag floor
    lo, hi = boot.timescale_ci()
    # the CI quantifies resampling variance around THIS realization's
    # estimate: it must bracket the full-series point estimate exactly,
    # and the truth within the estimator's own sampling error (~2%)
    point = estimate_msm(s, 2, 1).timescales()[0]
    assert lo[0] < point < hi[0]
    assert lo[0] * 0.98 < true_ts < hi[0] * 1.02
    # intervals must be informative, not degenerate or huge
    assert 0 < (hi[0] - lo[0]) < true_ts
    # a 2-state chain has only 1 relaxation timescale: the 2nd is inf
    assert np.isinf(boot.timescales[:, 1]).all()


def test_bootstrap_msm_validation():
    from molann_tpu.sampling import bootstrap_msm

    with pytest.raises(ValueError, match="n_samples"):
        bootstrap_msm(np.zeros(100, np.int64), 2, 1, n_samples=1)
    with pytest.raises(ValueError, match="shorter than"):
        bootstrap_msm(np.zeros(8, np.int64), 2, 1, n_samples=5)


def test_bootstrap_msm_rare_state_resamples():
    """Resamples that miss a rare state keep pi=0 there instead of
    blowing up."""
    from molann_tpu.sampling import bootstrap_msm

    rng = np.random.default_rng(4)
    s = rng.integers(0, 2, size=5000)
    s[100:103] = 2  # one rare visit to state 2
    boot = bootstrap_msm(s, 3, 1, n_samples=25, seed=5, block=200)
    assert np.isfinite(boot.pi).all()
    assert (boot.pi[:, 2] == 0.0).any()  # some resamples miss it
    np.testing.assert_allclose(boot.pi.sum(axis=1), 1.0, atol=1e-9)
