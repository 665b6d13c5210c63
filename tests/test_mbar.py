"""MBAR + umbrella sampling: validated against closed forms.

1. Harmonic biases on a standard-normal base: MBAR's window free
   energies have an exact Gaussian-integral answer, and the unbiased
   weights must reproduce the base moments.
2. Umbrella windows along cos(phi) on the toy double well: the
   recombined PMF must match the analytic profile
   F(s) = B(1-s²) + (kT/2)·log(1-s²) + C (potential + Jacobian).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molann_tpu.sampling import mbar, pmf_from_samples, umbrella_sampling


def test_mbar_gaussian_analytic():
    """K harmonic windows on a standard normal: f_k matches the exact
    log partition-function ratios; unbiased weights recover the base
    moments."""
    rng = np.random.default_rng(0)
    kappa = 4.0
    centers = np.array([-1.5, -0.5, 0.5, 1.5, 2.5], np.float32)
    n_per = 4000
    # window k samples: precision (1+kappa), mean kappa*c/(1+kappa)
    prec = 1.0 + kappa
    xs = []
    for c in centers:
        xs.append(rng.normal(kappa * c / prec, 1.0 / np.sqrt(prec),
                             size=n_per))
    x = np.concatenate(xs).astype(np.float32)

    u_kn = 0.5 * kappa * (x[None, :] - centers[:, None]) ** 2
    n_k = np.full(len(centers), n_per)
    f, log_w = mbar(u_kn, n_k)
    f = np.asarray(f)

    # exact: f_k = -log(Z_k/Z_0), Z_k ∝ exp(kappa²c²/(2(1+kappa)) -
    # kappa c²/2) (the sqrt(2pi/prec) prefactor cancels in differences)
    z_exp = (kappa ** 2 * centers ** 2 / (2 * prec)
             - kappa * centers ** 2 / 2)
    f_exact = -(z_exp - z_exp[0])
    np.testing.assert_allclose(f, f_exact, atol=0.1)

    w = np.exp(np.asarray(log_w))
    assert abs(float(np.sum(w))) == pytest.approx(1.0, abs=1e-5)
    mean = float(np.sum(w * x))
    var = float(np.sum(w * x ** 2)) - mean ** 2
    assert abs(mean) < 0.1
    assert abs(var - 1.0) < 0.15


def test_mbar_single_ensemble_uniform_weights():
    """One unbiased ensemble: MBAR must return f=[0] and uniform
    weights."""
    x = np.linspace(-1, 1, 64, dtype=np.float32)
    f, log_w = mbar(np.zeros((1, 64), np.float32), np.array([64]))
    assert float(f[0]) == 0.0
    np.testing.assert_allclose(np.exp(np.asarray(log_w)),
                               np.full(64, 1 / 64), rtol=1e-5)


@pytest.mark.slow
def test_umbrella_mbar_recovers_double_well_pmf():
    """Umbrella windows along s = cos(phi - phi_ref) on the toy double
    well; MBAR-recombined PMF matches the analytic
    F(s) = B(1-s²) + (kT/2)log(1-s²) + C."""
    from molann_tpu.sampling import ToyPeptidePotential, rotate_torsion
    from molann_tpu.systems import alanine_universe

    FREE = (4, 6, 8, 14)
    KT, B, K_SPRING = 0.25, 2.0, 40.0
    u = alanine_universe()
    pot = ToyPeptidePotential(u, free_torsion=FREE, barrier=B)
    phi_ref = float(pot.phi(jnp.asarray(u.atoms.positions[None]))[0])

    def cv(x):
        return jnp.cos(pot.phi(x) - phi_ref)

    centers = np.linspace(-0.95, 0.95, 15).astype(np.float32)
    x0 = np.stack([
        rotate_torsion(u, FREE, float(np.arccos(c))) for c in centers
    ])
    cv_samples, _ = umbrella_sampling(
        pot.energy, cv, jnp.asarray(x0), centers, k_spring=K_SPRING,
        n_steps=20000, dt=1e-3, kT=KT, key=jax.random.PRNGKey(0),
        thin=10, n_equil=300,
    )
    cv_samples = np.asarray(cv_samples)  # [W, T]
    w_count, t_count = cv_samples.shape

    # each window sampled near its own center (restraint works)
    near = np.abs(cv_samples.mean(axis=1) - centers)
    assert near.max() < 0.25

    pooled = cv_samples.reshape(-1)
    u_kn = (0.5 * K_SPRING
            * (pooled[None, :] - centers[:, None]) ** 2) / KT
    f, log_w = mbar(u_kn, np.full(w_count, t_count))

    edges = np.linspace(-0.9, 0.9, 25)
    mids = (edges[1:] + edges[:-1]) / 2
    f_est = pmf_from_samples(pooled, log_w, edges, kT=KT)

    f_true = B * (1 - mids ** 2) + 0.5 * KT * np.log(1 - mids ** 2)
    f_true -= f_true.min()
    ok = np.isfinite(f_est)
    assert ok.sum() >= 20  # nearly all bins populated
    # align the two profiles by their mean offset, then compare shapes
    # (measured 0.14-0.26 max deviation across seeds at this length)
    shift = np.mean(f_est[ok] - f_true[ok])
    err = np.abs(f_est[ok] - f_true[ok] - shift)
    assert err.max() < 0.35, f"PMF deviates by {err.max():.2f} (kT={KT})"
    # the recovered barrier (max-min over the profile) is ~B
    barrier_est = f_est[ok].max() - f_est[ok].min()
    assert abs(barrier_est - (f_true.max() - f_true.min())) < 0.45


def test_pmf_cli(tmp_path, capsys):
    """'molann_tpu pmf' recombines window CV samples into a profile; on
    the analytic Gaussian-window data the PMF is the base parabola."""
    from molann_tpu.cli import main

    rng = np.random.default_rng(1)
    kappa = 4.0
    centers = np.linspace(-1.5, 1.5, 7).astype(np.float32)
    prec = 1.0 + kappa
    cvs = np.stack([
        rng.normal(kappa * c / prec, 1.0 / np.sqrt(prec), 3000)
        for c in centers
    ]).astype(np.float32)
    np.save(tmp_path / "cvs.npy", cvs)
    out = tmp_path / "pmf.npy"
    rc = main([
        "pmf", str(tmp_path / "cvs.npy"),
        "--centers=" + ",".join(f"{c}" for c in centers),
        "--k-spring", f"{kappa}", "--kT", "1.0",
        "--grid=-1.4:1.4:24", "--out", str(out),
    ])
    assert rc == 0
    assert "windows" in capsys.readouterr().out
    mids, f = np.load(out)
    ok = np.isfinite(f)
    # base measure is a standard normal: F(x) = x²/2 + C
    truth = mids ** 2 / 2
    shift = np.mean(f[ok] - truth[ok])
    assert np.abs(f[ok] - truth[ok] - shift).max() < 0.15


def test_umbrella_along_trained_model_cv():
    """umbrella_sampling accepts a MolANN model output as the CV: the
    restraint force differentiates through the full align+feature+MLP
    stack inside the integrator, and each window confines its CV."""
    from molann_tpu.systems import alanine_model
    from molann_tpu.sampling import ToyPeptidePotential

    model, u = alanine_model(hidden_dims=(5, 1))
    pot = ToyPeptidePotential(u, barrier=2.0)

    def cv(x):
        return model(x)[:, 0]

    x0 = jnp.asarray(np.repeat(u.atoms.positions[None], 3, axis=0))
    s0 = float(cv(x0[:1])[0])
    centers = np.asarray([s0 - 0.1, s0, s0 + 0.1], np.float32)
    cvs, _ = umbrella_sampling(
        pot.energy, cv, x0, centers, k_spring=400.0, n_steps=400,
        dt=2e-4, kT=0.25, key=jax.random.PRNGKey(4), thin=10, n_equil=10,
    )
    cvs = np.asarray(cvs)
    assert np.isfinite(cvs).all()
    # windows hold their centers (strong spring): ordered means
    means = cvs.mean(axis=1)
    assert means[0] < means[1] < means[2]
    assert np.abs(means - centers).max() < 0.1


def test_pmf_from_samples_rejects_uncovering_grid(rng):
    """All-empty histograms must raise a clear error, not a zero-size
    reduction ValueError from numpy internals."""
    vals = rng.normal(size=64).astype(np.float32)
    log_w = np.full(64, -np.log(64.0), np.float32)
    with pytest.raises(ValueError, match="no samples fall inside"):
        pmf_from_samples(vals, log_w, np.linspace(50.0, 60.0, 11))
