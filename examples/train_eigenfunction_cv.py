"""End-to-end example: learn collective variables as generator
eigenfunctions — the second CV-learning method of the reference's
research ecosystem (zwpku/molann README.rst:51, "adaptive learning of
reaction coordinates"; the variational eigenfunction approach of the
Zhang/Li/Schütte line of work), run fully in-framework:

1. sample BOTH basins of the toy alanine potential with well-tempered
   metadynamics along the known phi dihedral (data generation only —
   the trained model never sees phi);
2. reweight the biased trajectory to the unbiased Boltzmann measure
   (MetadBias.frame_weights) — the eigenfunction loss consumes the
   weights directly, so biased data trains UNBIASED eigenfunctions;
3. minimize the variational loss: sum of Rayleigh quotients
   (1/beta)·E[|grad f_i|^2] under decreasing weights + an
   orthonormality penalty. Output 0 learns the SLOWEST mode — the
   interbasin reaction coordinate — and the Rayleigh quotients
   estimate the generator eigenvalues, whose gap separates the slow
   hopping mode from fast intra-basin relaxation.

Runs anywhere (CPU included): python examples/train_eigenfunction_cv.py
See examples/train_autoencoder_cv.py for the autoencoder objective and
tests/test_train.py::test_eigenfunction_loss_recovers_ou_spectrum for
the analytic (Ornstein-Uhlenbeck) check of the same loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from molann_tpu import (
    Feature,
    FeatureLayer,
    MolANN,
    PreprocessingANN,
    create_sequential_nn,
)
from molann_tpu.sampling import ToyPeptidePotential, metadynamics_langevin
from molann_tpu.systems import alanine_histogram_features, alanine_universe
from molann_tpu.train import eigenfunction_loss, fit, make_eigenfunction_loss

KT = 0.25
DT = 2e-4
BARRIER = 0.75  # 3 kT — low enough that basin B carries real weight


def _weighted_corr(a, b, w):
    w = w / w.sum()
    a = a - (w * a).sum()
    b = b - (w * b).sum()
    return float((w * a * b).sum()
                 / np.sqrt((w * a * a).sum() * (w * b * b).sum()))


def main(quick=False):
    u = alanine_universe()
    pot = ToyPeptidePotential(u, barrier=BARRIER)

    # --- 1. both-basin data: WT metadynamics along the known phi -------
    ag = (u.select_atoms("bynum 5") + u.select_atoms("bynum 7")
          + u.select_atoms("bynum 9") + u.select_atoms("bynum 15"))
    phi_cossin = PreprocessingANN(
        None, FeatureLayer([Feature("phi", "dihedral", ag)], u.atoms)
    )
    n_walkers, n_steps = 6, (16000 if quick else 20000)
    x0 = jnp.asarray(np.repeat(u.atoms.positions[None], n_walkers, axis=0))
    traj, _, bias = metadynamics_langevin(
        pot.energy, phi_cossin, x0, n_steps=n_steps, dt=DT, kT=KT,
        key=jax.random.PRNGKey(0), height=0.5, sigma=0.3, stride=50,
        well_tempered_gamma=1.0 + 3.0 / KT,
    )
    frames = np.asarray(traj).reshape(-1, 22, 3)
    phi = np.asarray(pot.phi(jnp.asarray(frames)))
    cos_phi = np.cos(phi)
    assert (cos_phi > 0.5).any(), "metadynamics should reach basin B"

    # --- 2. reweight to the unbiased Boltzmann measure -----------------
    z = np.asarray(phi_cossin(jnp.asarray(frames)))
    w = np.asarray(bias.frame_weights(z, KT))
    ess = float(w.sum() ** 2 / (w**2).sum())
    pop_b = float(w[cos_phi > 0].sum() / w.sum())
    print(f"{len(frames)} biased frames, effective sample size {ess:.0f}; "
          f"reweighted basin-B population {pop_b:.1%}")

    # --- 3. train 2 eigenfunctions on invariant features ---------------
    pp = PreprocessingANN(
        None, FeatureLayer(alanine_histogram_features(u), u.atoms)
    )
    model = MolANN(
        pp,
        create_sequential_nn([pp.output_dimension(), 24, 2],
                             key=jax.random.PRNGKey(1)),
    )
    loss_fn = make_eigenfunction_loss(beta=1.0 / KT, alpha=50.0)

    def batches(batch_size=1024, seed=1):
        rng = np.random.default_rng(seed)
        while True:
            i = rng.integers(0, len(frames), batch_size)
            yield jnp.asarray(frames[i]), jnp.asarray(w[i])

    res = fit(model, loss_fn, batches(), optimizer=optax.adam(2e-3),
              num_steps=(1000 if quick else 1500), log_every=500)
    model = res.model
    print(f"variational loss: {res.losses[0]:.2f} -> {res.losses[-1]:.2f}")

    # --- 4. spectrum + mode structure ----------------------------------
    _, aux = eigenfunction_loss(
        model, jnp.asarray(frames), weights=jnp.asarray(w),
        beta=1.0 / KT, alpha=50.0, return_aux=True,
    )
    eigs = np.asarray(aux["eigenvalues"])
    print(f"estimated generator eigenvalues: {eigs[0]:.3f} (slow, "
          f"interbasin) vs {eigs[1]:.3f} — spectral gap "
          f"{eigs[1] / eigs[0]:.1f}x")
    zcv = np.asarray(model(jnp.asarray(frames)))
    basin = (cos_phi > 0).astype(float)
    # orthonormality (and the whole loss) lives in the REWEIGHTED
    # unbiased measure, so the diagnostics must be weighted too — the
    # unweighted correlation over the biased ensemble can look high even
    # when <f0, f1>_mu = 0 exactly
    corr_basin = _weighted_corr(zcv[:, 0], basin, w)
    corr_cvs = _weighted_corr(zcv[:, 0], zcv[:, 1], w)
    print(f"CV0 vs basin indicator: corr {corr_basin:+.2f} "
          f"(the hopping mode); CV0 vs CV1 corr {corr_cvs:+.2f} "
          f"(orthonormality)")
    return {
        "eigenvalues": eigs.tolist(),
        "gap": float(eigs[1] / eigs[0]),
        "corr_basin": corr_basin,
        "corr_cvs": corr_cvs,
        "ess": ess,
        "pop_b": pop_b,
    }


if __name__ == "__main__":
    main()
