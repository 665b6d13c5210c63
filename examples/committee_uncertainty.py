"""Committee disagreement flags the unexplored basin BEFORE sampling it.

The adaptive-CV loop (examples/adaptive_cv_loop.py) discovers new basins
by biasing along the current CV and watching the trajectory. A deep
ensemble gives the complementary, cheaper signal: train a COMMITTEE of
CV models on the frames you have (basin A only) and evaluate committee
disagreement — where all members agree the data constrained the model;
where they diverge the model is extrapolating. On alanine the committee
trained purely inside basin A disagrees far more on basin-B frames it
has never seen, so the disagreement map says "sample over there" without
any biased run. This is the standard uncertainty-guided acquisition
recipe (query-by-committee) realized the TPU way: the whole committee
trains in ONE compiled step (``fit_ensemble``, ``jax.vmap`` over stacked
parameters) and costs barely more than a single model on the MXU.

Runs anywhere (CPU included): python examples/committee_uncertainty.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from molann_tpu import (
    FeatureLayer,
    MolANN,
    PreprocessingANN,
    create_sequential_nn,
)
from molann_tpu.sampling import (
    ToyPeptidePotential,
    overdamped_langevin,
    rotate_torsion,
)
from molann_tpu.systems import alanine_histogram_features, alanine_universe
from molann_tpu.train import (autoencoder_loss, calibrated_committee,
                              fit_ensemble)

KT = 0.25
DT = 2e-4
PHI = (4, 6, 8, 14)  # alanine phi backbone dihedral, 0-based


def sample_basin(pot, x0, *, n_steps, key, n_walkers=4, thin=10):
    x0 = jnp.asarray(np.repeat(np.asarray(x0)[None], n_walkers, axis=0))
    traj, _ = overdamped_langevin(
        pot.energy, x0, n_steps=n_steps, dt=DT, kT=KT, key=key, thin=thin,
    )
    return np.asarray(traj).reshape(-1, x0.shape[1], 3)


def make_members(u, n_members, *, n_cv=1, hidden=16, seed=0):
    """K structurally-identical (encoder-as-MolANN, decoder) pairs that
    differ only in their init keys."""
    f_layer = FeatureLayer(alanine_histogram_features(u), u.atoms)
    pp = PreprocessingANN(None, f_layer)
    d = pp.output_dimension()
    members = []
    for i in range(n_members):
        k_enc, k_dec = jax.random.split(jax.random.PRNGKey(seed + 17 * i))
        enc = create_sequential_nn([d, hidden, n_cv], key=k_enc)
        dec = create_sequential_nn([n_cv, hidden, d], key=k_dec)
        members.append((MolANN(pp, enc), dec))
    return members


def ae_loss(member, batch):
    cv_model, dec = member
    return autoencoder_loss(
        cv_model.ann_layers, dec, cv_model.preprocessing_layer, batch
    )


def main(quick=False, n_members=4):
    u = alanine_universe()
    pot = ToyPeptidePotential(u, barrier=5.0)  # 20 kT: basins don't mix
    n_steps = 2000 if quick else 6000
    train_steps = 200 if quick else 600

    # --- frames: training data from basin A only; B is never trained on
    x_a = u.atoms.positions
    x_b = rotate_torsion(u, PHI, np.pi)
    frames_a = sample_basin(pot, x_a, n_steps=n_steps,
                            key=jax.random.PRNGKey(0))
    probe_a = sample_basin(pot, x_a, n_steps=n_steps // 2,
                           key=jax.random.PRNGKey(1))   # held out
    probe_b = sample_basin(pot, x_b, n_steps=n_steps // 2,
                           key=jax.random.PRNGKey(2))   # unexplored basin
    cos_a = np.cos(np.asarray(pot.phi(jnp.asarray(probe_a))))
    cos_b = np.cos(np.asarray(pot.phi(jnp.asarray(probe_b))))
    print(f"training/probe A: cos(phi) ~ {cos_a.mean():+.2f}; "
          f"probe B: cos(phi) ~ {cos_b.mean():+.2f} (never trained on)")

    # --- committee: K autoencoder CVs, one compiled step for all -------
    def batches(batch_size=256, seed=1):
        rng = np.random.default_rng(seed)
        for _ in range(train_steps):
            idx = rng.integers(0, len(frames_a), size=batch_size)
            yield jnp.asarray(frames_a[idx])

    result = fit_ensemble(
        make_members(u, n_members), ae_loss, batches(),
        optimizer=optax.adam(2e-3), bagging=True, seed=3,
    )
    losses = np.asarray(result.losses)
    print(f"committee of {n_members}: loss {losses[0].mean():.4f} -> "
          f"{losses[-1].mean():.4f} (member spread "
          f"{losses[-1].std():.4f})")

    # --- disagreement: low where trained, high in the unseen basin -----
    # autoencoder CVs are only defined up to sign/scale, so raw committee
    # std is gauge noise; calibrate each member on the TRAINING frames
    # (standardize + sign-align) and measure disagreement after that.
    stacked_cv = result.models[0]   # the stacked encoder-as-MolANN
    x_ref = jnp.asarray(frames_a)
    _, std_a = calibrated_committee(stacked_cv, jnp.asarray(probe_a), x_ref)
    _, std_b = calibrated_committee(stacked_cv, jnp.asarray(probe_b), x_ref)
    std_a = float(jnp.mean(std_a))
    std_b = float(jnp.mean(std_b))
    ratio = std_b / max(std_a, 1e-12)
    print(f"committee disagreement: basin A (trained) {std_a:.4f}, "
          f"basin B (unexplored) {std_b:.4f} -> ratio {ratio:.1f}x")
    print("the committee flags basin B as unexplored WITHOUT any biased "
          "run — the acquisition signal for adaptive sampling"
          if ratio > 2 else "WARNING: weak separation")
    return {"std_a": std_a, "std_b": std_b, "ratio": ratio,
            "losses": losses}


if __name__ == "__main__":
    main()
