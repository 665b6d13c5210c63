"""Adaptive learning of reaction coordinates — the reference's flagship
downstream workflow (zwpku/molann README.rst:51, "used in research
works ... adaptive learning of reaction coordinates"), run end-to-end
in-framework with NO prior knowledge of the second basin:

1. unbiased Langevin sampling is trapped in basin A; an autoencoder CV
   is trained on those trapped frames alone — its leading mode is the
   softest in-basin direction, which on this system is the free
   torsion itself;
2. adaptive rounds: well-tempered metadynamics along the CURRENT CV,
   then retrain the CV on everything sampled so far. A CV trained on
   one basin saturates at the basin edge (tanh flattens outside the
   training range, so the biasing force dies there) — each round's
   bias pushes to where the previous CV still has gradient, and the
   retrained CV extends further. Escape typically happens in round 2:
   the bias DISCOVERS basin B that no training frame ever visited;
3. the final round's byproducts give the unbiased statistics: the
   hills reconstruct the free-energy profile along the CV
   (MetadBias.free_energy_estimate) and last-bias reweighting
   (MetadBias.frame_weights) recovers unbiased basin populations from
   the biased trajectory. The well-tempered trajectory itself samples
   the tempered (flattened) ensemble, so uniform weights give the
   retraining data both-basin coverage.

Runs anywhere (CPU included): python examples/adaptive_cv_loop.py
See examples/biased_dynamics.py for the single-shot (steered-MD
bootstrapped) variant and tests/test_sampling.py for the physics checks
behind each step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from molann_tpu import FeatureLayer, MolANN, PreprocessingANN, \
    create_sequential_nn
from molann_tpu.sampling import (
    ToyPeptidePotential,
    metadynamics_langevin,
    overdamped_langevin,
)
from molann_tpu.systems import alanine_histogram_features, alanine_universe
from molann_tpu.train import autoencoder_loss, fit

KT = 0.25
DT = 2e-4


def train_cv(u, frames, *, n_cv=1, num_steps=400, seed=0):
    """Autoencoder CV on invariant features (same recipe as
    examples/biased_dynamics.py / train_autoencoder_cv.py)."""
    f_layer = FeatureLayer(alanine_histogram_features(u), u.atoms)
    pp = PreprocessingANN(None, f_layer)
    d = pp.output_dimension()
    k_enc, k_dec = jax.random.split(jax.random.PRNGKey(seed))
    pair = (create_sequential_nn([d, 16, n_cv], key=k_enc),
            create_sequential_nn([n_cv, 16, d], key=k_dec))

    def loss_fn(p, batch):
        return autoencoder_loss(p[0], p[1], pp, batch)

    def batches(batch_size=256, seed=1):
        rng = np.random.default_rng(seed)
        while True:
            yield jnp.asarray(frames[rng.integers(0, len(frames),
                                                  batch_size)])

    result = fit(pair, loss_fn, batches(), optimizer=optax.adam(2e-3),
                 num_steps=num_steps,
                 mask=jax.tree_util.tree_map(lambda _: True, pair))
    encoder, _ = result.model
    return MolANN(pp, encoder), result.losses


def separation(cv_model, frames_a, frames_b):
    """Basin separation score of a 1-d CV: |mean gap| / max in-basin
    spread on held-out frames from each basin."""
    za = np.asarray(cv_model(jnp.asarray(frames_a)))[:, 0]
    zb = np.asarray(cv_model(jnp.asarray(frames_b)))[:, 0]
    return abs(za.mean() - zb.mean()) / max(za.std(), zb.std(), 1e-9)


def main(quick=False, n_rounds=3):
    u = alanine_universe()
    pot = ToyPeptidePotential(u, barrier=5.0)  # 20 kT
    n_walkers = 4
    train_steps = 150 if quick else 400
    n_metad = 10000 if quick else 12000
    x0 = jnp.asarray(np.repeat(u.atoms.positions[None], n_walkers, axis=0))

    # --- 1. trapped unbiased data + initial CV -------------------------
    n_unbiased = 2000 if quick else 6000
    traj_u, _ = overdamped_langevin(
        pot.energy, x0, n_steps=n_unbiased, dt=DT, kT=KT,
        key=jax.random.PRNGKey(0), thin=10,
    )
    frames0 = np.asarray(traj_u).reshape(-1, 22, 3)
    frames = frames0
    cos_u = np.cos(np.asarray(pot.phi(jnp.asarray(frames))))
    print(f"unbiased: cos(phi) in [{cos_u.min():+.2f}, {cos_u.max():+.2f}]"
          f" — trapped in basin A")
    cv_model, losses = train_cv(u, frames, num_steps=train_steps, seed=0)
    cv0 = cv_model
    print(f"CV (round 0, basin-A data only): loss "
          f"{losses[0]:.4f} -> {losses[-1]:.4f}")

    # --- 2. adaptive rounds: bias along current CV, retrain ------------
    gamma = 1.0 + pot.barrier / KT
    escaped_round = None
    bias = frames1 = cos_b = cv_bias = None
    for rnd in range(1, n_rounds + 1):
        # hill width tracks the IN-BASIN fluctuation of the current CV
        # (its global std balloons once biased frames enter the
        # training set — hills wider than the CV range exert no force)
        z_basin = np.asarray(cv_model(jnp.asarray(frames0)))[:, 0]
        sigma = max(5.0 * z_basin.std(), 1e-3)
        cv_bias = cv_model  # the model whose CV space the hills live in
        traj_b, _, bias = metadynamics_langevin(
            pot.energy, cv_model, x0, n_steps=n_metad, dt=DT, kT=KT,
            key=jax.random.PRNGKey(100 + rnd), height=2.0 * KT,
            sigma=sigma, stride=50, well_tempered_gamma=gamma,
        )
        frames1 = np.asarray(traj_b).reshape(-1, 22, 3)
        cos_b = np.cos(np.asarray(pot.phi(jnp.asarray(frames1))))
        escaped = bool(cos_b.max() > 0.5)
        print(f"round {rnd}: WT metadynamics along current CV reaches "
              f"cos(phi) {cos_b.max():+.2f}"
              + (" — DISCOVERED basin B" if escaped else
                 " — basin edge, retraining with the new frames"))
        frames = np.concatenate([frames, frames1])
        cv_model, losses = train_cv(u, frames, num_steps=train_steps,
                                    seed=0)
        print(f"  retrained CV on {len(frames)} frames: loss "
              f"{losses[0]:.4f} -> {losses[-1]:.4f}")
        if escaped and escaped_round is None:
            escaped_round = rnd
        if escaped:
            break

    # --- 3. evaluate: does the final CV separate the basins? -----------
    probe_a = frames1[cos_b < -0.5][:200]
    has_b = bool((cos_b > 0.5).any())
    probe_b = frames1[cos_b > 0.5][:200] if has_b else probe_a
    sep0 = separation(cv0, probe_a, probe_b)
    sep1 = separation(cv_model, probe_a, probe_b)
    print(f"basin separation |gap|/spread on held-out frames: "
          f"round-0 CV {sep0:.2f} -> final CV {sep1:.2f}")

    # --- 4. unbiased statistics from the last biased round -------------
    # (hills live in the CV space of the model that deposited them —
    # cv_bias, the one before the final retrain)
    z1 = np.asarray(cv_bias(jnp.asarray(frames1)))
    grid = np.linspace(z1.min(), z1.max(), 60)[:, None]
    fes = np.array(bias.free_energy_estimate(grid))
    fes -= fes.min()
    tail = z1[len(z1) // 2:]
    w = np.asarray(bias.frame_weights(tail, KT))
    cos_tail = cos_b[len(cos_b) // 2:]
    in_b = cos_tail > 0.0
    pop_b_biased = float(in_b.mean())
    pop_b = float(w[in_b].sum() / w.sum()) if in_b.any() else 0.0
    print(f"FES along the biasing CV: barrier estimate {fes.max():.2f} "
          f"({fes.max() / KT:.0f} kT)")
    print(f"basin-B population: {pop_b_biased:.1%} raw biased -> "
          f"{pop_b:.2%} reweighted (unbiased ensemble)")
    return {
        "escaped": escaped_round is not None,
        "escaped_round": escaped_round,
        "cos_unbiased_max": float(cos_u.max()),
        "cos_biased_max": float(cos_b.max()),
        "sep0": float(sep0),
        "sep1": float(sep1),
        "fes_barrier": float(fes.max()),
        "pop_b_reweighted": pop_b,
        "pop_b_biased": pop_b_biased,
    }


if __name__ == "__main__":
    main()
