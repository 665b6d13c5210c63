"""The closed enhanced-sampling loop — the job the reference exists for.

The reference (zwpku/molann README.rst:51) trains CV networks whose
exports feed biased-MD engines; nothing in its repo ever *consumes* the
CVs. This example closes that loop entirely in-framework:

1. a toy double-well peptide potential on the alanine fixture
   (molann_tpu.sampling.potentials) — the stand-in MD engine;
2. unbiased Langevin dynamics: walkers stay trapped in the starting
   basin (phi ~ pi) for the whole run;
3. training data from both basins (the second basin reached once by
   steered MD along the phi dihedral), an autoencoder CV trained on
   invariant features exactly like examples/train_autoencoder_cv.py;
4. metadynamics along the TRAINED one-dimensional CV: the accumulated
   bias pushes walkers over the barrier the unbiased runs never cross —
   escape driven by forces differentiated through the full
   align+feature+MLP stack.

Runs anywhere (CPU included): python examples/biased_dynamics.py
The TPU serving side of the same gradients (fused_cv_forces) is checked
in scripts/tpu_validation.py.
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
from molann_tpu.sampling import (
    ToyPeptidePotential,
    metadynamics_langevin,
    overdamped_langevin,
    steered_langevin,
)
from molann_tpu.systems import alanine_histogram_features, alanine_universe
from molann_tpu.train import autoencoder_loss, fit

KT = 0.25
DT = 2e-4


def phi_cv(u, use_angle_value):
    """[cos phi, sin phi] (or phi) of the backbone phi dihedral."""
    ag = (u.select_atoms("bynum 5") + u.select_atoms("bynum 7")
          + u.select_atoms("bynum 9") + u.select_atoms("bynum 15"))
    return PreprocessingANN(
        None, FeatureLayer([Feature("phi", "dihedral", ag)], u.atoms,
                           use_angle_value)
    )


def train_cv(u, frames, *, n_cv=1, num_steps=400, seed=0):
    """Autoencoder CV on invariant features (both-basin training data)."""
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


def main(quick=False):
    u = alanine_universe()
    pot = ToyPeptidePotential(u, barrier=6.0)
    n_walkers = 2 if quick else 4
    x0 = jnp.asarray(np.repeat(u.atoms.positions[None], n_walkers, axis=0))

    # --- 1. unbiased dynamics: trapped ---------------------------------
    n_unbiased = 2000 if quick else 6000
    traj_u, _ = overdamped_langevin(
        pot.energy, x0, n_steps=n_unbiased, dt=DT, kT=KT,
        key=jax.random.PRNGKey(0), thin=50,
    )
    cos_u = np.cos(np.asarray(pot.phi(traj_u.reshape(-1, 22, 3))))
    print(f"unbiased: cos(phi) in [{cos_u.min():+.2f}, {cos_u.max():+.2f}]"
          f"  (start basin: cos(phi) ~ -1; never crosses)")

    # --- 2. reach basin B once (steered MD along phi) ------------------
    _, x_basin_b = steered_langevin(
        pot.energy, phi_cv(u, True), x0[:1], s0=[np.pi], s1=[0.0],
        k_spring=10.0, n_steps=3000, dt=DT, kT=KT,
        key=jax.random.PRNGKey(1), thin=50,
    )
    print(f"steered pull: final cos(phi) = "
          f"{float(np.cos(np.asarray(pot.phi(x_basin_b)))[0]):+.2f}")

    # --- 3. training data from both basins + autoencoder CV ------------
    n_data = 1000 if quick else 3000
    data_a, _ = overdamped_langevin(
        pot.energy, x0[:1], n_steps=n_data, dt=DT, kT=KT,
        key=jax.random.PRNGKey(2), thin=10,
    )
    data_b, _ = overdamped_langevin(
        pot.energy, x_basin_b, n_steps=n_data, dt=DT, kT=KT,
        key=jax.random.PRNGKey(3), thin=10,
    )
    frames = np.concatenate(
        [np.asarray(data_a).reshape(-1, 22, 3),
         np.asarray(data_b).reshape(-1, 22, 3)]
    )
    cv_model, losses = train_cv(
        u, frames, num_steps=150 if quick else 500
    )
    cvs = np.asarray(cv_model(jnp.asarray(frames)))[:, 0]
    half = len(frames) // 2
    gap = abs(cvs[:half].mean() - cvs[half:].mean())
    spread = max(cvs[:half].std(), cvs[half:].std())
    print(f"trained CV: loss {losses[0]:.4f} -> {losses[-1]:.4f}; "
          f"basin separation {gap:.3f} vs in-basin spread {spread:.3f}")

    # --- 4. metadynamics along the TRAINED CV: escape ------------------
    sigma = max(0.5 * spread, 0.05 * gap)
    n_metad = 5000 if quick else 8000
    traj_b, _, bias = metadynamics_langevin(
        pot.energy, cv_model, x0, n_steps=n_metad, dt=DT, kT=KT,
        key=jax.random.PRNGKey(4), height=2.0 * KT, sigma=sigma,
        stride=50,
    )
    cos_b = np.cos(np.asarray(pot.phi(traj_b.reshape(-1, 22, 3))))
    per_walker = [
        float(np.cos(np.asarray(pot.phi(traj_b[:, w]))).max())
        for w in range(n_walkers)
    ]
    print(f"metadynamics along trained CV: cos(phi) reaches "
          f"{cos_b.max():+.2f}  (per walker: "
          f"{', '.join(f'{c:+.2f}' for c in per_walker)})")
    escaped = cos_b.max() > 0.5
    print("ESCAPED the start basin" if escaped
          else "no escape (increase n_steps / height)")

    grid = np.linspace(cvs.min(), cvs.max(), 50)[:, None]
    fes = np.asarray(bias.free_energy_estimate(grid))
    print(f"free-energy estimate along CV: range "
          f"{fes.max() - fes.min():.2f} (units of kT: "
          f"{(fes.max() - fes.min()) / KT:.1f})")
    return {
        "cos_unbiased_max": float(cos_u.max()),
        "cos_biased_max": float(cos_b.max()),
        "escaped": bool(escaped),
        "cv_gap": float(gap),
        "cv_spread": float(spread),
    }


if __name__ == "__main__":
    main()
