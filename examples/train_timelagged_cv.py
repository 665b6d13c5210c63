"""End-to-end example: learn collective variables from DYNAMICS with the
VAMP-2 time-lagged objective — the fourth CV-learning family of the
reference's research ecosystem (zwpku/molann README.rst:51, "adaptive
learning of reaction coordinates"; the variational approach for Markov
processes of Wu & Noé), run fully in-framework:

1. sample a long unbiased Langevin trajectory of the toy alanine
   potential at a LOW barrier (so interbasin hopping actually happens
   in unbiased dynamics — no bias, no reweighting needed here);
2. form time-lagged coordinate pairs (x_t, x_{t+tau}) per walker;
3. baseline: linear TICA on the invariant feature time series — its
   top autocorrelation bounds what any linear CV can do;
4. train a MolANN (same invariant features -> MLP, 1 output) by
   maximizing the VAMP-2 score; the learned nonlinear CV must match or
   beat the linear TICA autocorrelation and align with the interbasin
   hopping mode (the free torsion), which the model never sees.

Runs anywhere (CPU included): python examples/train_timelagged_cv.py
See tests/test_timelagged.py for the analytic AR(1)/OU oracle of the
same estimators.
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
from molann_tpu.train import fit, make_vamp_loss, tica, vamp2_loss

KT = 0.25
DT = 2e-4
BARRIER = 0.625  # 2.5 kT: unbiased hopping every few thousand steps
THIN = 20
LAG = 25         # in recorded frames (= LAG*THIN integrator steps)


def _corr(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).mean() / np.sqrt((a * a).mean() * (b * b).mean()))


def main(quick=False):
    u = alanine_universe()
    pot = ToyPeptidePotential(u, barrier=BARRIER)

    # --- 1. long unbiased trajectory with real interbasin hopping ------
    # seed half the walkers in each basin (rotate_torsion flips the free
    # torsion by pi) so the hopping mode carries full statistical weight
    # from step 0 — an all-A start makes the slow interbasin mode's
    # variance tiny until enough hops accumulate, and TICA/VAMP would
    # lock onto the next-slowest intrabasin motion instead
    n_walkers, n_steps = 8, (60000 if quick else 120000)
    xb = np.asarray(rotate_torsion(u, (4, 6, 8, 14), np.pi))
    x0 = jnp.asarray(np.concatenate([
        np.repeat(u.atoms.positions[None], n_walkers // 2, axis=0),
        np.repeat(xb[None], n_walkers - n_walkers // 2, axis=0),
    ]))
    traj, _ = overdamped_langevin(
        pot.energy, x0, n_steps=n_steps, dt=DT, kT=KT,
        key=jax.random.PRNGKey(0), thin=THIN,
    )
    traj = np.asarray(traj)  # [T, W, n, 3]
    t_rec, w_cnt = traj.shape[:2]
    phi = np.asarray(pot.phi(jnp.asarray(traj.reshape(-1, 22, 3))))
    cos_phi = np.cos(phi).reshape(t_rec, w_cnt)
    hops = int(np.sum(np.abs(np.diff(np.sign(cos_phi), axis=0)) > 0))
    print(f"{t_rec} frames x {w_cnt} walkers, {hops} basin crossings")
    assert hops > 10, "need real hopping statistics; raise n_steps"

    # --- 2. time-lagged pairs, per walker (contiguous series each) -----
    x_t = traj[:-LAG].reshape(-1, 22, 3)    # [T-LAG, W] flattened
    x_tau = traj[LAG:].reshape(-1, 22, 3)

    # --- 3. linear baseline: TICA on the invariant features ------------
    pp = PreprocessingANN(
        None, FeatureLayer(alanine_histogram_features(u), u.atoms)
    )
    f_t = np.asarray(pp(jnp.asarray(x_t)))
    f_tau = np.asarray(pp(jnp.asarray(x_tau)))
    lin = tica(f_t, f_tau, lag=float(LAG))
    print(f"linear TICA: top autocorrelation {lin.eigenvalues[0]:.3f}, "
          f"implied timescale {lin.timescales()[0]:.0f} frames")

    # --- 4. nonlinear CV by VAMP-2 --------------------------------------
    model = MolANN(
        pp,
        create_sequential_nn([pp.output_dimension(), 24, 1],
                             key=jax.random.PRNGKey(1)),
    )

    def batches(batch_size=2048, seed=1):
        rng = np.random.default_rng(seed)
        while True:
            i = rng.integers(0, len(x_t), batch_size)
            yield jnp.asarray(x_t[i]), jnp.asarray(x_tau[i])

    res = fit(model, make_vamp_loss(), batches(),
              optimizer=optax.adam(2e-3),
              num_steps=(400 if quick else 800), log_every=200)
    model = res.model

    _, aux = vamp2_loss(model, jnp.asarray(x_t), jnp.asarray(x_tau),
                        return_aux=True)
    ac = float(aux["autocorrelations"][0])
    ts = -LAG / np.log(ac) if 0 < ac < 1 else float("inf")
    print(f"VAMP-2 CV: score {float(aux['vamp2']):.3f}, autocorrelation "
          f"{ac:.3f}, implied timescale {ts:.0f} frames")

    # --- 5. the learned CV is the hopping mode --------------------------
    z = np.asarray(model(jnp.asarray(traj.reshape(-1, 22, 3))))[:, 0]
    corr_basin = abs(_corr(z, (cos_phi.reshape(-1) > 0).astype(float)))
    print(f"|corr(CV, basin indicator)| = {corr_basin:.2f} "
          f"(the model never saw phi)")
    return {
        "hops": hops,
        "tica_ac": float(lin.eigenvalues[0]),
        "vamp_ac": ac,
        "vamp2": float(aux["vamp2"]),
        "corr_basin": corr_basin,
    }


if __name__ == "__main__":
    main()
