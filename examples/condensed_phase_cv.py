"""Condensed-phase CVs at scale: coordination shells over a periodic
Lennard-Jones fluid, one-shot HLDA order parameter, blocked fused kernels.

The reference's feature set (bond/angle/dihedral/position — reference
molann/feature.py:81-97) describes single molecules; condensed-phase
order parameters are contact COUNTS over many pairs (PLUMED-style
COORDINATION, this library's extension feature type). This example runs
the full condensed-phase workflow end to end:

1. a periodic LJ fluid with a real pair potential
   (``molann_tpu.sampling.LennardJonesPotential``, minimum image under
   the box) — the stand-in MD engine;
2. overdamped Langevin from the lattice at two temperatures: cold
   walkers stay crystalline, hot walkers melt;
3. two all-pairs coordination-shell features carrying ``pbc_box=box``
   (thousands of switching-function pairs — far past the unrolled-kernel
   envelope, so ``mode="auto"`` dispatches the blocked edge-matrix
   formulation of molann_tpu/ops/fused_blocked.py);
4. HLDA on the labeled ensembles → a one-shot linear CV over the shells
   that separates solid from fluid on held-out frames;
5. the CV packaged as a ``MolANN`` and evaluated through the fused
   blocked kernel — parity with the XLA path, demonstrating the serving
   route for condensed-phase models.

Runs anywhere (CPU included): python examples/condensed_phase_cv.py
The same configuration is validated on real TPU hardware by
scripts/tpu_validation.py (blocked coordination checks).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from molann_tpu import (
    Feature,
    FeatureLayer,
    MolANN,
    PreprocessingANN,
    SequentialNN,
)
from molann_tpu.ops.fused import fused_model_forward, model_select_mode
from molann_tpu.sampling import LennardJonesPotential, overdamped_langevin
from molann_tpu.systems import lj_fluid
from molann_tpu.train import hlda

EPSILON = 1.0
SPACING = 1.7


def sample_phase(pot, x0, kT, *, n_steps, key, thin):
    """Overdamped Langevin from the lattice; returns [T, W, n, 3]."""
    traj, _ = overdamped_langevin(
        pot.energy, x0, n_steps=n_steps, dt=5e-4, kT=kT, key=key, thin=thin
    )
    return traj


def main(quick=False):
    n_side = 3 if quick else 5
    n_walkers = 2 if quick else 3
    n_steps = 3000 if quick else 6000
    kT_hot = (3.0 if quick else 2.5) * EPSILON  # small boxes melt harder
    thin = 50

    u, box = lj_fluid(n_side, SPACING)
    n_atoms = len(u.atoms)
    sigma = SPACING / 2 ** (1 / 6)  # lattice sits near the LJ minimum
    pot = LennardJonesPotential(n_atoms, box, epsilon=EPSILON, sigma=sigma)

    # --- 1+2: dynamics at two temperatures -----------------------------
    x0 = jnp.asarray(
        np.repeat(u.atoms.positions[None], n_walkers, 0).astype(np.float32)
    )
    cold = sample_phase(pot, x0, 0.3 * EPSILON, n_steps=n_steps,
                        key=jax.random.PRNGKey(0), thin=thin)
    hot = sample_phase(pot, x0, kT_hot, n_steps=n_steps,
                       key=jax.random.PRNGKey(1), thin=thin)
    # drop the equilibration third, flatten walkers into the frame axis
    burn = cold.shape[0] // 3
    cold = np.asarray(cold[burn:]).reshape(-1, n_atoms, 3)
    hot = np.asarray(hot[burn:]).reshape(-1, n_atoms, 3)

    # --- 3: coordination shells under the periodic box ------------------
    feats = [
        Feature("shell1", "coordination", u.atoms, r0=1.35 * SPACING,
                pbc_box=box),
        Feature("shell2", "coordination", u.atoms, r0=2.2 * SPACING,
                nn=4, mm=8, pbc_box=box),
    ]
    flayer = FeatureLayer(feats, u.atoms)
    n_pairs = n_atoms * (n_atoms - 1) // 2
    print(f"{n_atoms} atoms, {len(feats)} coordination shells x "
          f"{n_pairs} minimum-image pairs")

    fl = jax.jit(lambda xx: flayer(xx))
    f_cold = np.asarray(fl(jnp.asarray(cold)))
    f_hot = np.asarray(fl(jnp.asarray(hot)))

    # --- 4: one-shot HLDA CV on train halves, judged on held-out halves -
    def halves(f):
        m = f.shape[0] // 2
        return f[:m], f[m:]

    (tr_c, ho_c), (tr_h, ho_h) = halves(f_cold), halves(f_hot)
    (_, ho_xc), (_, ho_xh) = halves(cold), halves(hot)
    res = hlda(
        np.concatenate([tr_c, tr_h]),
        np.repeat([0, 1], [len(tr_c), len(tr_h)]),
    )
    cv_c, cv_h = res.transform(ho_c)[:, 0], res.transform(ho_h)[:, 0]
    gap = abs(cv_c.mean() - cv_h.mean())
    spread = max(cv_c.std(), cv_h.std())
    print(f"held-out CV: solid {cv_c.mean():+.2f}±{cv_c.std():.2f}  "
          f"fluid {cv_h.mean():+.2f}±{cv_h.std():.2f}  "
          f"gap/spread = {gap / spread:.1f}")

    # --- 5: package as a MolANN, evaluate via the blocked fused kernel --
    w = jnp.asarray(res.directions[:, :1], jnp.float32)
    b = jnp.asarray(-(res.mean @ res.directions[:, :1]), jnp.float32)
    model = MolANN(
        PreprocessingANN(None, flayer), SequentialNN(((w, b),), (2, 1))
    )
    mode = model_select_mode(model)
    x_eval = jnp.asarray(np.concatenate([ho_xc[:32], ho_xh[:32]]))
    on_tpu = jax.default_backend() in ("tpu", "axon")
    t0 = time.perf_counter()
    y_fused = np.asarray(
        fused_model_forward(model, x_eval, mode=mode,
                            interpret=not on_tpu)
    )[:, 0]
    t_fused = time.perf_counter() - t0
    y_xla = np.asarray(jax.jit(lambda m, xx: m(xx))(model, x_eval))[:, 0]
    err = float(np.abs(y_fused - y_xla).max()) / max(
        float(np.abs(y_xla).max()), 1e-9
    )
    print(f"fused mode={mode}: {x_eval.shape[0]} frames in "
          f"{t_fused:.2f}s (incl. compile), parity rel={err:.2e}")

    return {
        "n_atoms": n_atoms,
        "n_pairs": n_pairs,
        "cv_gap": float(gap),
        "cv_spread": float(spread),
        "fused_mode": mode,
        "fused_rel_err": err,
        "shell1_solid": float(f_cold[:, 0].mean()),
        "shell1_fluid": float(f_hot[:, 0].mean()),
    }


if __name__ == "__main__":
    out = main()
    print(out)
    assert out["cv_gap"] > 3 * out["cv_spread"]
    assert out["fused_mode"] == "blocked" and out["fused_rel_err"] < 1e-4
