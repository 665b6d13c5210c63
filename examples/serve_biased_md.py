"""End-to-end example: production CV + biasing-force serving.

The biased-MD serving workflow: a trained model evaluates collective
variables AND their coordinate gradients (the biasing forces are the
negated gradients) over trajectory batches arriving from disk. Everything
rides the single-kernel fused path: one HBM read of the coordinates per
batch, CVs and forces written in one dispatch, trajectory format handled
by the native loader (.npy or CHARMM/NAMD .dcd).

Runs anywhere (CPU uses the XLA path; TPU the fused kernels):
    python examples/serve_biased_md.py
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from molann_tpu.io import save_model, write_dcd
from molann_tpu.ops.fused import fused_cv_forces
from molann_tpu.systems import alanine_model
from molann_tpu.train import packed_batch_iterator


def main():
    workdir = tempfile.mkdtemp(prefix="molann_serve_")
    model, u = alanine_model()
    n_atoms = len(u.atoms)

    # --- the artifacts a production setup would load -------------------
    model_path = os.path.join(workdir, "model.npz")
    save_model(model_path, model)

    # a fake trajectory, written as DCD (what MD engines emit)
    rng = np.random.default_rng(0)
    frames = (
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(4096, n_atoms, 3))
    ).astype(np.float32)
    traj = os.path.join(workdir, "traj.dcd")
    write_dcd(traj, frames)

    # --- serving loop ---------------------------------------------------
    # (TPU-proxy platforms may register under their own name while
    # reporting canonical platform "tpu"; accept both spellings)
    on_tpu = jax.default_backend() in ("tpu", "axon")

    @jax.jit
    def serve(m, xb):
        if on_tpu:
            # single kernel: CVs + coordinate gradients, biasing the first
            # CV component (mode/tile auto-select by system size)
            return fused_cv_forces(m, xb, component=0)
        x3 = xb.reshape(xb.shape[0], n_atoms, 3)
        y = m(x3)
        g = jax.grad(lambda v: m(v)[:, 0].sum())(x3)
        return y, g.reshape(xb.shape)

    n_done = 0
    for xb in packed_batch_iterator(traj, 1024, shuffle=False, epochs=1,
                                    drop_remainder=False):
        cvs, grads = serve(model, jnp.asarray(xb))
        forces = -np.asarray(grads)  # the biasing forces
        n_done += xb.shape[0]
        print(f"batch done: {cvs.shape[0]} frames, CV[0] mean "
              f"{float(cvs[:, 0].mean()):+.4f}, |F|max "
              f"{float(np.abs(forces).max()):.3f}")
    print(f"served {n_done} frames from {traj}")

    # equivalent one-liner from the shell:
    #   python -m molann_tpu forces model.npz traj.dcd --component 0 \
    #       --out cvs.npy --forces-out forces.npy


if __name__ == "__main__":
    main()
