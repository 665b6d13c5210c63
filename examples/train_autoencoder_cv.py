"""End-to-end example: learn collective variables with an autoencoder.

The canonical MolANN-ecosystem workflow: preprocess MD frames into
invariant features, train an encoder/decoder pair whose bottleneck is the
learned CV, then export the encoder (preprocessing + encoder MLP) for use
by an enhanced-sampling engine.

Runs anywhere (CPU included): python examples/train_autoencoder_cv.py
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from molann_tpu import MolANN, PreprocessingANN, create_sequential_nn
from molann_tpu.io import export_stablehlo, save_model
from molann_tpu.systems import alanine_histogram_features, alanine_universe
from molann_tpu.train import (
    autoencoder_loss,
    fit,
    force_fn,
    save_trajectory,
)
from molann_tpu.ann import FeatureLayer


def make_synthetic_trajectory(u, n_frames=4096, seed=0):
    """Fake 'MD data': fixture geometry + correlated noise."""
    rng = np.random.default_rng(seed)
    base = u.atoms.positions[None]
    modes = rng.normal(size=(3, 22, 3)).astype(np.float32)
    amps = rng.normal(size=(n_frames, 3, 1, 1)).astype(np.float32)
    frames = base + 0.05 * (amps * modes).sum(axis=1)
    frames += 0.02 * rng.normal(size=frames.shape).astype(np.float32)
    return frames.astype(np.float32)


def main():
    u = alanine_universe()
    features = alanine_histogram_features(u)

    # invariant features -> no alignment needed (PreprocessingANN(None, ...))
    f_layer = FeatureLayer(features, u.atoms, use_angle_value=False)
    pp = PreprocessingANN(None, f_layer)
    d = pp.output_dimension()

    n_cv = 2
    key = jax.random.PRNGKey(0)
    k_enc, k_dec = jax.random.split(key)
    encoder = create_sequential_nn([d, 16, n_cv], key=k_enc)
    decoder = create_sequential_nn([n_cv, 16, d], key=k_dec)

    frames = make_synthetic_trajectory(u)
    workdir = tempfile.mkdtemp(prefix="cv_example_")
    save_trajectory(os.path.join(workdir, "traj.npy"), frames)

    # train the (encoder, decoder) pair jointly: treat them as one pytree
    pair = (encoder, decoder)

    def loss_fn(p, batch):
        enc, dec = p
        return autoencoder_loss(enc, dec, pp, batch)

    def batches(batch_size=512, seed=1):
        rng = np.random.default_rng(seed)
        while True:
            idx = rng.integers(0, len(frames), size=batch_size)
            yield jnp.asarray(frames[idx])

    result = fit(
        pair, loss_fn, batches(), optimizer=optax.adam(2e-3),
        num_steps=300, log_every=100,
        mask=jax.tree_util.tree_map(lambda _: True, pair),
        checkpoint_dir=os.path.join(workdir, "ckpts"), checkpoint_every=100,
    )
    encoder, decoder = result.model
    print(f"reconstruction loss: {result.losses[0]:.4f} -> "
          f"{result.losses[-1]:.4f}")

    # package preprocessing + encoder as the deployable CV model
    cv_model = MolANN(pp, encoder)
    x = jnp.asarray(frames[:8])
    print("learned CVs for 8 frames:\n", np.asarray(cv_model(x)))

    save_model(os.path.join(workdir, "cv_model.npz"), cv_model)
    export_stablehlo(cv_model, n_atoms=22,
                     path=os.path.join(workdir, "cv_model.stablehlo"),
                     with_gradient=True)

    # biasing forces on the first CV component
    f = force_fn(cv_model, component=0)(x)
    print("force norm per frame:", np.linalg.norm(np.asarray(f), axis=(1, 2)))
    print("artifacts in:", workdir)


if __name__ == "__main__":
    main()
