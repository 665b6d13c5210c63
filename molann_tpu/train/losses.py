"""Loss utilities for collective-variable training.

The reference ships no training loop (SURVEY.md §2.3); these are the
standard objectives its downstream CV-training codes use, expressed over
``(model, batch)`` pytrees so they plug into :mod:`molann_tpu.train.loop`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["mse_loss", "fused_mse_loss", "autoencoder_loss", "registry"]


def mse_loss(model, batch):
    """Supervised regression: batch = ``(x [l,n,3], y [l,d])``."""
    x, y = batch
    pred = model(x)
    return jnp.mean((pred - y) ** 2)


def fused_mse_loss(model, batch, *, interpret=False):
    """:func:`mse_loss` through the fused Pallas path — x may be packed
    ``[l, 3n]`` (preferred on TPU, see molann_tpu/ops/fused.py)."""
    from ..ops.fused import fused_model_forward

    x, y = batch
    pred = fused_model_forward(model, x, interpret=interpret)
    return jnp.mean((pred - y) ** 2)


def autoencoder_loss(encoder, decoder, preprocessing, x, weights=None):
    """Autoencoder CV loss in feature space.

    ``preprocessing`` maps coordinates to features ``f = pp(x)``; the
    encoder maps features to CVs ``z = enc(f)``; the decoder reconstructs
    ``f̂ = dec(z)``. Loss = (weighted) mean squared reconstruction error —
    the classic MolANN-ecosystem autoencoder CV objective.
    """
    f = preprocessing(x)
    z = encoder(f)
    rec = decoder(z)
    err = jnp.sum((rec - f) ** 2, axis=1)
    if weights is not None:
        return jnp.sum(err * weights) / jnp.sum(weights)
    return jnp.mean(err)


registry = {
    "mse": mse_loss,
    "fused_mse": fused_mse_loss,
}
