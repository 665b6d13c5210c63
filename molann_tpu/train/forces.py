"""Coordinate gradients / forces for biased-MD and CV training.

The reference exports TorchScript models so downstream MD engines can
differentiate CVs w.r.t. atomic coordinates; here that is a first-class
function: ``jax.grad`` through the whole align+feature+MLP stack
(differentiability verified against the torch oracle in
tests/test_parity_torch.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["coordinate_gradients", "force_fn"]


def coordinate_gradients(model, x, component: int | None = None):
    """``∂(Σ_frames out[, component])/∂x`` — per-frame coordinate gradients.

    x: ``[l, n, 3]``. Returns ``[l, n, 3]`` (frames are independent, so the
    batch-summed gradient IS the per-frame gradient).
    """

    def objective(xx):
        out = model(xx)
        if component is not None:
            out = out[:, component]
        return jnp.sum(out)

    return jax.grad(objective)(x)


def force_fn(model, component: int = 0):
    """Jitted ``x -> -∂out[:, component]/∂x`` (biasing-force convention)."""

    @jax.jit
    def forces(x):
        return -coordinate_gradients(model, x, component)

    return forces
