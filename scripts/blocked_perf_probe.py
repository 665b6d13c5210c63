"""Perf probe for the blocked fused path on the real TPU.

Measures device throughput (pipelined dispatches) of the blocked kernels on
peptide(60) (300 atoms) across: forward, cv+forces, train step; precision
modes; tile sizes. Used to locate where the backward's time goes before
optimizing (ROADMAP #1).

Usage: python scripts/blocked_perf_probe.py [n_residues] [log2_frames]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from molann_tpu.ops.fused import (
    fused_cv_forces,
    fused_model_forward,
    fused_train_grads,
)
from molann_tpu.systems import peptide_model

N_RES = int(sys.argv[1]) if len(sys.argv) > 1 else 60
LOG2_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 19
N_FRAMES = 1 << LOG2_FRAMES
DEPTH = 4


def _sync(out):
    # force a scalar readback: block_until_ready is unreliable over the
    # axon remote-TPU tunnel (see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(leaf[(0,) * leaf.ndim])  # tiny scalar gather, no copy


def timed(label, fn, *args):
    try:
        out = fn(*args)
        _sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{label:58s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return 0.0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(DEPTH)]
    _sync(outs[-1])  # in-order device stream: last sync covers all
    dt = (time.perf_counter() - t0) / DEPTH
    fps = N_FRAMES / dt
    print(f"{label:58s} {dt*1e3:9.2f} ms  {fps/1e6:9.2f}M f/s")
    return fps


def main():
    print(f"devices: {jax.devices()}")
    model, u = peptide_model(N_RES)
    n = len(u.atoms)
    d_out = model(jnp.zeros((1, n, 3))).shape[1]
    print(f"n_atoms={n} d_out={d_out}")

    key = jax.random.PRNGKey(1)
    # component-major [3, n, l]: the fast resident layout
    x = jax.device_put(
        u.atoms.positions.T.reshape(3, n, 1)
        + 0.05 * jax.random.normal(key, (3, n, N_FRAMES), jnp.float32)
    )
    yt = jax.random.normal(jax.random.PRNGKey(2), (N_FRAMES, d_out))
    jax.block_until_ready((x, yt))

    for tile in (None, 256, 512):
        fwd = jax.jit(lambda xx, t=tile: fused_model_forward(
            model, xx, tile=t, mode="blocked"))
        timed(f"fwd exact tile={tile}", fwd, x)

    for prec in ("exact", "tf32", "bf16"):
        tiles = (None, 128, 256, 512) if prec == "exact" else (None,)
        for tile in tiles:
            cv = jax.jit(lambda xx, t=tile, p=prec: fused_cv_forces(
                model, xx, tile=t, precision=p, mode="blocked"))
            timed(f"cv+forces {prec} tile={tile}", cv, x)

    for prec in ("exact", "tf32"):
        tiles = (None, 128, 256, 512) if prec == "exact" else (None,)
        for tile in tiles:
            tr = jax.jit(lambda xx, yy, t=tile, p=prec: fused_train_grads(
                model, xx, yy, tile=t, precision=p, mode="blocked"))
            timed(f"train_grads {prec} tile={tile}", tr, x, yt)


if __name__ == "__main__":
    main()
