"""Perf probe for the condensed-phase chunked-coordination path on TPU.

Measures device throughput (pipelined dispatches, device-side scalar
readback — np.asarray of a [l, n, 3] gradient would measure the remote
tunnel, not the kernel) of the HBM-streamed chunked kernels on
systems.lj_fluid_model across forward / cv+forces / training grads,
chunk-tile combinations, and precision modes, plus the XLA baseline at
its largest feasible batch (the XLA fwd+grad path materializes the full
``[l, n_pairs]`` pair arrays — 36 GB of HBM temps at 64K frames on the
default 15,500-pair model).

Usage: python scripts/condensed_perf_probe.py [n_per_side] [log2_frames]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from molann_tpu.ops.fused import (
    fused_cv_forces,
    fused_model_forward,
    fused_train_grads,
)
from molann_tpu.systems import lj_fluid_model

N_SIDE = int(sys.argv[1]) if len(sys.argv) > 1 else 5
LOG2_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_FRAMES = 1 << LOG2_FRAMES
DEPTH = 4


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(leaf[(0,) * leaf.ndim])  # tiny scalar gather, no bulk copy


def timed(label, fn, *args, n_frames=N_FRAMES):
    try:
        out = fn(*args)
        _sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{label:58s} FAILED: {type(e).__name__}: {str(e)[:90]}")
        return 0.0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(DEPTH)]
    _sync(outs[-1])
    dt = (time.perf_counter() - t0) / DEPTH
    fps = n_frames / dt
    print(f"{label:58s} {dt*1e3:9.2f} ms  {fps/1e6:9.3f}M f/s")
    return fps


def main():
    print(f"devices: {jax.devices()}")
    model, u, box = lj_fluid_model(N_SIDE)
    n = len(u.atoms)
    spec = model.preprocessing_layer.feature_layer._spec
    n_pairs = sum(np_ for _, np_ in spec.coord_slices)
    print(f"n_atoms={n} pairs={n_pairs} frames={N_FRAMES}")

    key = jax.random.PRNGKey(1)
    x = jax.device_put(
        jnp.asarray(u.atoms.positions)[None]
        + 0.3 * jax.random.normal(key, (N_FRAMES, n, 3), jnp.float32)
    )
    yt = jax.random.normal(jax.random.PRNGKey(2), (N_FRAMES, 1))
    jax.block_until_ready((x, yt))

    for tile in (None, 256, 512):
        fwd = jax.jit(lambda xx, t=tile: fused_model_forward(
            model, xx, tile=t, mode="blocked"))
        timed(f"fwd exact tile={tile}", fwd, x)

    for prec in ("exact", "tf32", "bf16"):
        tiles = (None, 128, 512) if prec == "exact" else (None,)
        for tile in tiles:
            cv = jax.jit(lambda xx, t=tile, p=prec: fused_cv_forces(
                model, xx, tile=t, precision=p, mode="blocked"))
            timed(f"cv+forces {prec} tile={tile}", cv, x)

    for prec in ("exact", "tf32"):
        tr = jax.jit(lambda xx, yy, p=prec: fused_train_grads(
            model, xx, yy, precision=p, mode="blocked"))
        timed(f"train_grads {prec}", tr, x, yt)

    # neighbor-culled model (r4): same physics (exact d_max truncation),
    # order-of-magnitude fewer pair rows through the same chunked kernels
    from molann_tpu.ops.neighbor import cull_model

    culled, rep = cull_model(model, u.atoms.positions, skin=0.8)
    nb, na = sum(rep.n_pairs_before), sum(rep.n_pairs_after)
    print(f"culled pair table: {nb} -> {na} "
          f"({nb / max(na, 1):.1f}x fewer rows)")
    fwdc = jax.jit(lambda xx: fused_model_forward(
        culled, xx, mode="blocked"))
    timed("fwd exact CULLED", fwdc, x)
    cvc = jax.jit(lambda xx: fused_cv_forces(culled, xx, mode="blocked"))
    timed("cv+forces exact CULLED", cvc, x)
    trc = jax.jit(lambda xx, yy: fused_train_grads(
        culled, xx, yy, mode="blocked"))
    timed("train_grads auto CULLED", trc, x, yt)

    # XLA baseline at ITS feasible batch
    l_x = min(N_FRAMES, 8192)
    xs = x[:l_x]
    xla = jax.jit(lambda xx: (
        model(xx), jax.grad(lambda v: jnp.sum(model(v)))(xx)))
    timed(f"XLA fwd+grad (batch {l_x})", xla, xs, n_frames=l_x)


if __name__ == "__main__":
    main()
