"""Benchmark: fused align+feature+MLP forward+backward throughput.

Measures frames/sec/chip for the flagship MolANN model (AlignmentLayer +
histogram FeatureLayer + MLP) computing the forward pass AND gradients
w.r.t. atomic coordinates (the force-evaluation workload of biased MD /
CV training — BASELINE.json north-star), through the fused Pallas kernel
path (molann_tpu/ops/fused.py) on packed [l, 3n] trajectories.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the driver-set target of 10M frames/sec/chip
(the reference publishes no performance numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FRAMES_PER_SEC = 10_000_000.0
N_FRAMES = 1 << 23  # 8M frames/step amortizes per-dispatch overhead


def main():
    from molann_tpu.ops.fused import fused_cv_forces
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()

    rng = np.random.default_rng(0)
    # fully transposed [3n, l] trajectory — the fast storage layout on TPU
    # (a resident [l, n, 3] array would lane-pad 3 -> 128, ~42x HBM waste)
    x = jnp.asarray(
        u.atoms.positions.reshape(66, 1)
        + 0.05 * rng.normal(size=(66, N_FRAMES)).astype(np.float32)
    )

    @jax.jit
    def fwd_bwd(m, xx):
        # single-kernel CV values + full coordinate gradients
        # (the biased-MD force-evaluation workload)
        return fused_cv_forces(m, xx, tile=1024, transposed_input=True)

    def run_once():
        out, g = fwd_bwd(model, x)
        # Sync on a 1-element readback that data-depends on the whole grad
        # (block_until_ready is unreliable over the axon tunnel).
        return float(g[0, 0])

    run_once()  # warmup/compile

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    best = min(times)
    frames_per_sec = N_FRAMES / best
    print(
        json.dumps(
            {
                "metric": "alanine-dipeptide frames/sec/chip "
                "(fused align+feature+MLP fwd+bwd, Pallas)",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
