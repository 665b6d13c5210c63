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
N_FRAMES = 1 << 22  # 4M frames/step amortizes per-dispatch overhead


def main():
    from molann_tpu.ops.fused import fused_model_forward
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()

    rng = np.random.default_rng(0)
    # packed [l, 3n] trajectory (resident [l, n, 3] would lane-pad 3->128)
    x = jnp.asarray(
        u.atoms.positions.reshape(1, 66)
        + 0.05 * rng.normal(size=(N_FRAMES, 66)).astype(np.float32)
    )

    @jax.jit
    def fwd_bwd(m, xx):
        # forward + full gradient w.r.t. coordinates (force evaluation)
        out, grad = jax.value_and_grad(
            lambda v: jnp.sum(fused_model_forward(m, v))
        )(xx)
        return out, grad

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
