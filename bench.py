"""Benchmark: fused align+feature+MLP forward+backward throughput.

Measures frames/sec/chip for the flagship MolANN model (AlignmentLayer +
Histogram FeatureLayer + MLP) computing the forward pass AND gradients
w.r.t. atomic coordinates (the force-evaluation workload of biased MD /
CV training — BASELINE.json north-star).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

vs_baseline is measured against the driver-set target of 10M frames/sec/chip
(the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FRAMES_PER_SEC = 10_000_000.0


def main():
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()

    n_frames = 1 << 20  # 1M frames per step
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(n_frames, 22, 3)).astype(np.float32)
    )

    def fwd_bwd(m, xx):
        # forward + full gradient w.r.t. coordinates (force evaluation)
        out, grad = jax.value_and_grad(lambda v: jnp.sum(m(v)))(xx)
        return out, grad

    step = jax.jit(fwd_bwd)

    def run_once():
        out, g = step(model, x)
        # Sync on a 1-element readback that data-depends on the whole grad
        # (block_until_ready is unreliable over the axon tunnel).
        return float(g[0, 0, 0])

    run_once()  # warmup/compile

    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    best = min(times)
    frames_per_sec = n_frames / best
    print(
        json.dumps(
            {
                "metric": "alanine-dipeptide frames/sec/chip "
                "(align+feature+MLP fwd+bwd)",
                "value": round(frames_per_sec, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
