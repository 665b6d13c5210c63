"""MXU-headroom probe: can int8 edge matmuls beat the bf16 split?

The blocked kernels are MXU-bound on the edge matmul ``D @ x`` with
``D`` exactly 0/±1 (docs/design.md roofline: ~47% of bf16 peak in exact
3-pass mode). VERDICT r2 weak #2 notes v5e's int8 MXU peak is 2x bf16
and D is int8-exact, suggesting an int8 fixed-point formulation:

    x * 2^s rounded to int32, split into k int8 digits;
    D(int8) @ digit(int8) -> int32 exactly; recombine in f32.

4 digits cover f32's 24-bit mantissa at a shared exponent (EXACT for
bounded coordinates); at 2x int8 throughput that is 2 bf16-pass
equivalents vs 3 — a potential 1.5x on the dominant matmuls. 2 digits
(16-bit fixed point) would be tf32-grade at 1 bf16-pass equivalent.

This probe measures, on the real TPU, per-pass wall time of the edge
matmul shapes from peptide(60) (D [552, 300], x [300, T]) as:
  - f32 Precision.HIGHEST (the 6-pass baseline)
  - one bf16 pass (the unit of the current 3-pass split)
  - one int8 pass (jnp.dot int8 x int8 -> int32), if Mosaic lowers it
  - the full 3-pass bf16 split (current "exact")
  - the 4-digit int8 fixed-point exact variant incl. in-kernel
    quantization, if lowerable

plus a numerical check of the fixed-point variant vs float64 truth.
The measured outcome (win, loss, or "Mosaic cannot lower int8 dots")
goes into docs/design.md's roofline section.

Usage: python scripts/int8_mm_probe.py [T=512] [reps=8]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N_TILES = 64  # frames = N_TILES * T per launch
M, N = 552, 304  # peptide(60) edge rows x atoms (padded to sublane 8)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(leaf[(0,) * leaf.ndim])


def timed(label, fn, *args):
    try:
        out = fn(*args)
        _sync(out)
    except Exception as e:  # noqa: BLE001
        print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return None
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    _sync(outs[-1])
    dt = (time.perf_counter() - t0) / REPS
    flops = 2.0 * M * N * T * N_TILES
    print(f"{label:44s} {dt*1e3:8.3f} ms   {flops/dt/1e12:7.2f} TFLOP/s")
    return dt


def make_kernel(body):
    def kernel(D_ref, x_ref, o_ref):
        o_ref[:] = body(D_ref[:], x_ref[:])

    def run(D, x):
        return pl.pallas_call(
            kernel,
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((M, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, T * N_TILES), jnp.float32),
        )(D, x)

    return jax.jit(run)


def main():
    print(f"devices: {jax.devices()}")
    print(f"shapes: D [{M}, {N}] x [{N}, {T}] x {N_TILES} tiles")
    rng = np.random.default_rng(0)
    D_host = (rng.integers(-1, 2, size=(M, N)) *
              (rng.random((M, N)) < 0.01)).astype(np.float32)
    # realistic coordinate magnitudes (Angstroms)
    x_host = (rng.random((N, T * N_TILES)) * 60 - 30).astype(np.float32)
    D = jnp.asarray(D_host)
    x = jnp.asarray(x_host)
    Db = D.astype(jnp.bfloat16)
    Di8 = D.astype(jnp.int8)
    # 16-bit-per-digit quantization scale: |x| < 32 A, 2^s with s chosen
    # so x*2^s fits int32 with 24+ significant bits: s = 31 - 6 = 25
    SCALE = float(2 ** 25 / 2 ** 6)

    _HI = jax.lax.Precision.HIGHEST

    f32_hi = make_kernel(
        lambda d, v: jnp.dot(d, v, precision=_HI,
                             preferred_element_type=jnp.float32))
    bf16_1 = make_kernel(
        lambda d, v: jnp.dot(d.astype(jnp.bfloat16),
                             v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32))

    def int8_pass(d, v):
        q = jnp.clip(jnp.round(v * (1.0 / 256.0)), -127, 127).astype(
            jnp.int8)
        return jax.lax.dot_general(
            d.astype(jnp.int8), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)

    int8_1 = make_kernel(int8_pass)

    def split3(d, v):
        hi32 = v.astype(jnp.bfloat16).astype(jnp.float32)
        r = v - hi32
        mid32 = r.astype(jnp.bfloat16).astype(jnp.float32)
        lo = (r - mid32).astype(jnp.bfloat16)
        db = d.astype(jnp.bfloat16)
        acc = jnp.dot(db, lo, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(db, mid32.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        return acc + jnp.dot(db, hi32.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)

    split3_k = make_kernel(split3)

    def _signed_digits(xi, count):
        """xi = Σ d_k 256^k with every d_k a SIGNED int8 digit (plain
        unsigned & 0xFF would wrap in the int8 cast): d_k = ((x + 128)
        & 0xFF) - 128, then x <- (x - d_k) >> 8."""
        digits = []
        for _ in range(count):
            d_k = ((xi + 128) & 0xFF) - 128
            digits.append(d_k.astype(jnp.int8))
            xi = (xi - d_k) >> 8
        return digits

    def int8_fixed4(d, v):
        # x -> int32 fixed point at a shared scale, 4 signed int8 digits
        # (covers f32's 24-bit mantissa exactly for |x| < 64)
        xi = jnp.round(v * SCALE).astype(jnp.int32)
        di = d.astype(jnp.int8)
        acc = None
        for k, digit in enumerate(_signed_digits(xi, 4)):
            p = jax.lax.dot_general(
                di, digit, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            term = p.astype(jnp.float32) * float(2 ** (8 * k))
            acc = term if acc is None else acc + term
        return acc * (1.0 / SCALE)

    int8_fixed4_k = make_kernel(int8_fixed4)

    def int8_fixed2(d, v):
        # 16-bit fixed point (tf32-grade): 2 signed digits via
        # round-to-nearest splitting: x*S = hi*256 + lo with lo in
        # [-128, 127]
        S2 = float(2 ** 15 / 2 ** 6)
        xi = jnp.round(v * S2).astype(jnp.int32)
        lo = ((xi + 128) & 0xFF).astype(jnp.int32) - 128
        hi = (xi - lo) >> 8
        di = d.astype(jnp.int8)
        p_lo = jax.lax.dot_general(
            di, lo.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        p_hi = jax.lax.dot_general(
            di, hi.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return ((p_hi.astype(jnp.float32) * 256.0)
                + p_lo.astype(jnp.float32)) * (1.0 / S2)

    int8_fixed2_k = make_kernel(int8_fixed2)

    print()
    timed("f32 Precision.HIGHEST (6-pass baseline)", f32_hi, D, x)
    timed("1x bf16 pass (split unit)", bf16_1, D, x)
    timed("1x int8 pass (quantize + s8s8s32 dot)", int8_1, D, x)
    timed("3x bf16 split (current 'exact')", split3_k, D, x)
    t4 = timed("int8 fixed-point 4-digit (exact)", int8_fixed4_k, D, x)
    t2 = timed("int8 fixed-point 2-digit (tf32-grade)", int8_fixed2_k, D, x)

    # numerical check vs float64
    truth = D_host.astype(np.float64) @ x_host.astype(np.float64)
    scale = np.abs(truth).max() + 1e-30
    for label, k in (("split3", split3_k), ("int8_fixed4", int8_fixed4_k),
                     ("int8_fixed2", int8_fixed2_k)):
        try:
            got = np.asarray(k(D, x))
        except Exception as e:  # noqa: BLE001
            print(f"{label}: numerics skipped ({type(e).__name__})")
            continue
        err = np.abs(got - truth).max() / scale
        print(f"{label}: max rel err vs f64 = {err:.3g}")


if __name__ == "__main__":
    main()
