"""Component breakdown of the 10k-atom compact serving path (r5
VERDICT #6: the r4 validation recorded 37.6K frames/s with no analysis).

The r4 measurement dispatched 3 calls of 1024 frames and synced — at
the axon tunnel's ~27 ms per-dispatch overhead that IS 1024/0.027 =
37.6K f/s: a dispatch-RTT measurement, not a kernel one. This probe
separates the terms:

  - serving rate vs batch size and pipeline depth (dispatch-bound rates
    scale linearly with batch; HBM/kernel-bound rates plateau)
  - the transpose+gather front (x [l, n, 3] -> compact cmajor
    [3, n_active, l]) timed alone — the full-width HBM pass
  - the kernel timed from a PRE-COMPACTED cmajor input (what an MD
    engine holding the natural layout would pay)

Usage: python scripts/compact10k_probe.py [n_residues=2000] [log2_l=13]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import (FeatureLayer, MolANN,
                                       PreprocessingANN,
                                       create_sequential_nn)
    from molann_tpu.ops.fused import active_atom_indices, fused_cv_forces
    from molann_tpu.ops.fused_blocked import blocked_layout
    from molann_tpu.systems import synthetic_peptide

    n_res = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    log2_l = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    print(f"devices: {jax.devices()}", flush=True)

    u = synthetic_peptide(n_res)
    n = len(u.atoms)
    psel = lambda nm, r: u.select_atoms(f"name {nm} and resid {r}")  # noqa
    feats = []
    for k, r in enumerate(range(25, n_res - 25, 48)):
        feats.append(Feature(
            f"d{k}", "dihedral",
            psel("C", r) + psel("N", r + 1) + psel("CA", r + 1)
            + psel("C", r + 1)))
    for k, (i, j) in enumerate((100 + 90 * t, n_res - 100 - 90 * t)
                               for t in range(10)):
        feats.append(Feature(f"b{k}", "bond", psel("CA", i) + psel("CA", j)))
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    model = MolANN(pp, create_sequential_nn(
        [pp.output_dimension(), 16, 2], key=jax.random.PRNGKey(11)))
    act = active_atom_indices(model)
    lay = blocked_layout(pp.feature_layer._spec, None)
    print(f"n_atoms={n} features={len(feats)} active={len(act)} "
          f"tile(auto bwd)={lay.chunk if lay.mc else '-'}", flush=True)

    def rate(fn, args, l, depth):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        _ = float(leaf[(0,) * leaf.ndim])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(depth)]
        for o in outs:
            leaf = jax.tree_util.tree_leaves(o)[-1]
            _ = float(leaf[(0,) * leaf.ndim])
        return depth * l / (time.perf_counter() - t0)

    fcomp = jax.jit(lambda m, v: fused_cv_forces(
        m, v, mode="blocked", compact_grads=True))

    # -- rate vs batch size (depth 3, the r4 shape) and depth 8 ----------
    for log_b in (10, 12, log2_l):
        l = 1 << log_b
        xb = jax.jit(lambda b, key: b[None] + 0.05 * jax.random.normal(
            key, (l, n, 3)))(jnp.asarray(u.atoms.positions),
                             jax.random.PRNGKey(3))
        jax.block_until_ready(xb)
        r3 = rate(fcomp, (model, xb), l, 3)
        r8 = rate(fcomp, (model, xb), l, 8)
        print(f"batch {l:6d}: depth3 {r3/1e3:10.1f}K f/s   "
              f"depth8 {r8/1e3:10.1f}K f/s", flush=True)
        del xb

    # -- component split at the big batch --------------------------------
    l = 1 << log2_l
    xb = jax.jit(lambda b, key: b[None] + 0.05 * jax.random.normal(
        key, (l, n, 3)))(jnp.asarray(u.atoms.positions),
                         jax.random.PRNGKey(3))
    jax.block_until_ready(xb)
    act_j = jnp.asarray(act)

    # full-width transpose + gather only (the HBM-bound front)
    front = jax.jit(lambda v: jnp.transpose(v, (2, 1, 0))[:, act_j, :])
    rf = rate(front, (xb,), l, 8)
    print(f"front (transpose+gather) only:      {rf/1e3:10.1f}K f/s",
          flush=True)

    # full-width COMPONENT-MAJOR input [3, n, l] — the zero-copy layout
    # (_to_cmajor accepts it directly): the front collapses to the
    # 184-row gather, isolating kernel+gather from the transpose
    xcm = jax.jit(lambda v: jnp.transpose(v, (2, 1, 0)))(xb)
    jax.block_until_ready(xcm)
    rk = rate(fcomp, (model, xcm), l, 8)
    print(f"cmajor [3, n, l] input (no transpose): {rk/1e3:8.1f}K f/s",
          flush=True)

    # gather-free full pipeline one more time for the summary line
    r_all = rate(fcomp, (model, xb), l, 8)
    print(f"full path (natural [l, n, 3] in):   {r_all/1e3:10.1f}K f/s",
          flush=True)


if __name__ == "__main__":
    main()
