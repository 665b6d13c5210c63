"""Command-line tools: evaluate CVs/forces and export models from files.

The reference ships no CLI (SURVEY.md §5.6 — the feature file is its whole
config system); these commands wrap the framework for production batch use:

    python -m molann_tpu info model.npz
    python -m molann_tpu evaluate model.npz traj.npy --out cvs.npy
    python -m molann_tpu forces model.npz traj.npy --component 0 --out f.npy
    python -m molann_tpu convert traj.dcd traj.npy --packed
    python -m molann_tpu export model.npz --n-atoms 22 --out model.stablehlo
    python -m molann_tpu build model.pdb features.txt --section Output \\
        --align "bynum 1 2 5" --mlp 8 5 3 --out model.npz
    python -m molann_tpu train model.npz traj.npy --loss eigenfunction \\
        --beta 4 --weights w.npy --steps 2000 --out trained.npz
    python -m molann_tpu sample model.npz model.pdb --bias metad \\
        --out sampled.xtc --bias-out bias.npz
    python -m molann_tpu fes bias.npz --grid=-3.2:3.2:200 --out fes.npy
    python -m molann_tpu import-torch reference_model.pt --out model.npz
    python -m molann_tpu export-torch trained.npz --out model.pt

Trajectories are ``.npy`` files ([n_frames, n_atoms, 3] or packed
[n_frames, 3n] float32) or CHARMM/NAMD ``.dcd``; evaluation streams
batches through the native loader and, on TPU, the fused kernels
(unrolled or blocked, auto-selected by system size — large systems never
fall back to the slow XLA path silently). Outputs stream to disk-backed
memmaps, so trajectory-sized results never sit in host RAM. Pass
``--devices N`` to evaluate/forces to shard batches over the device mesh
(the molann_tpu.serve path).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from . import analysis, evaluate, export, sampling, traj, train

    p = argparse.ArgumentParser(
        prog="molann_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)
    # registration order = --help listing order (kept from the
    # pre-package monolith)
    for mod in (evaluate, traj, export, sampling, analysis, train):
        mod.register(sub)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except BrokenPipeError:
        # stdout closed early (e.g. piped into `head`): exit quietly with
        # the conventional 128+SIGPIPE status instead of a traceback;
        # point stdout at devnull so the interpreter's final flush does
        # not raise again
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        return 141


if __name__ == "__main__":
    sys.exit(main())
