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

import numpy as np


def _load_model(path):
    from .io import load_model

    return load_model(path)


def _parse_grid(gridspec, d, *, subject=None):
    """Parse a ``lo:hi:n[,lo:hi:n...]`` grid option into ``d`` ``(lo, hi,
    n)`` triples, broadcasting a single spec to all dimensions — the one
    grammar shared by the fes/mep/msm/pmf subcommands (callers decide
    whether ``n`` means grid points or bins)."""
    specs = gridspec.split(",")
    if len(specs) == 1 and d > 1:
        specs = specs * d
    if len(specs) != d:
        prefix = f"{subject}; " if subject else ""
        raise SystemExit(f"error: {prefix}--grid needs 1 or {d} "
                         "lo:hi:n specs")
    out = []
    for spec in specs:
        try:
            lo, hi, n = spec.split(":")
            out.append((float(lo), float(hi), int(n)))
        except ValueError:
            raise SystemExit(f"error: bad --grid spec {spec!r} "
                             "(want lo:hi:n)")
    return out


def _open_traj_writer(out, *, xtc_precision=1000.0, with_box=False):
    """Incremental writer (context manager with ``append([c, n, 3])``) for
    ``.dcd``/``.trr``/``.xtc``/``.nc`` outputs, or None for ``.npy``
    paths — the
    single home of the per-extension writer dispatch ('convert',
    'sample' and 'unwrap' all write trajectories). With ``with_box``
    the returned writer's ``append`` takes ``(frames, box=[k, 3, 3])``
    regardless of format (DCD cell conversion handled here)."""
    low = str(out).lower()
    if low.endswith(".dcd"):
        from .io.dcd import DCDWriter

        if with_box:
            from .pbc import box_to_dcd_cell

            class _DCDBoxWriter(DCDWriter):
                def append(self, frames, box=None):
                    super().append(frames, cell=box_to_dcd_cell(box))

            return _DCDBoxWriter(out, has_cell=True)
        return DCDWriter(out)
    if low.endswith(".trr"):
        from .io.xdr import TRRWriter

        return TRRWriter(out)
    if low.endswith(".xtc"):
        from .io.xdr import XTCWriter

        return XTCWriter(out, precision=xtc_precision)
    if low.endswith(".nc") or low.endswith(".ncdf"):
        from .io.netcdf import NetCDFWriter

        return NetCDFWriter(out, with_box=with_box)
    return None


def cmd_info(args):
    model = _load_model(args.model)
    from .models.ann import MolANN

    print(f"model: {type(model).__name__}")
    if isinstance(model, MolANN):
        pp = model.get_preprocessing_layer()
        fl = pp.feature_layer
        print(f"output dimension (features): {pp.output_dimension()}")
        print(f"MLP dims: {list(model.ann_layers.layer_dims)}")
        print("features:")
        print(fl.get_feature_info().to_string())
        align = pp.align_layer
        if hasattr(align, "ref_x"):
            print(f"alignment: {len(align.align_atom_indices)} atoms, "
                  f"method={align.method}")
        else:
            print("alignment: none")
    return 0


def _model_dims(model):
    """(n_input_atoms, d_out) of a saved model."""
    from .models.ann import model_dims

    return model_dims(model)


def _traj_dims(path):
    """(n_frames, floats_per_frame) of a .npy/.dcd/.trr/.xtc/.nc trajectory."""
    from .io.reader import open_frame_reader

    try:
        _, n_frames, n_atoms = open_frame_reader(path)
    except ValueError as e:
        raise SystemExit(f"error: {e}")
    return n_frames, 3 * n_atoms


def _check_traj(path, n_atoms):
    """Validate trajectory shape against the model (explicit errors — the
    layer-level asserts vanish under ``python -O``)."""
    n_frames, fpf = _traj_dims(path)
    if fpf != 3 * n_atoms:
        raise SystemExit(
            f"error: trajectory {path} has {fpf // 3} atoms per frame; the "
            f"model takes {n_atoms}"
        )
    return n_frames


def _evaluate(args, want_forces):
    import jax
    import jax.numpy as jnp

    from .ops.fused import fused_cv_forces, fused_model_forward
    from .train.data import packed_batch_iterator
    from .train.forces import coordinate_gradients

    model = _load_model(args.model)
    n_atoms, d_out = _model_dims(model)
    n_frames = _check_traj(args.traj, n_atoms)

    if getattr(args, "devices", 0):
        # multi-device: stream through the mesh serving path
        # (molann_tpu.serve), results written straight into the memmaps
        from .parallel import data_mesh
        from .serve import evaluate_trajectory

        ndev = min(args.devices, len(jax.devices()))
        mesh = data_mesh(ndev)
        quantum = 8 * ndev
        bs = min(args.batch_size, -(-n_frames // quantum) * quantum)
        y_out = np.lib.format.open_memmap(
            args.out, mode="w+", dtype=np.float32, shape=(n_frames, d_out)
        )
        if want_forces:
            g_out = np.lib.format.open_memmap(
                args.forces_out, mode="w+", dtype=np.float32,
                shape=(n_frames, 3 * n_atoms),
            )
            evaluate_trajectory(
                model, args.traj, mesh=mesh, forces=True,
                batch_size=bs, tile=args.tile,
                interpret=args.interpret, backend=args.backend,
                component=getattr(args, "component", None),
                cvs_out=y_out, grads_out=g_out.reshape(-1, n_atoms, 3),
                grads_transform=np.negative,  # force convention, in-flight
            )
            g_out.flush()
        else:
            evaluate_trajectory(
                model, args.traj, mesh=mesh,
                batch_size=bs, tile=args.tile,
                interpret=args.interpret, backend=args.backend,
                cvs_out=y_out,
            )
        y_out.flush()
        print(f"wrote {args.out}: {y_out.shape} ({ndev} devices)")
        if want_forces:
            print(f"wrote {args.forces_out}: {g_out.shape}")
        return 0

    # fused Pallas kernels on TPU (or under --interpret); plain XLA
    # otherwise — CPU/GPU backends don't run compiled Mosaic kernels.
    # (TPU-proxy platforms may register under their own name while
    # reporting canonical platform "tpu"; accept both spellings.)
    use_fused = args.interpret or jax.default_backend() in ("tpu", "axon")
    # Large system + small CV set: compute gradients on the ACTIVE atoms
    # only (skips the full-width HBM scatter AND shrinks the
    # device-to-host transfer by n_atoms/n_active); untouched atoms have
    # exactly-zero forces, which the zero-initialized memmap provides.
    compact_idx = None
    if want_forces and use_fused:
        from .ops.fused import active_atom_indices, model_select_mode

        if model_select_mode(model) == "blocked":
            compact_idx = active_atom_indices(model)
    # Stream results straight to disk-backed arrays: a forces run over a
    # big trajectory would otherwise hold a trajectory-sized gradient
    # array in host RAM, defeating the streaming loader.
    y_out = np.lib.format.open_memmap(
        args.out, mode="w+", dtype=np.float32, shape=(n_frames, d_out)
    )
    g_out = None
    if want_forces:
        g_out = np.lib.format.open_memmap(
            args.forces_out, mode="w+", dtype=np.float32,
            shape=(n_frames, 3 * n_atoms),
        )
    n_done = 0
    component = getattr(args, "component", None)
    for xb in packed_batch_iterator(
        args.traj, args.batch_size, shuffle=False, epochs=1,
        drop_remainder=False, backend=args.backend,
    ):
        x = jnp.asarray(xb)
        if want_forces:
            if compact_idx is not None:
                y, g = fused_cv_forces(
                    model, x, component=component,
                    tile=args.tile, interpret=args.interpret,
                    compact_grads=True,
                )  # g: [3, n_active, l]
                blk = g_out[n_done : n_done + xb.shape[0]].reshape(
                    -1, n_atoms, 3
                )
                blk[:, compact_idx, :] = np.negative(
                    np.transpose(np.asarray(g), (2, 1, 0))
                )  # rest stays exactly zero
                y_out[n_done : n_done + xb.shape[0]] = np.asarray(y)
                n_done += xb.shape[0]
                if args.verbose:
                    print(f"\r{n_done}/{n_frames} frames", end="",
                          file=sys.stderr)
                continue
            if use_fused:
                y, g = fused_cv_forces(
                    model, x, component=component,
                    tile=args.tile, interpret=args.interpret,
                )
            else:
                x3 = x.reshape(x.shape[0], -1, 3)
                y = model(x3)
                g = coordinate_gradients(model, x3, component).reshape(
                    x.shape
                )
            g_out[n_done : n_done + xb.shape[0]] = np.negative(
                np.asarray(g)
            )  # force convention
        else:
            if use_fused:
                y = fused_model_forward(
                    model, x, tile=args.tile, interpret=args.interpret
                )
            else:
                y = model(x.reshape(x.shape[0], -1, 3))
        y_out[n_done : n_done + xb.shape[0]] = np.asarray(y)
        n_done += xb.shape[0]
        if args.verbose:
            print(f"\r{n_done}/{n_frames} frames", end="", file=sys.stderr)
    if args.verbose:
        print(file=sys.stderr)
    y_out.flush()
    print(f"wrote {args.out}: {y_out.shape}")
    if want_forces:
        g_out.flush()
        print(f"wrote {args.forces_out}: {g_out.shape}")
    return 0


def cmd_evaluate(args):
    return _evaluate(args, want_forces=False)


def cmd_forces(args):
    return _evaluate(args, want_forces=True)


def cmd_committee(args):
    """Committee CV evaluation: mean + disagreement over member models.

    The std over members is the epistemic-uncertainty / acquisition
    signal for adaptive sampling (train members with
    ``train --ensemble K``). With ``--calibrate REF_TRAJ`` the members
    are gauge-fixed (standardized + sign-aligned) on the reference
    frames first — required for CVs defined only up to sign/scale
    (autoencoder / VAMP / eigenfunction objectives).
    """
    import jax
    import jax.numpy as jnp

    from .io.reader import open_frame_reader
    from .train import (
        calibrated_committee,
        committee,
        committee_calibration,
        stack_models,
    )
    from .train.data import packed_batch_iterator

    models = [_load_model(p) for p in args.models]
    if len(models) < 2:
        print("error: a committee needs at least 2 member models",
              file=sys.stderr)
        return 1
    dims = [_model_dims(m) for m in models]
    if len(set(dims)) != 1:
        print(f"error: members disagree on (n_atoms, d_out): {dims}",
              file=sys.stderr)
        return 1
    n_atoms, d_out = dims[0]
    n_frames = _check_traj(args.traj, n_atoms)
    try:
        stacked = stack_models(models)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1

    calib = None
    if args.calibrate:
        read, n_ref, na_ref = open_frame_reader(args.calibrate,
                                                backend=args.backend)
        if na_ref != n_atoms:
            print(f"error: --calibrate trajectory has {na_ref} atoms per "
                  f"frame; the models take {n_atoms}", file=sys.stderr)
            return 1
        sel = np.unique(
            np.linspace(0, n_ref - 1,
                        min(n_ref, args.calibrate_frames)).astype(int)
        )
        x_ref = jnp.asarray(
            np.concatenate([read(int(i), 1) for i in sel], axis=0)
        )
        calib = committee_calibration(stacked, x_ref)
        fn = jax.jit(
            lambda x: calibrated_committee(stacked, x, calibration=calib)
        )
    else:
        fn = jax.jit(lambda x: committee(stacked, x))

    mean_out = np.lib.format.open_memmap(
        args.out, mode="w+", dtype=np.float32, shape=(n_frames, d_out)
    )
    std_out = np.lib.format.open_memmap(
        args.std_out, mode="w+", dtype=np.float32, shape=(n_frames, d_out)
    )
    n_done = 0
    for xb in packed_batch_iterator(
        args.traj, args.batch_size, shuffle=False, epochs=1,
        drop_remainder=False, backend=args.backend,
    ):
        x = jnp.asarray(xb).reshape(xb.shape[0], -1, 3)
        m, s = fn(x)
        mean_out[n_done : n_done + xb.shape[0]] = np.asarray(m)
        std_out[n_done : n_done + xb.shape[0]] = np.asarray(s)
        n_done += xb.shape[0]
    mean_out.flush()
    std_out.flush()
    mx = float(std_out.max()) if n_frames else 0.0
    print(f"wrote {args.out} (committee mean) and {args.std_out} "
          f"(disagreement): {mean_out.shape}, {len(models)} members"
          f"{', calibrated' if calib is not None else ''}; "
          f"max disagreement {mx:.4g}")
    return 0


def cmd_convert(args):
    """Convert between trajectory formats, streaming chunk-by-chunk (never
    holds the full trajectory in RAM). Inputs: .npy/.dcd/.trr/.xtc/.nc;
    outputs: .npy (frames or packed), .dcd, .trr, .xtc, .nc (Amber
    NetCDF). ``--scale``
    multiplies coordinates (e.g. 10 for GROMACS nm -> PDB/DCD Angstrom).
    Unit cells are PRESERVED when both formats carry them: the boxes
    ride one cheap header scan (coordinates still stream) and are
    scaled like the coordinates; ``--box lx,ly,lz`` overrides."""
    n_frames, fpf = _traj_dims(args.traj)
    n_atoms = fpf // 3
    chunk = max(1, int(args.chunk))
    out = str(args.out)
    scale = np.float32(args.scale)

    boxes = None
    if any(out.lower().endswith(e)
           for e in (".dcd", ".trr", ".xtc", ".nc", ".ncdf")):
        if args.box:
            try:
                lx, ly, lz = (float(v) for v in args.box.split(","))
            except ValueError:
                raise SystemExit(f"error: bad --box {args.box!r} "
                                 "(want lx,ly,lz)")
            # --box is given in OUTPUT units (per its help text): a
            # zero-copy broadcast view, never scaled by --scale
            boxes = np.broadcast_to(
                np.diag([lx, ly, lz]).astype(np.float32),
                (n_frames, 3, 3))
        else:
            from .io.reader import read_traj_boxes

            boxes = read_traj_boxes(args.traj)
            if boxes is not None and len(boxes) != n_frames:
                raise SystemExit(
                    f"error: {len(boxes)} boxes for {n_frames} frames")
            # scanned boxes are in input units: scale like coordinates
            if boxes is not None and scale != 1.0:
                boxes = boxes * scale  # f32 * f32, no upcast

    def chunks():
        from .io.reader import open_frame_reader

        read, _, _ = open_frame_reader(args.traj)
        for s in range(0, n_frames, chunk):
            c = min(chunk, n_frames - s)
            block = read(s, c).reshape(c, fpf)
            yield s, (block * scale if scale != 1.0 else block)

    writer = _open_traj_writer(out, xtc_precision=args.xtc_precision,
                               with_box=boxes is not None)
    if writer is not None:
        # all three writers are incremental: one chunk in flight at a time
        with writer:
            for s, c in chunks():
                if boxes is not None:
                    writer.append(c.reshape(-1, n_atoms, 3),
                                  box=boxes[s : s + c.shape[0]])
                else:
                    writer.append(c.reshape(-1, n_atoms, 3))
    else:
        shape = (n_frames, fpf) if args.packed else (n_frames, n_atoms, 3)
        dst = np.lib.format.open_memmap(
            out, mode="w+", dtype=np.float32, shape=shape
        )
        for s, c in chunks():
            dst[s : s + c.shape[0]] = c.reshape((c.shape[0],) + shape[1:])
        dst.flush()
    print(f"wrote {out}: {n_frames} frames x {n_atoms} atoms")
    return 0


def _load_frames_and_boxes(traj, boxarg):
    """Frames + per-frame box matrices for 'unwrap' (the one command that
    needs the boxes the codecs carry). Returns ``([l, n, 3] float32,
    [l, 3, 3] float32)``."""
    low = str(traj).lower()
    boxes = None
    if low.endswith(".xtc"):
        from .io.xdr import read_xtc

        frames, _, boxes = read_xtc(traj)
    elif low.endswith(".trr"):
        from .io.xdr import read_trr

        frames, _, boxes = read_trr(traj)
    elif low.endswith(".dcd"):
        from .io.dcd import read_dcd
        from .pbc import dcd_cell_to_box

        frames, cell = read_dcd(traj)
        if cell is not None:
            boxes = dcd_cell_to_box(cell)
    elif low.endswith(".nc") or low.endswith(".ncdf"):
        from .io.netcdf import read_netcdf

        frames, _, boxes = read_netcdf(traj)
    elif low.endswith(".npy"):
        frames = np.load(traj)
        if frames.ndim != 3 or frames.shape[2] != 3:
            raise SystemExit(f"error: {traj} must be [l, n, 3] frames "
                             f"for unwrap, got {frames.shape}")
        frames = frames.astype(np.float32)
    else:
        raise SystemExit(f"error: unsupported trajectory {traj!r} "
                         "(.xtc/.trr/.dcd/.nc/.npy)")
    if boxarg:
        try:
            lx, ly, lz = (float(v) for v in boxarg.split(","))
        except ValueError:
            raise SystemExit(f"error: bad --box {boxarg!r} (want lx,ly,lz)")
        boxes = np.broadcast_to(
            np.diag([lx, ly, lz]).astype(np.float32),
            (frames.shape[0], 3, 3))
    if boxes is None:
        raise SystemExit("error: the trajectory carries no box vectors; "
                         "pass --box lx,ly,lz (orthorhombic)")
    if boxes.shape[0] != frames.shape[0]:
        raise SystemExit(f"error: {boxes.shape[0]} boxes for "
                         f"{frames.shape[0]} frames (corrupt trajectory?)")
    if (np.abs(np.diagonal(boxes, axis1=1, axis2=2)) < 1e-6).any():
        raise SystemExit("error: trajectory box is zero/degenerate "
                         "(vacuum run?) — nothing to unwrap, or pass "
                         "--box to override")
    return frames, np.ascontiguousarray(boxes, dtype=np.float32)


def cmd_unwrap(args):
    """Repair periodic wrapping before feature extraction: 'whole'
    reassembles molecules broken across the box boundary (minimum image
    along a covalent bond tree guessed from the PDB; trjconv -pbc
    whole), 'nojump' makes trajectories continuous in time (trjconv
    -pbc nojump), 'whole+nojump' does both. The reference assumes whole
    molecules and has no PBC handling at all; without this, a wrapped
    GROMACS trajectory turns every boundary-crossing bond feature into
    garbage."""
    import jax
    import jax.numpy as jnp

    from .pbc import bond_tree_levels, guess_bonds, make_whole, unwrap_time
    from .topology import Universe

    frames, boxes = _load_frames_and_boxes(args.traj, args.box)
    modes = args.mode.split("+")
    for m in modes:
        if m not in ("whole", "nojump"):
            raise SystemExit(f"error: unknown --mode part {m!r} "
                             "(whole, nojump, or whole+nojump)")
    x = jnp.asarray(frames)
    bonds = None
    if "whole" in modes:
        u = Universe(args.pdb)
        if len(u.atoms) != frames.shape[1]:
            raise SystemExit(f"error: PDB has {len(u.atoms)} atoms, "
                             f"trajectory has {frames.shape[1]}")
        bonds = guess_bonds(u, tolerance=args.tolerance)
        if not len(bonds):
            raise SystemExit("error: no covalent bonds detected in the "
                             "PDB (unknown elements?); cannot make whole")
        levels = bond_tree_levels(frames.shape[1], bonds)
        x = jax.jit(lambda xx, bb: make_whole(xx, bb, levels=levels))(
            x, boxes)
    if "nojump" in modes:
        x = jax.jit(unwrap_time)(x, boxes)
    out_frames = np.asarray(x)

    # keep the cell with the repaired coordinates — downstream
    # box-consuming steps (a second unwrap pass, GROMACS tools) need it
    writer = _open_traj_writer(args.out, with_box=True)
    if writer is not None:
        with writer:
            writer.append(out_frames, box=np.asarray(boxes))
    else:
        np.save(args.out, out_frames)
    msg = (f"wrote {args.out}: {out_frames.shape[0]} frames x "
           f"{out_frames.shape[1]} atoms ({args.mode})")
    if bonds is not None:
        def max_bond(f):
            return float(np.linalg.norm(
                f[:, bonds[:, 0]] - f[:, bonds[:, 1]], axis=-1).max())

        msg += (f"; max bond length {max_bond(frames):.2f} -> "
                f"{max_bond(out_frames):.2f} over {len(bonds)} guessed "
                "bonds")
    print(msg)
    return 0


def cmd_export(args):
    from .io import export_stablehlo
    from .io.export import export_bundle

    model = _load_model(args.model)
    if args.batch_sizes:
        sizes = [int(b) for b in args.batch_sizes.split(",")]
        export_bundle(
            model, n_atoms=args.n_atoms, path=args.out,
            batch_sizes=sizes, with_gradient=args.with_gradient,
            fused=args.fused,
        )
        print(f"wrote {args.out} (bundle, buckets "
              f"{sorted(sizes, reverse=True)})")
        return 0
    if (args.raw_mlir or args.fused) and args.export_batch is None:
        raise SystemExit(
            "error: --raw-mlir/--fused require --batch (fixed shape)")
    export_stablehlo(
        model, n_atoms=args.n_atoms, path=args.out,
        with_gradient=args.with_gradient,
        batch_size=args.export_batch, raw_mlir=args.raw_mlir,
        fused=args.fused,
    )
    print(f"wrote {args.out}")
    return 0


def cmd_sample(args):
    """Biased (or plain) Langevin sampling along a saved model's CVs on
    the toy internal-coordinate potential — the closed enhanced-sampling
    loop from the command line (see molann_tpu.sampling /
    examples/biased_dynamics.py for the library form)."""
    import jax
    import jax.numpy as jnp

    from .sampling import (
        ToyPeptidePotential,
        baoab_langevin,
        metadynamics_langevin,
        opes_langevin,
        overdamped_langevin,
        steered_langevin,
    )
    from .topology import Universe

    model = _load_model(args.model)
    u = Universe(args.pdb)
    free = tuple(int(a) - 1 for a in args.free_torsion.split(","))
    if len(free) != 4:
        raise SystemExit("error: --free-torsion needs 4 comma-separated "
                         "1-based atom serials")
    pot = ToyPeptidePotential(u, free_torsion=free, barrier=args.barrier)
    energy = pot.energy
    if args.path:
        from .sampling import PathCV

        path = PathCV.from_mep(args.path)
        if args.tube_k > 0:
            wall = path.wall(model, k_wall=args.tube_k,
                             t_max=args.tube_max)
            energy = lambda x: pot.energy(x) + wall(x)  # noqa: E731
        model = path.along(model)  # bias acts on the 1-D progress s
    n = len(u.atoms)
    x0 = jnp.asarray(
        np.repeat(u.atoms.positions[None], args.walkers, axis=0)
    )
    key = jax.random.PRNGKey(args.seed)
    if args.integrator == "baoab" and args.bias != "none":
        raise SystemExit("error: --integrator baoab currently supports "
                         "--bias none only (biased runs use the "
                         "overdamped integrator)")
    bias = None
    if args.bias == "none":
        if args.integrator == "baoab":
            masses = u.atoms.masses.astype(np.float32)
            if (masses <= 0).any():
                raise SystemExit("error: could not guess a mass for every "
                                 "atom in the PDB (unknown element)")
            traj, _, _ = baoab_langevin(
                energy, x0, n_steps=args.steps, dt=args.dt,
                kT=args.kT, gamma=args.gamma, mass=masses, key=key,
                thin=args.thin,
            )
        else:
            traj, _ = overdamped_langevin(
                energy, x0, n_steps=args.steps, dt=args.dt, kT=args.kT,
                key=key, thin=args.thin,
            )
    elif args.bias == "metad":
        traj, _, bias = metadynamics_langevin(
            energy, model, x0, n_steps=args.steps, dt=args.dt,
            kT=args.kT, key=key, height=args.height, sigma=args.sigma,
            stride=args.stride,
            well_tempered_gamma=args.well_tempered_gamma,
        )
    elif args.bias == "opes":
        traj, _, bias = opes_langevin(
            energy, model, x0, n_steps=args.steps, dt=args.dt,
            kT=args.kT, key=key, sigma=args.sigma, stride=args.stride,
            barrier=args.bias_barrier, gamma=args.bias_gamma,
        )
    elif args.bias == "steered":
        if args.s0 is None or args.s1 is None:
            raise SystemExit(
                "error: --bias steered requires --s0 and --s1 "
                "(comma-separated start/end CV values)")
        s0 = [float(v) for v in args.s0.split(",")]
        s1 = [float(v) for v in args.s1.split(",")]
        traj, _ = steered_langevin(
            energy, model, x0, s0=s0, s1=s1,
            k_spring=args.k_spring, n_steps=args.steps, dt=args.dt,
            kT=args.kT, key=key, thin=args.thin,
        )
    else:  # pragma: no cover — argparse choices guard this
        raise SystemExit(f"unknown bias {args.bias}")

    frames = np.asarray(traj).reshape(-1, n, 3)
    writer = _open_traj_writer(args.out)
    if writer is not None:
        with writer:
            writer.append(frames)
    else:
        np.save(args.out, frames)
    cos_phi = np.cos(np.asarray(pot.phi(jnp.asarray(frames))))
    print(f"wrote {args.out}: {frames.shape[0]} frames "
          f"({args.walkers} walker(s) x {frames.shape[0] // args.walkers} "
          f"records); free-torsion cos(phi) in "
          f"[{cos_phi.min():+.2f}, {cos_phi.max():+.2f}]")
    if bias is not None and args.bias_out:
        bias.save(args.bias_out)
        print(f"wrote {args.bias_out}: {bias.centers.shape[0]} deposits")
    return 0


def cmd_fes(args):
    """Reconstruct the free-energy surface from a saved bias file
    (``sample --bias-out``): metadynamics hills give F(s) = -V(s)
    (scaled by gamma/(gamma-1) for well-tempered runs), OPES kernel
    files give -kT log of the reweighted probability estimate; shifted
    so min F = 0 on the grid."""
    from .sampling import load_bias

    bias = load_bias(args.hills)
    d = bias.centers.shape[1]
    axes = [
        np.linspace(lo, hi, n, dtype=np.float32)
        for lo, hi, n in _parse_grid(args.grid, d,
                                     subject=f"hills are {d}-dimensional")
    ]
    mesh = np.meshgrid(*axes, indexing="ij")
    grid = np.stack([m.ravel() for m in mesh], axis=-1)
    f = np.array(bias.free_energy_estimate(grid))
    f -= f.min()
    shape = tuple(len(a) for a in axes)
    from .sampling import OpesBias

    if isinstance(bias, OpesBias):
        kind = f"OPES (gamma={bias.gamma:g}, barrier={bias.barrier:g})"
    else:
        kind = (f"well-tempered (gamma={bias.gamma:g})"
                if bias.gamma is not None else "standard")
    print(f"{args.hills}: {int(bias.n_active)} {kind} deposits, "
          f"{d}-d CV; barrier estimate (max-min on grid) = "
          f"{f.max():.4f}")
    if args.out:
        if args.out.endswith(".csv"):
            with open(args.out, "w") as fh:
                fh.write(",".join(f"s{i}" for i in range(d))
                         + ",free_energy\n")
                for row, val in zip(grid, f):
                    fh.write(",".join(f"{v:.6g}" for v in row)
                             + f",{val:.6g}\n")
        else:
            np.save(args.out, f.reshape(shape))
        print(f"wrote {args.out}: grid {shape}")
    return 0


def cmd_reweight(args):
    """Per-frame importance weights from a saved bias + the frames' CV
    values ('evaluate' output): w_t ∝ exp(+V(s_t)/kT), normalized to
    mean 1 — the last-bias estimator. Feed the output straight into
    ``train --weights`` to retrain CV models on unbiased statistics
    recovered from biased trajectories (the adaptive loop of the
    reference's research workflow, from the command line)."""
    import jax.numpy as jnp

    from .sampling import OpesBias, load_bias

    bias = load_bias(args.bias)
    cvs = np.asarray(np.load(args.cvs), np.float32)
    if cvs.ndim == 1:
        cvs = cvs[:, None]
    d = bias.centers.shape[1]
    if cvs.ndim != 2 or cvs.shape[1] != d:
        raise SystemExit(f"error: bias is over a {d}-d CV; {args.cvs} "
                         f"has shape {np.load(args.cvs, mmap_mode='r').shape}")
    if isinstance(bias, OpesBias):
        kT = args.kT if args.kT is not None else bias.kT
        w = bias.frame_weights(jnp.asarray(cvs), kT)
    else:
        if args.kT is None:
            raise SystemExit("error: hills files carry no temperature; "
                             "pass --kT (the sampling temperature)")
        w = bias.frame_weights(jnp.asarray(cvs), args.kT)
    w = np.asarray(w, np.float32)
    np.save(args.out, w)
    ess = float(w.sum() ** 2 / (w**2).sum())
    print(f"wrote {args.out}: {w.shape[0]} weights, effective sample "
          f"size {ess:.1f} ({100.0 * ess / w.shape[0]:.1f}%)")
    return 0


def _make_optimizer(args):
    """optax optimizer from the train CLI flags: choice of update rule,
    learning-rate schedule, and optional global-norm gradient clipping."""
    import optax

    lr = args.lr
    if args.lr_schedule == "constant":
        sched = lr
    elif args.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            lr, max(1, args.steps), alpha=args.final_lr_scale)
    elif args.lr_schedule == "warmup-cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, min(args.warmup_steps, args.steps),
            max(1, args.steps), end_value=lr * args.final_lr_scale)
    else:  # exponential: reach lr*final_lr_scale at the last step
        sched = optax.exponential_decay(
            lr, max(1, args.steps), max(args.final_lr_scale, 1e-8))
    makers = {
        "adam": lambda s: optax.adam(s),
        "adamw": lambda s: optax.adamw(s, weight_decay=args.weight_decay),
        "sgd": lambda s: optax.sgd(s, momentum=args.momentum),
        "rmsprop": lambda s: optax.rmsprop(s),
    }
    opt = makers[args.optimizer](sched)
    if args.grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(args.grad_clip), opt)
    return opt


def cmd_mep(args):
    """Minimum free-energy path (simplified string method) on a
    reconstructed FES: input is either a metadynamics hills file
    (``sample --bias-out``; the smooth analytic bias is differentiated
    directly) or a gridded FES .npy (``fes``/``pmf`` output) with its
    --grid spec (multilinear interpolation)."""
    import jax.numpy as jnp

    from .sampling import grid_interpolator, linear_path, string_method

    start = np.asarray([float(v) for v in args.start.split(",")],
                       np.float32)
    end = np.asarray([float(v) for v in args.end.split(",")], np.float32)
    if start.shape != end.shape:
        raise SystemExit("error: --start and --end dimensions differ")
    d = len(start)

    if str(args.fes).endswith(".npz"):
        from .sampling import OpesBias, load_bias

        bias = load_bias(args.fes)
        if bias.centers.shape[1] != d:
            raise SystemExit(f"error: hills are {bias.centers.shape[1]}-"
                             f"dimensional, endpoints are {d}-dimensional")
        if isinstance(bias, OpesBias):
            energy = bias.free_energy_estimate  # smooth, differentiable
        else:
            scale = (bias.gamma / (bias.gamma - 1.0)
                     if bias.gamma is not None else 1.0)

            def energy(z):
                return -scale * bias.energy(z)
    else:
        table = np.load(args.fes)
        if table.ndim == 2 and table.shape[0] == 2 and d == 1:
            # 'pmf' output convention: [2, n] = mids + F
            mids, table = [table[0]], table[1]
        else:
            if table.ndim != d:
                raise SystemExit(f"error: FES grid is {table.ndim}-"
                                 f"dimensional, endpoints are {d}-"
                                 "dimensional")
            if not args.grid:
                raise SystemExit("error: a gridded FES .npy needs --grid "
                                 "(the same lo:hi:n spec given to 'fes')")
            mids = []
            for (lo, hi, n), n_have in zip(_parse_grid(args.grid, d),
                                           table.shape):
                if n != n_have:
                    raise SystemExit(f"error: --grid says {n} points but "
                                     f"the FES axis has {n_have}")
                mids.append(np.linspace(lo, hi, n))
        finite = np.isfinite(table)
        fill = (float(table[finite].max()) + 5.0 if finite.any() and
                not finite.all() else None)
        energy = grid_interpolator(mids, table, fill=fill)

    imgs, e = string_method(energy, linear_path(start, end, args.images),
                            n_iterations=args.iterations, step=args.step,
                            pin_ends=args.pin_ends)
    imgs, e = np.asarray(imgs), np.asarray(e)
    top = int(e.argmax())
    print(f"string converged over {args.iterations} iterations: "
          f"endpoints F = {e[0]:.4f} / {e[-1]:.4f}, barrier F = "
          f"{e.max():.4f} at image {top} "
          f"({', '.join(f'{v:.4f}' for v in imgs[top])})"
          + ("" if 0 < top < len(e) - 1 else
             " [WARNING: barrier at an endpoint — string may not bracket "
             "a transition]"))
    if args.out:
        if str(args.out).endswith(".csv"):
            with open(args.out, "w") as fh:
                fh.write(",".join(f"cv{i}" for i in range(d))
                         + ",free_energy\n")
                for row, v in zip(imgs, e):
                    fh.write(",".join(f"{c:.6g}" for c in row)
                             + f",{v:.6g}\n")
        else:
            np.save(args.out, np.concatenate([imgs, e[:, None]], axis=1))
        print(f"wrote {args.out}: {len(e)} images")
    return 0


def cmd_msm(args):
    """Markov state model over a CV trajectory ('evaluate' output):
    grid-discretize, count lag transitions, reversible-MLE transition
    matrix, implied timescales + Chapman-Kolmogorov Markovianity check."""
    from .sampling import ck_test, estimate_msm, grid_assign

    cvs = np.load(args.cvs)
    if cvs.ndim == 1:
        cvs = cvs[:, None]
    if cvs.ndim != 2:
        raise SystemExit(f"error: CVs must be [T] or [T, d], got "
                         f"{cvs.shape}")
    d = cvs.shape[1]
    edges = [
        np.linspace(lo, hi, n + 1)  # n = bin count for msm
        for lo, hi, n in _parse_grid(args.grid, d,
                                     subject=f"CVs are {d}-dimensional")
    ]
    n_states = int(np.prod([len(e) - 1 for e in edges]))

    labels = grid_assign(cvs, edges)
    if args.walkers > 1:
        if len(labels) % args.walkers:
            raise SystemExit(f"error: {len(labels)} samples do not "
                             f"divide into {args.walkers} walkers")
        # 'sample'/'evaluate' trajectories interleave walkers per record
        # ([t0w0, t0w1, ...]); split into one contiguous series each
        lw = labels.reshape(-1, args.walkers)
        series = [lw[:, w] for w in range(args.walkers)]
    else:
        series = labels

    m = estimate_msm(series, n_states, args.lag,
                     reversible=not args.nonreversible)
    pop = np.flatnonzero(m.pi > 0)
    print(f"{n_states} grid states ({pop.size} populated), lag "
          f"{args.lag} frames")
    order = pop[np.argsort(-m.pi[pop])][:5]
    print("top states by stationary weight: "
          + ", ".join(f"#{s}: {m.pi[s]:.3f}" for s in order))
    ts = m.timescales()
    k = min(args.n_timescales, len(ts))
    print("implied timescales (frames): "
          + ", ".join("inf" if not np.isfinite(t) else f"{t:.1f}"
                      for t in ts[:k]))
    extra_out = {}
    if args.bootstrap:
        from .sampling import bootstrap_msm

        boot = bootstrap_msm(
            series, n_states, args.lag, n_samples=args.bootstrap,
            reversible=not args.nonreversible, n_timescales=k,
            seed=args.bootstrap_seed,
        )
        lo, hi = boot.timescale_ci()

        def fmt(v):
            return "inf" if not np.isfinite(v) else f"{v:.1f}"

        unit = ("trajectories" if args.walkers > 1
                else f"{boot.block}-frame circular blocks")
        print(f"bootstrap ({args.bootstrap} resamples of "
              f"{boot.n_resampled} {unit}), 95% CIs: "
              + ", ".join(f"[{fmt(a)}, {fmt(b)}]"
                          for a, b in zip(lo, hi)))
        pi_lo, pi_hi = boot.pi_ci()
        print("top-state populations: "
              + ", ".join(
                  f"#{s}: {m.pi[s]:.3f} [{pi_lo[s]:.3f}, {pi_hi[s]:.3f}]"
                  for s in order))
        extra_out.update(bootstrap_timescales=boot.timescales,
                         bootstrap_pi=boot.pi)
    if args.coarse:
        # one PCCA+ eigendecomposition serves both outputs
        tc, pic, chi = m.coarse_grain(args.coarse)
        assign = chi.argmax(axis=1)
        order_c = np.argsort(-pic)
        print(f"PCCA+ coarse-graining into {args.coarse} metastable "
              "sets (by weight): "
              + "; ".join(
                  f"set {int(c)}: pi={pic[c]:.3f}, states "
                  f"{np.flatnonzero((assign == c) & (m.pi > 0)).tolist()}"
                  for c in order_c))
        extra_out.update(assignments=assign, memberships=chi,
                         coarse_transition=tc, coarse_pi=pic)
    if args.mfpt_to:
        tgt = [int(s) for s in args.mfpt_to.split(",")]
        try:
            fp = m.mfpt(tgt)
        except ValueError as e:
            raise SystemExit(f"error: --mfpt-to: {e}")
        src = np.flatnonzero((m.pi > 0) & np.isfinite(fp) & (fp > 0))
        if src.size:
            wavg = float((fp[src] * m.pi[src]).sum() / m.pi[src].sum())
            print(f"MFPT to states {tgt}: pi-weighted mean "
                  f"{wavg:.1f} frames, max {fp[src].max():.1f} "
                  f"(from state {int(src[fp[src].argmax()])})")
        else:
            print(f"MFPT to states {tgt}: no populated source state "
                  "reaches the target")
        extra_out.update(mfpt=fp)
    if args.tpt:
        if ":" not in args.tpt:
            raise SystemExit("error: --tpt wants A1[,A2..]:B1[,B2..] "
                             "(colon-separated source/target state sets)")
        a_spec, b_spec = args.tpt.split(":", 1)
        src = [int(s) for s in a_spec.split(",")]
        tgt = [int(s) for s in b_spec.split(",")]
        r = m.tpt(src, tgt)
        print(f"TPT {src} -> {tgt}: rate {r.rate:.3e} /frame "
              f"(total reactive flux {r.total_flux:.3e} /lag)")
        for path, fx in r.pathways(n_paths=3):
            share = fx / r.total_flux if r.total_flux > 0 else 0.0
            print("  pathway " + " -> ".join(str(s) for s in path)
                  + f": {share:.0%} of the flux")
        extra_out.update(committor=r.q_plus, backward_committor=r.q_minus,
                         net_flux=r.net_flux, rate=np.float64(r.rate))
    n_frames = len(series[0]) if isinstance(series, list) else len(series)
    factors = tuple(f for f in (2, 4) if args.lag * f < n_frames // 10)
    if factors:
        errs = ck_test(series, n_states, args.lag, factors=factors,
                       reversible=not args.nonreversible)
        print("Chapman-Kolmogorov max|T(lag)^k - T(k lag)|: "
              + ", ".join(f"k={k_}: {v:.4f}" for k_, v in errs.items())
              + ("  [OK: Markovian at this lag]"
                 if max(errs.values()) < 0.1 else
                 "  [WARNING: memory at this lag — increase --lag or "
                 "refine the CVs]"))
    if args.out:
        np.savez(args.out, transition=m.transition, pi=m.pi,
                 lag=m.lag, eigenvalues=m.eigenvalues, **extra_out,
                 **{f"edges_{i}": e for i, e in enumerate(edges)})
        print(f"wrote {args.out}")
    return 0


def cmd_pmf(args):
    """Free-energy profile from umbrella-sampling windows via MBAR.

    Input: ``cvs.npy`` shaped [n_windows, n_samples] (one row of CV
    samples per window, e.g. from
    :func:`molann_tpu.sampling.umbrella_sampling`), plus the window
    centers and spring constant. Writes/prints F over --grid.
    """
    from .sampling import mbar, pmf_from_samples

    cvs = np.asarray(np.load(args.cvs), np.float32)
    if cvs.ndim != 2:
        raise SystemExit(f"error: {args.cvs} must be [n_windows, "
                         f"n_samples]; got shape {cvs.shape}")
    centers = np.asarray([float(v) for v in args.centers.split(",")],
                         np.float32)
    if len(centers) != cvs.shape[0]:
        raise SystemExit(f"error: {len(centers)} centers for "
                         f"{cvs.shape[0]} windows")
    pooled = cvs.reshape(-1)
    u_kn = (0.5 * args.k_spring
            * (pooled[None, :] - centers[:, None]) ** 2) / args.kT
    f_win, log_w = mbar(u_kn, np.full(cvs.shape[0], cvs.shape[1]))
    (lo, hi, n), = _parse_grid(args.grid, 1)
    edges = np.linspace(lo, hi, n + 1)  # n = bin count
    f = pmf_from_samples(pooled, log_w, edges, kT=args.kT)
    mids = (edges[1:] + edges[:-1]) / 2
    ok = np.isfinite(f)
    print(f"{args.cvs}: {cvs.shape[0]} windows x {cvs.shape[1]} samples; "
          f"window free energies (kT units, f0=0): "
          + ", ".join(f"{v:.3f}" for v in np.asarray(f_win)))
    print(f"PMF barrier estimate (max-min over populated bins) = "
          f"{f[ok].max():.4f}")
    if args.out:
        if str(args.out).endswith(".csv"):
            with open(args.out, "w") as fh:
                fh.write("cv,free_energy\n")
                for m, v in zip(mids, f):
                    fh.write(f"{m:.6g},{v:.6g}\n")
        else:
            np.save(args.out, np.stack([mids, f]))
        print(f"wrote {args.out}: {ok.sum()}/{len(f)} bins populated")
    return 0


def cmd_train(args):
    """Train a saved model on a trajectory.

    The reference ships no training loop (SURVEY.md §2.3); this wraps
    :func:`molann_tpu.train.fit` for the objectives that need no extra
    Python: MSE regression onto per-frame targets, the variational
    generator-eigenfunction loss, the variational committor loss, the
    VAMP-2 time-lagged loss (pairs from a contiguous trajectory), and
    the autoencoder / time-lagged-autoencoder reconstruction losses
    (saved model's MLP = encoder, a fresh decoder is trained jointly
    and discarded unless --decoder-out). The weighted objectives accept
    per-frame importance weights (e.g. metadynamics frame weights from
    ``molann_tpu sample``/``fes``) to train on reweighted biased data.
    """
    import jax.numpy as jnp

    from .io import save_model
    from .train import (
        TrajectoryDataset,
        batch_iterator,
        fit,
        make_eigenfunction_loss,
        mse_loss,
    )

    if args.bagging and not args.ensemble:
        print("error: --bagging requires --ensemble K", file=sys.stderr)
        return 1
    model = _load_model(args.model)
    ds = TrajectoryDataset(args.traj)
    n = len(ds)

    targets = weights = labels = None
    if args.loss != "mse" and args.weights:
        weights = np.asarray(np.load(args.weights), np.float32)
        if weights.shape != (n,):
            print(f"error: weights shape {weights.shape} != ({n},)",
                  file=sys.stderr)
            return 1
    # per-loss default penalty weight: orthonormality (eigenfunction)
    # converges around 10, boundary conditions (committor) need ~100
    alpha = args.alpha if args.alpha is not None else (
        100.0 if args.loss == "committor" else 10.0)
    if args.loss == "mse":
        if not args.targets:
            print("error: --loss mse requires --targets", file=sys.stderr)
            return 1
        targets = np.load(args.targets, mmap_mode="r")
        if len(targets) != n:
            print(f"error: targets rows {len(targets)} != frames {n}",
                  file=sys.stderr)
            return 1
        loss_fn = mse_loss
    elif args.loss == "eigenfunction":
        loss_fn = make_eigenfunction_loss(beta=args.beta, alpha=alpha)
    elif args.loss == "committor":
        from .train import make_committor_loss

        if not args.labels:
            print("error: --loss committor requires --labels "
                  "(per-frame basin labels: 1=A, 2=B, 0=neither)",
                  file=sys.stderr)
            return 1
        labels = np.asarray(np.load(args.labels)).astype(np.int32)
        if labels.shape != (n,):
            print(f"error: labels shape {labels.shape} != ({n},)",
                  file=sys.stderr)
            return 1
        if not ((labels == 1).any() and (labels == 2).any()):
            print("error: labels must mark at least one frame in each "
                  "basin (1=A, 2=B)", file=sys.stderr)
            return 1
        loss_fn = make_committor_loss(beta=args.beta, alpha=alpha)
    elif args.loss == "vamp":
        from .train import make_vamp_loss

        if args.lag < 1 or args.lag >= n:
            print(f"error: --lag must be in [1, {n}) for this trajectory",
                  file=sys.stderr)
            return 1
        loss_fn = make_vamp_loss()
    else:  # autoencoder / tae: the saved MolANN's MLP is the encoder; a
        # fresh decoder reconstructs the feature vector (tae: the feature
        # vector a lag LATER) and is discarded (or saved via
        # --decoder-out) after training
        import jax

        from .ann import create_sequential_nn
        from .models.ann import MolANN as _MolANN
        from .train import autoencoder_loss, timelagged_autoencoder_loss

        if not isinstance(model, _MolANN):
            print(f"error: --loss {args.loss} needs a MolANN model "
                  "(build with --mlp: the MLP is the encoder)",
                  file=sys.stderr)
            return 1
        if args.loss == "tae" and not 1 <= args.lag < n:
            print(f"error: --lag must be in [1, {n}) for this trajectory",
                  file=sys.stderr)
            return 1
        k = model.ann_layers.output_dimension()
        fdim = model.preprocessing_layer.output_dimension()
        dec_dims = [k, *(args.decoder_hidden or []), fdim]
        decoder = create_sequential_nn(
            dec_dims, key=jax.random.PRNGKey(args.seed + 1)
        )

        if args.loss == "tae":

            def loss_fn(pair, batch):
                m, dec = pair
                x_t, x_tau, w = (batch if len(batch) == 3
                                 else (*batch, None))
                return timelagged_autoencoder_loss(
                    m.ann_layers, dec, m.preprocessing_layer, x_t, x_tau,
                    weights=w,
                )
        else:

            def loss_fn(pair, batch):
                m, dec = pair
                if isinstance(batch, (tuple, list)):
                    x, w = batch
                else:
                    x, w = batch, None
                return autoencoder_loss(
                    m.ann_layers, dec, m.preprocessing_layer, x, weights=w
                )

        model = (model, decoder)

    mesh = None
    multiple = 1
    if args.devices:
        import jax

        from .parallel import data_mesh

        ndev = min(args.devices, len(jax.devices()))
        mesh = data_mesh(ndev)
        multiple = ndev

    def batches():
        if args.loss in ("vamp", "tae"):
            from .train import lagged_pair_iterator

            for pair in lagged_pair_iterator(
                ds, args.batch_size, args.lag, seed=args.seed,
                multiple_of=multiple, weights=weights,
            ):
                yield tuple(jnp.asarray(a) for a in pair)
            return
        it = batch_iterator(ds, args.batch_size, seed=args.seed,
                            multiple_of=multiple, return_indices=True)
        for x, idx in it:
            x = jnp.asarray(x)
            if targets is not None:
                yield (x, jnp.asarray(np.asarray(targets[idx], np.float32)))
            elif labels is not None:
                if weights is not None:
                    yield (x, jnp.asarray(labels[idx]),
                           jnp.asarray(weights[idx]))
                else:
                    yield (x, jnp.asarray(labels[idx]))
            elif weights is not None:
                yield (x, jnp.asarray(weights[idx]))
            else:
                yield x

    if args.ensemble:
        # committee training: K freshly-initialized members through ONE
        # compiled vmapped step (train/ensemble.py); members are written
        # as out-stem.member{i}.npz for the `committee` subcommand.
        from pathlib import Path

        from .train import fit_ensemble, reinitialized_members, unstack_model

        if args.ensemble < 2:
            print("error: --ensemble needs at least 2 members",
                  file=sys.stderr)
            return 1
        if args.checkpoint_dir:
            print("error: --checkpoint-dir is not supported with "
                  "--ensemble", file=sys.stderr)
            return 1
        if args.decoder_out:
            print("error: --decoder-out is not supported with --ensemble "
                  "(per-member decoders are discarded)", file=sys.stderr)
            return 1
        try:
            members = reinitialized_members(model, args.ensemble,
                                            seed=args.seed)
        except TypeError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        res = fit_ensemble(
            members, loss_fn, batches(), optimizer=_make_optimizer(args),
            mesh=mesh, num_steps=args.steps, log_every=args.log_every,
            bagging=args.bagging, seed=args.seed,
        )
        out = Path(args.out)
        for i in range(args.ensemble):
            m = unstack_model(res.models, i)
            if args.loss in ("autoencoder", "tae"):
                m = m[0]
            save_model(str(out.with_name(f"{out.stem}.member{i}"
                                         f"{out.suffix}")), m)
        first = float(np.mean(res.losses[0]))
        last = float(np.mean(res.losses[-1]))
        print(f"trained committee of {args.ensemble} for "
              f"{len(res.losses)} steps: committee-mean loss "
              f"{first:.6g} -> {last:.6g}; wrote "
              f"{out.with_name(out.stem)}.member0..{args.ensemble - 1}"
              f"{out.suffix}")
        return 0

    res = fit(model, loss_fn, batches(),
              optimizer=_make_optimizer(args), mesh=mesh,
              num_steps=args.steps, log_every=args.log_every,
              checkpoint_dir=args.checkpoint_dir,
              checkpoint_every=args.checkpoint_every)
    trained = res.model
    if args.loss in ("autoencoder", "tae"):
        trained, decoder = trained
        if args.decoder_out:
            save_model(args.decoder_out, decoder)
    save_model(args.out, trained)
    print(f"trained {len(res.losses)} steps: loss {res.losses[0]:.6g} -> "
          f"{res.losses[-1]:.6g}; wrote {args.out}")
    if args.loss == "eigenfunction":
        # report the learned spectrum on an evenly-spaced frame sample
        from .train import eigenfunction_loss

        sel = np.unique(np.linspace(0, n - 1, min(n, 4096)).astype(int))
        xs = jnp.asarray(ds[sel])
        ws = jnp.asarray(weights[sel]) if weights is not None else None
        _, aux = eigenfunction_loss(
            trained, xs, beta=args.beta, alpha=alpha,
            weights=ws, return_aux=True,
        )
        eigs = np.asarray(aux["eigenvalues"])
        print("estimated generator eigenvalues (ascending = slowest "
              "first): " + ", ".join(f"{e:.4g}" for e in eigs))
    elif args.loss == "committor":
        # report how well the boundary conditions are honored
        from .train import committor_loss

        sel = np.unique(np.linspace(0, n - 1, min(n, 4096)).astype(int))
        xs = jnp.asarray(ds[sel])
        ws = jnp.asarray(weights[sel]) if weights is not None else None
        _, aux = committor_loss(
            trained, xs, jnp.asarray(labels[sel]), beta=args.beta,
            alpha=alpha, weights=ws, return_aux=True,
        )
        print(f"committor diagnostics: mean q(A) = "
              f"{float(aux['mean_q_a']):.4f} (want 0), mean q(B) = "
              f"{float(aux['mean_q_b']):.4f} (want 1), Dirichlet energy "
              f"= {float(aux['dirichlet']):.4g}")
    elif args.loss == "tae":
        # report the learned CVs' lag autocorrelations + implied timescales
        from .train import tica

        sel = np.unique(
            np.linspace(0, n - 1 - args.lag, min(n - args.lag, 4096))
            .astype(int)
        )
        r = tica(trained(jnp.asarray(ds[sel])),
                 trained(jnp.asarray(ds[sel + args.lag])), lag=args.lag)
        ts = r.timescales()
        print(f"TAE CV lag-{args.lag} autocorrelations (slowest first): "
              + ", ".join(f"{a:.4f}" for a in r.eigenvalues)
              + "; implied timescales (frames): "
              + ", ".join("inf" if not np.isfinite(t) else f"{t:.1f}"
                          for t in ts))
    elif args.loss == "vamp":
        # report the learned CVs' lag autocorrelations + implied timescales
        from .train import vamp2_loss

        sel = np.unique(
            np.linspace(0, n - 1 - args.lag, min(n - args.lag, 4096))
            .astype(int)
        )
        ws = jnp.asarray(weights[sel]) if weights is not None else None
        _, aux = vamp2_loss(
            trained, jnp.asarray(ds[sel]), jnp.asarray(ds[sel + args.lag]),
            weights=ws, return_aux=True,
        )
        ac = np.asarray(aux["autocorrelations"], np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ts = np.where((ac > 0) & (ac < 1), -args.lag / np.log(ac),
                          np.inf)
        print(f"VAMP-2 score = {float(aux['vamp2']):.4f}; CV lag-"
              f"{args.lag} autocorrelations (slowest first): "
              + ", ".join(f"{a:.4f}" for a in ac)
              + "; implied timescales (frames): "
              + ", ".join(f"{t:.1f}" for t in ts))
    return 0


def cmd_build(args):
    from .ann import (
        AlignmentLayer,
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from .feature import FeatureFileReader
    from .io import save_model
    from .topology import Universe

    u = Universe(args.pdb)
    features = FeatureFileReader(args.features, args.section, u).read()
    if not features:
        print(f"error: no features in section [{args.section}]",
              file=sys.stderr)
        return 1
    flayer = FeatureLayer(features, u.atoms, args.use_angle_value)
    align = (
        AlignmentLayer(u.select_atoms(args.align), u.atoms)
        if args.align else None
    )
    pp = PreprocessingANN(align, flayer)
    dims = [pp.output_dimension(), *args.mlp] if args.mlp else None
    if dims:
        model = MolANN(pp, create_sequential_nn(dims))
    else:
        model = pp
    save_model(args.out, model)
    print(f"wrote {args.out} (feature dim {pp.output_dimension()})")
    return 0


def cmd_import_torch(args):
    """Convert a reference TorchScript artifact (torch.jit.script(...).save)
    into a molann_tpu .npz checkpoint — the migration path for existing
    reference models (reference README.rst:51)."""
    from .io import save_model
    from .io.torch_import import load_torchscript
    from .models.ann import FeatureLayer, MolANN, PreprocessingANN

    model = load_torchscript(args.torchscript)
    save_model(args.out, model)
    flayer = None
    if isinstance(model, MolANN):
        flayer = model.preprocessing_layer.feature_layer
    elif isinstance(model, PreprocessingANN):
        flayer = model.feature_layer
    elif isinstance(model, FeatureLayer):
        flayer = model
    print(f"imported {type(model).__name__}; wrote {args.out}")
    if flayer is not None:
        print(flayer.get_feature_info().to_string())
    return 0


def cmd_export_torch(args):
    """Serialize a saved model as a reference-layout TorchScript artifact
    (torch.jit.script(...).save — reference README.rst:51) so LibTorch-
    embedded MD engines consuming reference models can run it unchanged."""
    from .io.torch_export import export_torchscript

    model = _load_model(args.model)
    export_torchscript(model, args.out)
    print(f"wrote {args.out} (TorchScript, reference layout)")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="molann_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="command", required=True)

    pi = sub.add_parser("info", help="describe a saved model")
    pi.add_argument("model")
    pi.set_defaults(fn=cmd_info)

    def add_eval_args(sp):
        sp.add_argument("model")
        sp.add_argument("traj", help=".npy trajectory")
        sp.add_argument("--out", default="cvs.npy")
        sp.add_argument("--batch-size", type=int, default=1 << 20)
        sp.add_argument("--tile", type=int, default=None,
                        help="frames per kernel tile (default: auto-sized "
                             "per fused mode)")
        sp.add_argument("--backend", default="auto",
                        choices=["auto", "native", "numpy"])
        sp.add_argument("--interpret", action="store_true",
                        help="run kernels in interpret mode (CPU)")
        sp.add_argument("--devices", type=int, default=0,
                        help="shard batches over N devices via the mesh "
                             "serving path")
        sp.add_argument("--verbose", action="store_true")

    pe = sub.add_parser("evaluate", help="evaluate CV values over a trajectory")
    add_eval_args(pe)
    pe.set_defaults(fn=cmd_evaluate)

    pf = sub.add_parser("forces", help="evaluate CVs + biasing forces")
    add_eval_args(pf)
    pf.add_argument("--component", type=int, default=None)
    pf.add_argument("--forces-out", default="forces.npy")
    pf.set_defaults(fn=cmd_forces)

    pcm = sub.add_parser(
        "committee",
        help="committee CV evaluation: per-frame mean + member "
             "disagreement (epistemic uncertainty) over K models "
             "trained with `train --ensemble K`",
    )
    pcm.add_argument("models", nargs="+",
                     help="2+ member models (.npz), e.g. "
                          "trained.member0.npz trained.member1.npz ...")
    pcm.add_argument("traj", help="trajectory to score "
                                  "(.npy/.dcd/.trr/.xtc/.nc)")
    pcm.add_argument("--out", default="cvs.npy",
                     help="committee-mean CVs [n_frames, d]")
    pcm.add_argument("--std-out", default="uncertainty.npy",
                     help="member disagreement (std) [n_frames, d] — "
                          "large where the committee extrapolates")
    pcm.add_argument("--calibrate", default=None, metavar="REF_TRAJ",
                     help="gauge-fix members (standardize + sign-align) "
                          "on these reference frames first — required "
                          "for sign/scale-free CVs (autoencoder / vamp "
                          "/ eigenfunction); typically the training "
                          "trajectory")
    pcm.add_argument("--calibrate-frames", type=int, default=4096,
                     help="max evenly-spaced reference frames used for "
                          "calibration")
    pcm.add_argument("--batch-size", type=int, default=1 << 16)
    pcm.add_argument("--backend", default="auto",
                     choices=["auto", "native", "numpy"])
    pcm.set_defaults(fn=cmd_committee)

    pc = sub.add_parser(
        "convert",
        help="convert trajectories (.npy/.dcd/.trr/.xtc/.nc in; "
             ".npy/.dcd/.trr/.xtc/.nc out)",
    )
    pc.add_argument("traj", help="input trajectory (.npy/.dcd/.trr/.xtc/.nc)")
    pc.add_argument("out", help="output path (.npy/.dcd/.trr/.xtc/.nc)")
    pc.add_argument("--packed", action="store_true",
                    help="write packed [n_frames, 3n] instead of "
                         "[n_frames, n_atoms, 3] (.npy outputs only)")
    pc.add_argument("--chunk", type=int, default=1 << 16,
                    help="frames per streaming chunk")
    pc.add_argument("--scale", type=float, default=1.0,
                    help="multiply coordinates (10 = GROMACS nm -> Angstrom)")
    pc.add_argument("--box", default=None, metavar="LX,LY,LZ",
                    help="orthorhombic cell for the output, in OUTPUT "
                         "units — not multiplied by --scale (default: "
                         "carry the input's per-frame boxes, scaled like "
                         "the coordinates, when it has them)")
    pc.add_argument("--xtc-precision", type=float, default=1000.0,
                    help="XTC output precision (resolution 1/precision)")
    pc.set_defaults(fn=cmd_convert)

    pu = sub.add_parser(
        "unwrap",
        help="repair periodic wrapping (make molecules whole / remove "
             "box jumps) before feature extraction",
    )
    pu.add_argument("traj", help="wrapped trajectory (.xtc/.trr/.dcd/.nc; "
                                 ".npy with --box)")
    pu.add_argument("pdb", help="topology PDB (bond guessing; its "
                                "coordinates must be whole)")
    pu.add_argument("out", help="output (.npy/.dcd/.trr/.xtc/.nc)")
    pu.add_argument("--mode", default="whole",
                    choices=["whole", "nojump", "whole+nojump"],
                    help="whole = reassemble molecules across the "
                         "boundary (trjconv -pbc whole); nojump = "
                         "continuous paths in time (-pbc nojump)")
    pu.add_argument("--box", default=None, metavar="LX,LY,LZ",
                    help="orthorhombic box override (required for .npy "
                         "inputs, which carry no box)")
    pu.add_argument("--tolerance", type=float, default=0.45,
                    help="bond-guess distance tolerance (Angstrom) on "
                         "top of the covalent radii")
    pu.set_defaults(fn=cmd_unwrap)

    px = sub.add_parser("export", help="export a StableHLO artifact")
    px.add_argument("model")
    px.add_argument("--n-atoms", type=int, required=True)
    px.add_argument("--out", default="model.stablehlo")
    px.add_argument("--with-gradient", action="store_true")
    px.add_argument("--batch", type=int, default=None, dest="export_batch",
                    help="fix the frame-batch size (default: polymorphic)")
    px.add_argument("--raw-mlir", action="store_true",
                    help="bare StableHLO bytecode for PJRT C-API runtimes "
                         "(native/serve_pjrt.cpp); requires --batch")
    px.add_argument("--fused", action="store_true",
                    help="bake the fused Pallas serving kernel into the "
                         "artifact (TPU-only; requires --batch)")
    px.add_argument("--batch-sizes", default=None,
                    help="comma-separated bucket sizes -> write a "
                         "multi-bucket BUNDLE (shape-flexible serving in "
                         "native/serve_pjrt.cpp), e.g. 4096,1024,256")
    px.set_defaults(fn=cmd_export)

    ps = sub.add_parser(
        "sample",
        help="biased Langevin sampling along the model's CVs (toy "
             "potential; the closed enhanced-sampling loop)")
    ps.add_argument("model", help="saved CV model (.npz)")
    ps.add_argument("pdb", help="structure defining the toy potential")
    ps.add_argument("--bias",
                    choices=["none", "metad", "opes", "steered"],
                    default="metad")
    ps.add_argument("--integrator", choices=["overdamped", "baoab"],
                    default="overdamped",
                    help="baoab = underdamped Langevin with per-atom "
                         "masses guessed from the PDB (--bias none only)")
    ps.add_argument("--gamma", type=float, default=5.0,
                    help="baoab friction (1/time)")
    ps.add_argument("--out", default="sampled.npy",
                    help="trajectory output (.npy/.dcd/.trr/.xtc/.nc)")
    ps.add_argument("--bias-out", default=None,
                    help="write metadynamics deposits (.npz)")
    ps.add_argument("--steps", type=int, default=5000)
    ps.add_argument("--walkers", type=int, default=4)
    ps.add_argument("--dt", type=float, default=2e-4)
    ps.add_argument("--kT", type=float, default=0.25)
    ps.add_argument("--thin", type=int, default=50,
                    help="record every N-th frame (none/steered)")
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--free-torsion", default="5,7,9,15",
                    help="1-based atom serials of the free torsion")
    ps.add_argument("--barrier", type=float, default=6.0)
    ps.add_argument("--height", type=float, default=0.5,
                    help="metadynamics Gaussian height")
    ps.add_argument("--sigma", type=float, default=0.25)
    ps.add_argument("--stride", type=int, default=50,
                    help="metadynamics deposit stride (also the record "
                         "interval)")
    ps.add_argument("--well-tempered-gamma", type=float, default=None,
                    help="bias factor > 1 switches on well-tempered "
                         "metadynamics (hills decay; pick so that "
                         "kT*(gamma-1) ~ the barrier height)")
    ps.add_argument("--bias-barrier", type=float, default=8.0,
                    help="OPES: expected barrier height (caps the bias "
                         "depth; the one physical input)")
    ps.add_argument("--bias-gamma", type=float, default=None,
                    help="OPES bias factor (default: barrier/kT)")
    ps.add_argument("--s0", default=None, help="steered start CV (comma)")
    ps.add_argument("--s1", default=None, help="steered end CV (comma)")
    ps.add_argument("--k-spring", type=float, default=10.0)
    ps.add_argument("--path", default=None, metavar="MEP",
                    help="bias the PATH PROGRESS s in [0, 1] along a "
                         "'mep --out' path (.npy/.csv) instead of the "
                         "raw CVs (Branduardi path CVs over the model)")
    ps.add_argument("--tube-k", type=float, default=0.0,
                    help="with --path: half-harmonic restraint strength "
                         "keeping walkers inside the transition tube")
    ps.add_argument("--tube-max", type=float, default=0.05,
                    help="tube width (CV distance squared) where the "
                         "--tube-k restraint switches on")
    ps.set_defaults(fn=cmd_sample)

    pg = sub.add_parser(
        "fes",
        help="free-energy surface from a metadynamics hills file")
    pg.add_argument("hills", help="deposits .npz from sample --bias-out")
    pg.add_argument("--grid", default="-3.2:3.2:200",
                    metavar="LO:HI:N[,LO:HI:N...]",
                    help="CV grid, one comma-separated lo:hi:n per CV "
                         "dimension (a single spec is broadcast to all "
                         "dims); use --grid=... when lo is negative")
    pg.add_argument("--out", default=None,
                    help=".npy (grid-shaped) or .csv (long-form) output")
    pg.set_defaults(fn=cmd_fes)

    prw = sub.add_parser(
        "reweight",
        help="per-frame importance weights from a saved bias + CV "
             "values (for 'train --weights')")
    prw.add_argument("bias", help="hills/kernels .npz (sample --bias-out)")
    prw.add_argument("cvs", help=".npy CV values [T] or [T, d] "
                                 "('evaluate' output)")
    prw.add_argument("--kT", type=float, default=None,
                     help="sampling temperature (required for hills "
                          "files; OPES kernel files carry their own)")
    prw.add_argument("--out", default="weights.npy")
    prw.set_defaults(fn=cmd_reweight)

    pme = sub.add_parser(
        "mep",
        help="minimum free-energy path (string method) on a "
             "reconstructed FES")
    pme.add_argument("fes",
                     help="hills .npz (sample --bias-out) or FES grid "
                          ".npy (fes/pmf output)")
    pme.add_argument("--start", required=True,
                     help="comma-separated CV start point (use "
                          "--start=... when negative)")
    pme.add_argument("--end", required=True,
                     help="comma-separated CV end point")
    pme.add_argument("--grid", default=None, metavar="LO:HI:N[,...]",
                     help="grid spec of the FES .npy (same string given "
                          "to 'fes'; not needed for hills .npz or 'pmf' "
                          "[2, n] files)")
    pme.add_argument("--images", type=int, default=48)
    pme.add_argument("--iterations", type=int, default=4000)
    pme.add_argument("--step", type=float, default=1e-3)
    pme.add_argument("--pin-ends", action="store_true",
                     help="keep endpoints fixed instead of relaxing "
                          "them into the nearest minima")
    pme.add_argument("--out", default=None,
                     help=".npy ([m, d+1]: images + F) or .csv output")
    pme.set_defaults(fn=cmd_mep)

    pms = sub.add_parser(
        "msm",
        help="Markov state model over a CV trajectory (timescales + "
             "Chapman-Kolmogorov check)")
    pms.add_argument("cvs", help=".npy CV samples [T] or [T, d] "
                                 "('evaluate' output)")
    pms.add_argument("--lag", type=int, default=10,
                     help="lag time in frames")
    pms.add_argument("--grid", default="-1:1:10", metavar="LO:HI:NBINS",
                     help="discretization grid, one comma-separated "
                          "lo:hi:nbins per CV dim (use --grid=... when "
                          "lo is negative)")
    pms.add_argument("--walkers", type=int, default=1,
                     help="de-interleave W walkers recorded per frame "
                          "('sample --walkers W' output) into W "
                          "contiguous series")
    pms.add_argument("--nonreversible", action="store_true",
                     help="plain row-normalized MLE instead of the "
                          "detailed-balance-constrained one")
    pms.add_argument("--n-timescales", type=int, default=3)
    pms.add_argument("--bootstrap", type=int, default=0, metavar="N",
                     help="N bootstrap resamples (over walker "
                          "trajectories, or circular blocks of a single "
                          "one): 95%% CIs on timescales + populations")
    pms.add_argument("--bootstrap-seed", type=int, default=0)
    pms.add_argument("--coarse", type=int, default=0,
                     help="PCCA+ coarse-grain into N metastable sets "
                          "(prints sets; saves assignments/memberships/"
                          "coarse matrix with --out)")
    pms.add_argument("--mfpt-to", default=None, metavar="S1[,S2...]",
                     help="mean first-passage times to these grid "
                          "states (saved as 'mfpt' with --out)")
    pms.add_argument("--tpt", default=None, metavar="A1[,A2..]:B1[,B2..]",
                     help="transition path theory for the reaction "
                          "A -> B between the two grid-state sets: "
                          "committors, rate, dominant pathways (saved "
                          "as 'committor'/'net_flux'/'rate' with --out)")
    pms.add_argument("--out", default=None,
                     help=".npz output (transition, pi, eigenvalues, "
                          "edges)")
    pms.set_defaults(fn=cmd_msm)

    pp_ = sub.add_parser(
        "pmf",
        help="free-energy profile from umbrella windows (MBAR)")
    pp_.add_argument("cvs", help=".npy [n_windows, n_samples] CV samples")
    pp_.add_argument("--centers", required=True,
                     help="comma-separated window centers (one per row); "
                          "use --centers=... when the first is negative")
    pp_.add_argument("--k-spring", type=float, required=True,
                     help="harmonic restraint constant")
    pp_.add_argument("--kT", type=float, default=1.0)
    pp_.add_argument("--grid", default="-1:1:40", metavar="LO:HI:N",
                     help="CV histogram grid (use --grid=... when lo is "
                          "negative)")
    pp_.add_argument("--out", default=None,
                     help=".npy ([2, n]: mids + F) or .csv output")
    pp_.set_defaults(fn=cmd_pmf)

    pt = sub.add_parser("train", help="train a model on a trajectory")
    pt.add_argument("model")
    pt.add_argument("traj",
                    help=".npy trajectory [n, atoms, 3] "
                         "(use 'convert' for dcd/trr/xtc)")
    pt.add_argument("--loss",
                    choices=["mse", "eigenfunction", "autoencoder",
                             "committor", "vamp", "tae"],
                    default="mse")
    pt.add_argument("--lag", type=int, default=10,
                    help="time lag in frames (vamp/tae): pairs (x_t, "
                         "x_{t+lag}) from a CONTIGUOUS trajectory")
    pt.add_argument("--targets", default=None,
                    help=".npy per-frame targets [n, d] (mse)")
    pt.add_argument("--weights", default=None,
                    help=".npy per-frame importance weights [n] "
                         "(eigenfunction/autoencoder/committor; e.g. "
                         "metadynamics frame weights)")
    pt.add_argument("--labels", default=None,
                    help=".npy per-frame basin labels [n] (committor): "
                         "1 = reactant A, 2 = product B, 0 = neither")
    pt.add_argument("--decoder-hidden", type=int, nargs="*", default=None,
                    help="decoder hidden dims (autoencoder; default: "
                         "direct linear map back to feature space)")
    pt.add_argument("--decoder-out", default=None,
                    help="also save the trained decoder (autoencoder)")
    pt.add_argument("--beta", type=float, default=1.0,
                    help="inverse temperature (eigenfunction/committor)")
    pt.add_argument("--alpha", type=float, default=None,
                    help="penalty weight: orthonormality (eigenfunction, "
                         "default 10) or boundary conditions (committor, "
                         "default 100)")
    pt.add_argument("--steps", type=int, default=1000)
    pt.add_argument("--batch-size", type=int, default=1024)
    pt.add_argument("--lr", type=float, default=1e-3)
    pt.add_argument("--optimizer",
                    choices=["adam", "adamw", "sgd", "rmsprop"],
                    default="adam")
    pt.add_argument("--weight-decay", type=float, default=1e-4,
                    help="decoupled weight decay (adamw)")
    pt.add_argument("--momentum", type=float, default=0.9,
                    help="momentum (sgd)")
    pt.add_argument("--lr-schedule",
                    choices=["constant", "cosine", "warmup-cosine",
                             "exponential"],
                    default="constant")
    pt.add_argument("--warmup-steps", type=int, default=100,
                    help="linear warmup length (warmup-cosine)")
    pt.add_argument("--final-lr-scale", type=float, default=0.01,
                    help="lr at the last step as a fraction of --lr "
                         "(cosine/warmup-cosine/exponential)")
    pt.add_argument("--grad-clip", type=float, default=0.0,
                    help="clip gradients to this global norm (0 = off)")
    pt.add_argument("--ensemble", type=int, default=0, metavar="K",
                    help="train a committee of K members (freshly "
                         "re-initialized from distinct seeds) through one "
                         "compiled vmapped step; writes OUT-stem."
                         "member{0..K-1}.npz for the `committee` command")
    pt.add_argument("--bagging", action="store_true",
                    help="with --ensemble: each member trains on a "
                         "bootstrap resample of every batch (decorrelates "
                         "members beyond their init)")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--devices", type=int, default=0,
                    help="shard batches over N devices (data-parallel)")
    pt.add_argument("--checkpoint-dir", default=None)
    pt.add_argument("--checkpoint-every", type=int, default=0)
    pt.add_argument("--log-every", type=int, default=100)
    pt.add_argument("--out", default="trained.npz")
    pt.set_defaults(fn=cmd_train)

    pm = sub.add_parser(
        "import-torch",
        help="convert a reference TorchScript .pt artifact to .npz")
    pm.add_argument("torchscript", help=".pt file from "
                                        "torch.jit.script(model).save(...)")
    pm.add_argument("--out", default="model.npz")
    pm.set_defaults(fn=cmd_import_torch)

    pxt = sub.add_parser(
        "export-torch",
        help="serialize a saved model as a TorchScript .pt artifact "
             "(reference layout, for LibTorch-embedded engines)")
    pxt.add_argument("model", help="saved model (.npz)")
    pxt.add_argument("--out", default="model.pt")
    pxt.set_defaults(fn=cmd_export_torch)

    pb = sub.add_parser(
        "build",
        help="build a model from a topology (PDB/GRO/XYZ) + feature file")
    pb.add_argument("pdb")
    pb.add_argument("features")
    pb.add_argument("--section", required=True)
    pb.add_argument("--align", default=None,
                    help="selection string for the alignment group")
    pb.add_argument("--mlp", type=int, nargs="*", default=None,
                    help="hidden/output dims appended after the feature dim")
    pb.add_argument("--use-angle-value", action="store_true")
    pb.add_argument("--out", default="model.npz")
    pb.set_defaults(fn=cmd_build)

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
