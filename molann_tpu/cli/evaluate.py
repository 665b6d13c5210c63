"""Model inspection and trajectory evaluation commands: info, evaluate, forces, committee.

Part of the molann_tpu CLI package (see :mod:`molann_tpu.cli`); each
command module owns its ``cmd_*`` implementations and a ``register(sub)``
adding its subparsers.
"""

from __future__ import annotations

import sys

import numpy as np

from ._common import (_apply_cull, _check_traj, _load_model, _model_dims,
                      add_cull_args)

def cmd_info(args):
    model = _load_model(args.model)
    from ..models.ann import MolANN

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


def _evaluate(args, want_forces):
    import jax
    import jax.numpy as jnp

    from ..ops.fused import fused_cv_forces, fused_model_forward
    from ..train.data import packed_batch_iterator
    from ..train.forces import coordinate_gradients

    model = _load_model(args.model)
    n_atoms, d_out = _model_dims(model)
    n_frames = _check_traj(args.traj, n_atoms)
    # --cull + automatic chunk-matrix operand routing: condensed-phase
    # models never bake their pair table into the executable
    model, c_mat, _ = _apply_cull(args, model)

    if getattr(args, "devices", 0):
        # multi-device: stream through the mesh serving path
        # (molann_tpu.serve), results written straight into the memmaps
        from ..parallel import data_mesh
        from ..serve import evaluate_trajectory

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
                c_mat=c_mat,
            )
            g_out.flush()
        else:
            evaluate_trajectory(
                model, args.traj, mesh=mesh,
                batch_size=bs, tile=args.tile,
                interpret=args.interpret, backend=args.backend,
                cvs_out=y_out, c_mat=c_mat,
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
        from ..ops.fused import active_atom_indices, model_select_mode

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
                    compact_grads=True, c_mat=c_mat,
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
                    c_mat=c_mat,
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
                    model, x, tile=args.tile, interpret=args.interpret,
                    c_mat=c_mat,
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

    from ..io.reader import open_frame_reader
    from ..train import (
        calibrated_committee,
        committee,
        committee_calibration,
        stack_models,
    )
    from ..train.data import packed_batch_iterator

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


def register(sub):
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
            add_cull_args(sp)

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

