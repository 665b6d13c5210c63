"""Model construction and artifact exchange commands: build, export, import-torch, export-torch.

Part of the molann_tpu CLI package (see :mod:`molann_tpu.cli`); each
command module owns its ``cmd_*`` implementations and a ``register(sub)``
adding its subparsers.
"""

from __future__ import annotations

import sys

import numpy as np

from ._common import _load_model

def cmd_export(args):
    from ..io import export_stablehlo
    from ..io.export import export_bundle

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
    if args.fused:
        from ..ops.fused import model_chunk_matrix, model_select_mode

        if (model_select_mode(model) == "blocked"
                and model_chunk_matrix(model) is not None):
            print(
                "note: this model chunks a coordination pair table — the "
                "fused module takes TWO inputs (x, c_mat) so the table is "
                "not baked in. Feed model_chunk_matrix(model) as the "
                "second argument, or export a --batch-sizes bundle, which "
                "carries the matrix for the serving container "
                "(native/serve_pjrt)."
            )
    return 0


def cmd_build(args):
    from ..ann import (
        AlignmentLayer,
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from ..feature import FeatureFileReader
    from ..io import save_model
    from ..topology import Universe

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
    from ..io import save_model
    from ..io.torch_import import load_torchscript
    from ..models.ann import FeatureLayer, MolANN, PreprocessingANN

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
    from ..io.torch_export import export_torchscript

    model = _load_model(args.model)
    export_torchscript(model, args.out)
    print(f"wrote {args.out} (TorchScript, reference layout)")
    return 0


def register(sub):
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

