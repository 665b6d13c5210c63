"""Import the reference's TorchScript artifacts (the migration path).

The reference's only serialization is ``torch.jit.script(model).save(p)``
(reference README.rst:51, test/test_molann.py:36-114): the archive embeds
the static index lists, the centered ``ref_x`` buffer, and the MLP
weights — everything a downstream engine needs, no MDAnalysis at load
time. A reference user switching to this framework can therefore load
those ``.pt`` files directly, with no reference install and no
retraining:

    from molann_tpu.io.torch_import import load_torchscript
    model = load_torchscript("model.pt")      # -> molann_tpu pytree model

or from the command line::

    molann_tpu import-torch model.pt --out model.npz

Structure is recovered by walking the scripted module tree by class name
(``original_name``) and reading the attributes the reference's forward
methods bake into the script: ``AlignmentLayer`` keeps
``_local_align_atom_indices``/``input_atom_num`` and the centered
``ref_x`` buffer (reference molann/ann.py:131-146, 157-199);
``FeatureMap`` keeps ``type_id``/``use_angle_value``/
``_local_atom_indices``/``input_atom_num`` (molann/ann.py:252-263,
288-356); ``FeatureLayer`` holds the ``feature_map_list`` ModuleList
(molann/ann.py:426); the MLP is a ``torch.nn.Sequential`` of
Linear/activation pairs (molann/ann.py:60-65).

Two reconstruction caveats, both cosmetic (forward semantics depend only
on the local indices, which are always present):

- Global atom numbering: the reference also stores the global
  ``input_atom_indices``/``align_atom_indices`` lists; when TorchScript
  preserved them they are used verbatim, otherwise atoms are renumbered
  0..n_inp-1 (identity input group).
- Feature names: the reference's ``Feature`` objects hold MDAnalysis
  groups, which scripting drops — imported features are named
  ``f0, f1, ...``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_torchscript"]

# reference molann/feature.py:89-97 type_id assignment
_TYPE_NAMES = {0: "angle", 1: "bond", 2: "dihedral", 3: "position"}

# torch.nn activation class name -> molann_tpu activation registry name
# (molann_tpu.io.serialize.ACTIVATIONS)
_ACTIVATION_CLASSES = {
    "Tanh": "tanh",
    "ReLU": "relu",
    "Sigmoid": "sigmoid",
    "GELU": "gelu",
    "ELU": "elu",
    "CELU": "celu",
    "Softplus": "softplus",
    "SiLU": "swish",
    "Identity": "identity",
}


def _class_name(scripted):
    """Original (pre-scripting) class name of a RecursiveScriptModule."""
    return getattr(scripted, "original_name", type(scripted).__name__)


def _int_list(scripted, name):
    """A ``List[int]`` attribute if the archive preserved it, else None."""
    try:
        val = getattr(scripted, name)
    except (AttributeError, RuntimeError):
        return None
    try:
        return [int(v) for v in val]
    except TypeError:
        return None


def _import_sequential(seq):
    """torch.nn.Sequential of Linear/activation -> SequentialNN."""
    from ..models.ann import SequentialNN
    from .serialize import ACTIVATIONS

    params = []
    act_names = set()
    for child in seq.children():
        cname = _class_name(child)
        if cname == "Linear":
            w = child.weight.detach().cpu().numpy()  # [out, in]
            if getattr(child, "bias", None) is not None:
                b = child.bias.detach().cpu().numpy()
            else:
                b = np.zeros(w.shape[0], np.float32)
            # torch Linear computes x @ W.T + b; our convention is x @ W + b
            params.append((np.ascontiguousarray(w.T), b))
        elif cname in _ACTIVATION_CLASSES:
            act_names.add(_ACTIVATION_CLASSES[cname])
        else:
            raise ValueError(
                f"cannot import Sequential child {cname!r}; supported: "
                f"Linear + {sorted(_ACTIVATION_CLASSES)}"
            )
    if not params:
        raise ValueError("Sequential contains no Linear layers")
    if len(act_names) > 1:
        raise ValueError(
            f"mixed activations {sorted(act_names)} are not supported "
            "(SequentialNN shares one activation across hidden layers, "
            "like the reference's create_sequential_nn)"
        )
    act = act_names.pop() if act_names else "tanh"
    layer_dims = [params[0][0].shape[0]] + [w.shape[1] for w, _ in params]
    return SequentialNN(
        tuple(
            (np.asarray(w, np.float32), np.asarray(b, np.float32))
            for w, b in params
        ),
        layer_dims,
        ACTIVATIONS[act],
    )


def _input_group(scripted):
    """The FrozenAtomGroup of the layer's input atoms: archived global
    indices when present, identity numbering otherwise."""
    from ..topology import FrozenAtomGroup

    n_inp = int(scripted.input_atom_num)
    ix = _int_list(scripted, "input_atom_indices")
    if ix is None or len(ix) != n_inp:
        ix = list(range(n_inp))
    return FrozenAtomGroup(ix)


def _import_alignment(scripted):
    from ..models.ann import AlignmentLayer
    from ..topology import FrozenAtomGroup

    input_group = _input_group(scripted)
    input_ix = list(input_group.ix)
    local = _int_list(scripted, "_local_align_atom_indices")
    if local is None:
        raise ValueError(
            "scripted AlignmentLayer lacks _local_align_atom_indices"
        )
    ref_x = np.asarray(scripted.ref_x.detach().cpu().numpy(), np.float32)
    if ref_x.shape != (len(local), 3):
        raise ValueError(
            f"ref_x shape {ref_x.shape} does not match "
            f"{len(local)} align atoms"
        )
    # ref_x is already centered (reference molann/ann.py:140-141), so the
    # constructor's centering is a no-op on it
    align_group = FrozenAtomGroup(
        [input_ix[j] for j in local], positions=ref_x
    )
    return AlignmentLayer(align_group, input_group)


def _import_feature_map_parts(scripted, input_group, counter):
    """-> (Feature, use_angle_value) recovered from a scripted FeatureMap."""
    from ..feature import Feature
    from ..topology import FrozenAtomGroup

    input_ix = list(input_group.ix)
    type_id = int(scripted.type_id)
    if type_id not in _TYPE_NAMES:
        raise ValueError(f"unknown feature type_id {type_id}")
    local = _int_list(scripted, "_local_atom_indices")
    if local is None:
        raise ValueError("scripted FeatureMap lacks _local_atom_indices")
    group = FrozenAtomGroup([input_ix[j] for j in local])
    feature = Feature(f"f{counter}", _TYPE_NAMES[type_id], group)
    return feature, bool(scripted.use_angle_value)


def _import_feature_layer(scripted):
    from ..models.ann import FeatureLayer
    from ..topology import FrozenAtomGroup

    # the reference's FeatureLayer archives only input_atom_num
    # (molann/ann.py:426-427); the global numbering lives on each
    # FeatureMap's input_atom_indices — all maps share one input group
    n_inp = int(scripted.input_atom_num)
    maps = list(scripted.feature_map_list.children())
    input_group = None
    for fmap in maps:
        ix = _int_list(fmap, "input_atom_indices")
        if ix is not None and len(ix) == n_inp:
            input_group = FrozenAtomGroup(ix)
            break
    if input_group is None:
        input_group = FrozenAtomGroup(list(range(n_inp)))
    features, flags = [], set()
    for i, fmap in enumerate(maps):
        if _class_name(fmap) != "FeatureMap":
            raise ValueError(
                f"feature_map_list child {i} is {_class_name(fmap)!r}, "
                "expected FeatureMap"
            )
        feature, uav = _import_feature_map_parts(fmap, input_group, i)
        features.append(feature)
        flags.add(uav)
    if not features:
        raise ValueError("scripted FeatureLayer has no feature maps")
    if len(flags) > 1:
        raise ValueError(
            "feature maps disagree on use_angle_value; a FeatureLayer "
            "carries one flag for all features"
        )
    return FeatureLayer(features, input_group, flags.pop() if flags else False)


def _import_feature_map(scripted):
    from ..models.ann import FeatureMap

    input_group = _input_group(scripted)
    feature, uav = _import_feature_map_parts(scripted, input_group, 0)
    return FeatureMap(feature, input_group, uav)


def _import_preprocessing(scripted):
    from ..models.ann import PreprocessingANN

    align_mod = scripted.align_layer
    if _class_name(align_mod) == "AlignmentLayer":
        align = _import_alignment(align_mod)
    elif _class_name(align_mod) == "Identity":
        align = None  # reference molann/ann.py:539-542: None -> Identity
    else:
        raise ValueError(
            f"unexpected align_layer class {_class_name(align_mod)!r}"
        )
    return PreprocessingANN(align, _import_feature_layer(scripted.feature_layer))


def _import_any(scripted):
    name = _class_name(scripted)
    if name == "MolANN":
        from ..models.ann import MolANN

        return MolANN(
            _import_preprocessing(scripted.preprocessing_layer),
            _import_sequential(scripted.ann_layers),
        )
    if name == "PreprocessingANN":
        return _import_preprocessing(scripted)
    if name == "FeatureLayer":
        return _import_feature_layer(scripted)
    if name == "FeatureMap":
        return _import_feature_map(scripted)
    if name == "AlignmentLayer":
        return _import_alignment(scripted)
    if name == "Sequential":
        return _import_sequential(scripted)
    raise ValueError(
        f"cannot import a scripted {name!r}; supported roots: MolANN, "
        "PreprocessingANN, FeatureLayer, FeatureMap, AlignmentLayer, "
        "Sequential"
    )


def load_torchscript(path_or_module):
    """Load a reference TorchScript artifact as a molann_tpu model.

    Accepts a path to a ``.pt`` file written by
    ``torch.jit.script(model).save(path)`` on any of the reference's
    exportable classes (MolANN, PreprocessingANN, FeatureLayer,
    FeatureMap, AlignmentLayer, or a bare Sequential MLP), or an
    already-loaded scripted module. Returns the equivalent molann_tpu
    pytree model — jit/grad/vmap-composable, checkpointable via
    :func:`molann_tpu.io.save_model`, and servable through the fused
    kernels. Requires ``torch`` (CPU build is enough) at import time
    only; the returned model has no torch dependency.
    """
    if isinstance(path_or_module, (str, bytes)) or hasattr(
        path_or_module, "__fspath__"
    ):
        try:
            import torch
        except ImportError as e:  # pragma: no cover - torch is installed here
            raise ImportError(
                "importing TorchScript artifacts requires torch "
                "(CPU build is sufficient)"
            ) from e
        scripted = torch.jit.load(str(path_or_module), map_location="cpu")
    else:
        scripted = path_or_module
    return _import_any(scripted)
