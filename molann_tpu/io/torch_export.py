"""Export models as TorchScript artifacts (the reference's wire format).

The reference's downstream MD/enhanced-sampling engines embed LibTorch
and load ``torch.jit.script(model).save(...)`` archives (reference
README.rst:51, test/test_molann.py:36-114). :func:`export_torchscript`
produces exactly that artifact from a molann_tpu model — same module
tree, class names, and attribute layout as a reference export — so a
model trained on TPU drops into any engine already consuming reference
models, with zero engine changes:

    from molann_tpu.io.torch_export import export_torchscript
    export_torchscript(model, "model.pt")     # loadable by LibTorch

or from the command line::

    molann_tpu export-torch model.npz --out model.pt

Together with :mod:`~molann_tpu.io.torch_import` this makes the
TorchScript interop bidirectional: reference artifacts load here, and
models built/trained here export back to the reference's ecosystem.
``torch`` (CPU build) is required at export time only.

The scripted forward math reimplements the SURVEY.md §2.2 contract with
torch ops (reference molann/ann.py:157-199 alignment, :288-356 feature
maps); numerical parity against the in-JAX model is tested to float32
tolerance for values and coordinate gradients
(tests/test_torch_export.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["export_torchscript"]

# molann_tpu activation registry name -> torch.nn class name
_TORCH_ACTIVATIONS = {
    "tanh": "Tanh",
    "relu": "ReLU",
    "sigmoid": "Sigmoid",
    "gelu": "GELU",
    "elu": "ELU",
    "celu": "CELU",
    "softplus": "Softplus",
    "swish": "SiLU",
    "identity": "Identity",
}

_classes_cache = None


def _torch_classes():
    """Reference-layout torch.nn.Module classes (built lazily so that
    importing this module never requires torch)."""
    global _classes_cache
    if _classes_cache is not None:
        return _classes_cache

    from typing import List

    import torch

    class FeatureMap(torch.nn.Module):
        def __init__(self, type_id: int, local_indices, input_atom_indices,
                     use_angle_value: bool):
            super().__init__()
            self.type_id = int(type_id)
            self.use_angle_value = bool(use_angle_value)
            self.input_atom_indices: List[int] = [
                int(i) for i in input_atom_indices]
            self.input_atom_num = len(self.input_atom_indices)
            self._local_atom_indices: List[int] = [
                int(i) for i in local_indices]

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            idx = self._local_atom_indices
            out = torch.zeros(x.size(0), 1)
            if self.type_id == 0:  # angle at the middle atom
                va = x[:, idx[0], :] - x[:, idx[1], :]
                vb = x[:, idx[2], :] - x[:, idx[1], :]
                cos_v = (va * vb).sum(dim=1, keepdim=True) / (
                    torch.norm(va, dim=1, keepdim=True)
                    * torch.norm(vb, dim=1, keepdim=True)
                )
                out = torch.acos(cos_v) if self.use_angle_value else cos_v
            elif self.type_id == 1:  # bond
                out = torch.norm(x[:, idx[1], :] - x[:, idx[0], :],
                                 dim=1, keepdim=True)
            elif self.type_id == 2:  # dihedral
                b1 = x[:, idx[1], :] - x[:, idx[0], :]
                b2 = x[:, idx[2], :] - x[:, idx[1], :]
                b3 = x[:, idx[3], :] - x[:, idx[2], :]
                n1 = torch.cross(b1, b2, dim=1)
                n2 = torch.cross(b2, b3, dim=1)
                cos_u = (n1 * n2).sum(dim=1, keepdim=True)
                sin_u = (n1 * b3).sum(dim=1, keepdim=True) * torch.norm(
                    b2, dim=1, keepdim=True)
                if self.use_angle_value:
                    out = torch.atan2(sin_u, cos_u)
                else:
                    rho = torch.sqrt(cos_u ** 2 + sin_u ** 2)
                    out = torch.cat((cos_u / rho, sin_u / rho), dim=1)
            else:  # position: x,y,z per atom, row-major
                out = x[:, idx, :].reshape((-1, 3 * len(idx)))
            return out

    class FeatureLayer(torch.nn.Module):
        def __init__(self, feature_maps, input_atom_num: int):
            super().__init__()
            self.feature_map_list = torch.nn.ModuleList(feature_maps)
            self.input_atom_num = int(input_atom_num)

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            cols: List[torch.Tensor] = []
            for fmap in self.feature_map_list:
                cols.append(fmap(x))
            return torch.cat(cols, dim=1)

    class AlignmentLayer(torch.nn.Module):
        def __init__(self, ref_x_centered, align_atom_indices,
                     input_atom_indices, local_align_indices):
            super().__init__()
            self.align_atom_indices: List[int] = [
                int(i) for i in align_atom_indices]
            self.input_atom_indices: List[int] = [
                int(i) for i in input_atom_indices]
            self.input_atom_num = len(self.input_atom_indices)
            # np.array (copy): jax arrays expose read-only buffers, which
            # torch.as_tensor would wrap with a warning
            self.register_buffer(
                "ref_x", torch.as_tensor(np.array(ref_x_centered,
                                                  np.float32)))
            self._local_align_atom_indices: List[int] = [
                int(i) for i in local_align_indices]

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            sub = x[:, self._local_align_atom_indices, :]
            centroid = torch.mean(sub, 1, True)
            cov = torch.matmul((sub - centroid).permute((0, 2, 1)),
                               self.ref_x)
            u, s, vh = torch.linalg.svd(cov)
            fix = torch.eye(3).unsqueeze(0).repeat(x.size(0), 1, 1).to(
                x.device, dtype=u.dtype)
            fix[:, 2, 2] = torch.sign(
                torch.linalg.det(torch.matmul(u, vh))).detach()
            rot = torch.bmm(torch.bmm(u, fix), vh)
            return torch.matmul(x - centroid, rot)

    class PreprocessingANN(torch.nn.Module):
        def __init__(self, align_layer, feature_layer):
            super().__init__()
            self.align_layer = (align_layer if align_layer is not None
                                else torch.nn.Identity())
            self.feature_layer = feature_layer

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            return self.feature_layer(self.align_layer(x))

    class MolANN(torch.nn.Module):
        def __init__(self, preprocessing_layer, ann_layers):
            super().__init__()
            self.preprocessing_layer = preprocessing_layer
            self.ann_layers = ann_layers

        def forward(self, x: torch.Tensor) -> torch.Tensor:
            return self.ann_layers(self.preprocessing_layer(x))

    _classes_cache = {
        "FeatureMap": FeatureMap,
        "FeatureLayer": FeatureLayer,
        "AlignmentLayer": AlignmentLayer,
        "PreprocessingANN": PreprocessingANN,
        "MolANN": MolANN,
    }
    return _classes_cache


def _export_sequential(seq):
    import torch

    from .serialize import _activation_name

    act_name = _activation_name(seq.activation)
    if act_name not in _TORCH_ACTIVATIONS:
        raise ValueError(
            f"activation {act_name!r} has no torch.nn equivalent; "
            f"supported: {sorted(_TORCH_ACTIVATIONS)}"
        )
    act_cls = getattr(torch.nn, _TORCH_ACTIVATIONS[act_name])
    mods = []
    n = len(seq.params)
    # reference create_sequential_nn reuses ONE activation module instance
    # between layers (molann/ann.py:37,64)
    act = act_cls()
    for i, (w, b) in enumerate(seq.params):
        w = np.asarray(w, np.float32)
        b = np.asarray(b, np.float32)
        lin = torch.nn.Linear(w.shape[0], w.shape[1])
        with torch.no_grad():
            # np.array copies: jax params expose read-only buffers, which
            # torch.as_tensor would wrap with a warning
            lin.weight.copy_(torch.as_tensor(np.array(w.T)))  # x @ W + b
            lin.bias.copy_(torch.as_tensor(np.array(b)))
        mods.append(lin)
        if i < n - 1:
            mods.append(act)
    return torch.nn.Sequential(*mods)


def _export_feature_layer(flayer, input_ix=None):
    cls = _torch_classes()
    bad = [f.get_name() for f in flayer.feature_list
           if f.get_type_id() == 4]
    if bad:
        raise ValueError(
            f"coordination features {bad} have no counterpart in the "
            "reference library's TorchScript layout; models using them "
            "cannot be exported to .pt (use the StableHLO artifacts)"
        )
    n_inp = flayer.input_atom_num
    if input_ix is None:
        # the layer keeps only local indices; recover the global numbering
        # from the Features (identity for atoms no feature touches — their
        # numbering is unobservable in the artifact's forward semantics)
        input_ix = list(range(n_inp))
        for feat, fmap in zip(flayer.feature_list, flayer.feature_map_list):
            for local_j, one_based in zip(
                fmap._local_atom_indices, feat.get_atom_indices()
            ):
                input_ix[local_j] = int(one_based) - 1
    fmaps = [
        cls["FeatureMap"](
            fmap.type_id, fmap._local_atom_indices, input_ix,
            fmap.use_angle_value,
        )
        for fmap in flayer.feature_map_list
    ]
    return cls["FeatureLayer"](fmaps, n_inp)


def _export_alignment(align):
    cls = _torch_classes()
    return cls["AlignmentLayer"](
        np.asarray(align.ref_x, np.float32),
        align.align_atom_indices,
        align.input_atom_indices,
        align._local_align_atom_indices,
    )


def _export_any(model):
    from ..models.ann import (
        AlignmentLayer,
        FeatureLayer,
        FeatureMap,
        Identity,
        MolANN,
        PreprocessingANN,
        SequentialNN,
    )

    cls = _torch_classes()
    if isinstance(model, MolANN):
        return cls["MolANN"](
            _export_any(model.preprocessing_layer),
            _export_sequential(model.ann_layers),
        )
    if isinstance(model, PreprocessingANN):
        align = model.align_layer
        if isinstance(align, Identity):
            talign, input_ix = None, None
        else:
            talign = _export_alignment(align)
            # alignment and features share ONE input group — reuse its
            # stored global numbering for the feature maps
            input_ix = [int(i) for i in align.input_atom_indices]
        return cls["PreprocessingANN"](
            talign, _export_feature_layer(model.feature_layer, input_ix))
    if isinstance(model, FeatureLayer):
        return _export_feature_layer(model)
    if isinstance(model, FeatureMap):
        if model.type_id == 4:
            raise ValueError(
                "coordination features have no counterpart in the "
                "reference library's TorchScript layout; use the "
                "StableHLO artifacts"
            )
        input_ix = list(range(model.input_atom_num))
        for local_j, one_based in zip(
            model._local_atom_indices, model.feature.get_atom_indices()
        ):
            input_ix[local_j] = int(one_based) - 1
        return cls["FeatureMap"](
            model.type_id, model._local_atom_indices, input_ix,
            model.use_angle_value,
        )
    if isinstance(model, AlignmentLayer):
        return _export_alignment(model)
    if isinstance(model, SequentialNN):
        return _export_sequential(model)
    raise TypeError(
        f"cannot export a {type(model).__name__} to TorchScript; "
        "supported: MolANN, PreprocessingANN, FeatureLayer, FeatureMap, "
        "AlignmentLayer, SequentialNN"
    )


def export_torchscript(model, path=None):
    """Serialize a molann_tpu model as a reference-layout TorchScript
    artifact.

    Returns the scripted torch module; when ``path`` is given, also
    ``.save(path)``s it — the exact pattern the reference documents for
    downstream engines (``torch.jit.script(model).save(name)``,
    reference README.rst:51). Accepts every class the reference itself
    exports: :class:`~molann_tpu.models.ann.MolANN`,
    ``PreprocessingANN``, ``FeatureLayer``, ``FeatureMap``,
    ``AlignmentLayer``, and ``SequentialNN``.
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is installed here
        raise ImportError(
            "exporting TorchScript artifacts requires torch "
            "(CPU build is sufficient)"
        ) from e
    scripted = torch.jit.script(_export_any(model))
    if path is not None:
        scripted.save(str(path))
    return scripted
