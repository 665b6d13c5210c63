"""Model serialization: self-contained checkpoint files.

The reference persists models via ``torch.jit.script(model).save(...)``
(reference README.rst:51, test/test_molann.py:114): a single artifact
embedding parameters, the ``ref_x`` buffer, and the static index lists,
loadable WITHOUT the topology/selection front-end. This module provides the
same property for the pytree models: :func:`save_model` writes one ``.npz``
holding a JSON structure description plus all arrays; :func:`load_model`
reconstructs the model with no PDB, no Universe, no selections — atom
groups come back as :class:`~molann_tpu.topology.FrozenAtomGroup` shims
carrying indices (and positions where needed).

For an engine-consumable compiled artifact (the TorchScript-from-C++
analogue), see :mod:`molann_tpu.io.export` (StableHLO via ``jax.export``).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..feature import Feature
from ..models.ann import (
    AlignmentLayer,
    FeatureLayer,
    FeatureMap,
    Identity,
    MolANN,
    PreprocessingANN,
    SequentialNN,
)
from ..spec import CompiledFeatures
from ..topology import FrozenAtomGroup

__all__ = ["save_model", "load_model", "ACTIVATIONS"]

FORMAT_VERSION = 1

# Name <-> callable registry for activations (serialized by name).
ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "celu": jax.nn.celu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "identity": lambda x: x,
}


def _activation_name(fn):
    for name, f in ACTIVATIONS.items():
        if f is fn or getattr(fn, "__name__", None) == name:
            return name
    raise ValueError(
        f"activation {fn!r} is not serializable; register it in "
        "molann_tpu.io.serialize.ACTIVATIONS or use a named one "
        f"({sorted(ACTIVATIONS)})"
    )


class _Saver:
    def __init__(self):
        self.arrays = {}
        self._n = 0

    def array(self, a):
        key = f"a{self._n}"
        self._n += 1
        self.arrays[key] = np.asarray(a)
        return key


def _feature_to_dict(f: Feature, saver):
    ag = f.atom_group
    d = {
        "name": f.name,
        "type": f.type_name,
        "ix": [int(i) for i in ag.ix],
    }
    if f.type_name == "coordination":
        n_a, r0, nn, mm = f.get_coordination_params()
        d["coord"] = {"n_a": int(n_a), "r0": float(r0),
                      "nn": int(nn), "mm": int(mm)}
        if f.pbc_box is not None:
            d["coord"]["box"] = [list(row) for row in f.pbc_box]
        if getattr(f, "d_max", None) is not None:
            d["coord"]["d_max"] = float(f.d_max)
    pos = getattr(ag, "positions", None)
    if pos is not None:
        d["positions"] = saver.array(np.asarray(pos, dtype=np.float32))
    return d


def _feature_from_dict(d, arrays):
    pos = arrays[d["positions"]] if "positions" in d else None
    if d["type"] == "coordination":
        c = d["coord"]
        n_a, ix = int(c["n_a"]), d["ix"]
        ag_a = FrozenAtomGroup(
            ix[:n_a], pos[:n_a] if pos is not None else None)
        ag_b = (FrozenAtomGroup(
            ix[n_a:], pos[n_a:] if pos is not None else None)
            if len(ix) > n_a else None)
        return Feature(d["name"], "coordination", ag_a, group_b=ag_b,
                       r0=c["r0"], nn=c["nn"], mm=c["mm"],
                       pbc_box=c.get("box"), d_max=c.get("d_max"))
    ag = FrozenAtomGroup(d["ix"], pos)
    return Feature(d["name"], d["type"], ag)


def _to_dict(obj, saver):
    if isinstance(obj, (tuple, list)):
        return {
            "kind": "Tuple",
            "items": [_to_dict(o, saver) for o in obj],
        }
    if isinstance(obj, MolANN):
        return {
            "kind": "MolANN",
            "preprocessing_layer": _to_dict(obj.preprocessing_layer, saver),
            "ann_layers": _to_dict(obj.ann_layers, saver),
        }
    if isinstance(obj, PreprocessingANN):
        return {
            "kind": "PreprocessingANN",
            "align_layer": _to_dict(obj.align_layer, saver),
            "feature_layer": _to_dict(obj.feature_layer, saver),
        }
    if isinstance(obj, Identity):
        return {"kind": "Identity"}
    if isinstance(obj, AlignmentLayer):
        return {
            "kind": "AlignmentLayer",
            "align_atom_indices": list(obj.align_atom_indices),
            "input_atom_indices": list(obj.input_atom_indices),
            "input_atom_num": obj.input_atom_num,
            "local_align_atom_indices": list(obj._local_align_atom_indices),
            "method": obj.method,
            "ref_x": saver.array(obj.ref_x),
        }
    if isinstance(obj, FeatureLayer):
        return {
            "kind": "FeatureLayer",
            "features": [_feature_to_dict(f, saver) for f in obj.feature_list],
            "use_angle_value": obj.use_angle_value,
            "input_atom_num": obj.input_atom_num,
            "input_atom_indices": [
                list(fm._local_atom_indices) for fm in obj.feature_map_list
            ],
            "spec": _spec_to_dict(obj._spec),
        }
    if isinstance(obj, SequentialNN):
        return {
            "kind": "SequentialNN",
            "layer_dims": list(obj.layer_dims),
            "activation": _activation_name(obj.activation),
            "params": [
                [saver.array(w), saver.array(b)] for (w, b) in obj.params
            ],
        }
    raise TypeError(f"cannot serialize {type(obj).__name__}")


def _spec_to_dict(spec: CompiledFeatures):
    return {
        "n_input_atoms": spec.n_input_atoms,
        "use_angle_value": spec.use_angle_value,
        "out_dim": spec.out_dim,
        "angle_idx": [list(t) for t in spec.angle_idx],
        "bond_idx": [list(t) for t in spec.bond_idx],
        "dihedral_idx": [list(t) for t in spec.dihedral_idx],
        "position_idx": list(spec.position_idx),
        "perm": list(spec.perm) if spec.perm is not None else None,
        "feature_dims": list(spec.feature_dims),
        "coord_pairs": [list(t) for t in spec.coord_pairs],
        "coord_slices": [list(t) for t in spec.coord_slices],
        "coord_params": [list(t) for t in spec.coord_params],
        "coord_boxes": [
            None if b is None else [list(row) for row in b]
            for b in spec.coord_boxes
        ],
        "coord_dmax": [
            None if v is None else float(v)
            for v in (getattr(spec, "coord_dmax", None)
                      or (None,) * len(spec.coord_slices))
        ],
    }


def _spec_from_dict(d):
    return CompiledFeatures(
        n_input_atoms=d["n_input_atoms"],
        use_angle_value=d["use_angle_value"],
        out_dim=d["out_dim"],
        angle_idx=tuple(tuple(t) for t in d["angle_idx"]),
        bond_idx=tuple(tuple(t) for t in d["bond_idx"]),
        dihedral_idx=tuple(tuple(t) for t in d["dihedral_idx"]),
        position_idx=tuple(d["position_idx"]),
        perm=tuple(d["perm"]) if d["perm"] is not None else None,
        feature_dims=tuple(d["feature_dims"]),
        # absent in pre-coordination checkpoints: default to none
        coord_pairs=tuple(tuple(t) for t in d.get("coord_pairs", ())),
        coord_slices=tuple(tuple(t) for t in d.get("coord_slices", ())),
        coord_params=tuple(
            (float(r0), int(nn), int(mm))
            for r0, nn, mm in d.get("coord_params", ())
        ),
        coord_boxes=tuple(
            None if b is None
            else tuple(tuple(float(v) for v in row) for row in b)
            for b in d.get(
                "coord_boxes",
                (None,) * len(d.get("coord_slices", ())),
            )
        ),
        coord_dmax=tuple(
            None if v is None else float(v)
            for v in d.get(
                "coord_dmax",
                (None,) * len(d.get("coord_slices", ())),
            )
        ),
    )


def _from_dict(d, arrays):
    kind = d["kind"]
    if kind == "Tuple":
        return tuple(_from_dict(item, arrays) for item in d["items"])
    if kind == "MolANN":
        return MolANN(
            _from_dict(d["preprocessing_layer"], arrays),
            _from_dict(d["ann_layers"], arrays),
        )
    if kind == "PreprocessingANN":
        obj = object.__new__(PreprocessingANN)
        object.__setattr__(obj, "align_layer", _from_dict(d["align_layer"], arrays))
        object.__setattr__(
            obj, "feature_layer", _from_dict(d["feature_layer"], arrays)
        )
        return obj
    if kind == "Identity":
        return Identity()
    if kind == "AlignmentLayer":
        obj = object.__new__(AlignmentLayer)
        obj.align_atom_indices = tuple(d["align_atom_indices"])
        obj.input_atom_indices = tuple(d["input_atom_indices"])
        obj.input_atom_num = d["input_atom_num"]
        obj._local_align_atom_indices = tuple(d["local_align_atom_indices"])
        obj.method = d["method"]
        obj.ref_x = jnp.asarray(arrays[d["ref_x"]])
        return obj
    if kind == "FeatureLayer":
        obj = object.__new__(FeatureLayer)
        features = tuple(_feature_from_dict(fd, arrays) for fd in d["features"])
        obj.feature_list = features
        obj.use_angle_value = d["use_angle_value"]
        obj.input_atom_num = d["input_atom_num"]
        obj._spec = _spec_from_dict(d["spec"])
        fmaps = []
        for f, local in zip(features, d["input_atom_indices"]):
            fm = object.__new__(FeatureMap)
            fm.feature = f
            fm.type_id = f.get_type_id()
            fm.use_angle_value = d["use_angle_value"]
            fm.input_atom_num = d["input_atom_num"]
            fm._local_atom_indices = tuple(local)
            fmaps.append(fm)
        obj.feature_map_list = tuple(fmaps)
        return obj
    if kind == "SequentialNN":
        params = tuple(
            (jnp.asarray(arrays[w]), jnp.asarray(arrays[b]))
            for (w, b) in d["params"]
        )
        return SequentialNN(params, d["layer_dims"], ACTIVATIONS[d["activation"]])
    raise TypeError(f"cannot deserialize kind {kind!r}")


def save_model(path, model):
    """Save a model (MolANN or any layer) to a single ``.npz`` artifact.

    The artifact is self-contained: structure JSON + all arrays. Like the
    reference's TorchScript export, reloading needs no topology front-end.
    """
    saver = _Saver()
    structure = _to_dict(model, saver)
    meta = json.dumps({"format_version": FORMAT_VERSION, "model": structure})
    np.savez(path, __meta__=np.frombuffer(meta.encode(), dtype=np.uint8),
             **saver.arrays)
    return path


def load_model(path):
    """Load a model saved by :func:`save_model`."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint format {meta.get('format_version')}"
            )
        arrays = {k: data[k] for k in data.files if k != "__meta__"}
    return _from_dict(meta["model"], arrays)
