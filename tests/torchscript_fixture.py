"""Scriptable torch modules reproducing the REFERENCE's artifact layout.

The importer under test (molann_tpu/io/torch_import.py) consumes
``torch.jit.script(...).save(...)`` archives written by the reference
library. These fixture modules carry the same class names, module tree,
and forward-reachable attribute names as the reference (that layout IS
the artifact format — reference molann/ann.py:69-625), with the math
written from the SURVEY.md §2.2 contract. Scripting them produces
archives indistinguishable in structure from real reference exports,
without needing the reference (or MDAnalysis) installed.
"""

from __future__ import annotations

from typing import List

import torch


class FeatureMap(torch.nn.Module):
    def __init__(self, type_id: int, local_indices, input_atom_indices,
                 use_angle_value: bool = False):
        super().__init__()
        self.type_id = int(type_id)
        self.use_angle_value = bool(use_angle_value)
        self.input_atom_indices: List[int] = [int(i) for i in
                                              input_atom_indices]
        self.input_atom_num = len(self.input_atom_indices)
        self._local_atom_indices: List[int] = [int(i) for i in local_indices]

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        idx = self._local_atom_indices
        out = torch.zeros(x.size(0), 1)
        if self.type_id == 0:  # angle at the middle atom
            a = x[:, idx[0], :] - x[:, idx[1], :]
            b = x[:, idx[2], :] - x[:, idx[1], :]
            cos_v = (a * b).sum(dim=1, keepdim=True) / (
                torch.norm(a, dim=1, keepdim=True)
                * torch.norm(b, dim=1, keepdim=True)
            )
            out = torch.acos(cos_v) if self.use_angle_value else cos_v
        elif self.type_id == 1:  # bond
            out = torch.norm(x[:, idx[1], :] - x[:, idx[0], :], dim=1,
                             keepdim=True)
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
        else:  # position
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
    def __init__(self, ref_positions, align_atom_indices,
                 input_atom_indices):
        super().__init__()
        self.align_atom_indices: List[int] = [int(i) for i in
                                              align_atom_indices]
        self.input_atom_indices: List[int] = [int(i) for i in
                                              input_atom_indices]
        self.input_atom_num = len(self.input_atom_indices)
        ref = torch.as_tensor(ref_positions, dtype=torch.float32)
        self.register_buffer("ref_x", ref - ref.mean(0))
        self._local_align_atom_indices: List[int] = [
            self.input_atom_indices.index(i) for i in self.align_atom_indices
        ]

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        sub = x[:, self._local_align_atom_indices, :]
        centroid = torch.mean(sub, 1, True)
        cov = torch.matmul((sub - centroid).permute((0, 2, 1)), self.ref_x)
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


def sequential_mlp(layer_dims, activation=None, seed=0):
    """Linear+activation chain, bare Linear last (reference
    molann/ann.py:60-65 shape)."""
    torch.manual_seed(seed)
    act = activation if activation is not None else torch.nn.Tanh()
    mods: List[torch.nn.Module] = []
    for i in range(len(layer_dims) - 2):
        mods.extend([torch.nn.Linear(layer_dims[i], layer_dims[i + 1]), act])
    mods.append(torch.nn.Linear(layer_dims[-2], layer_dims[-1]))
    return torch.nn.Sequential(*mods)


def alanine_reference_model(u, use_angle_value=False, mlp_dims=(5, 2),
                            with_alignment=True, seed=0):
    """A full fixture MolANN on the alanine universe: dihedral(5,7,9,15) +
    bond(2,5) + angle(20,19,21) features, bynum 1 2 5 alignment, MLP."""
    n = len(u.atoms)
    input_ix = list(range(n))
    fmaps = [
        FeatureMap(2, [4, 6, 8, 14], input_ix, use_angle_value),
        FeatureMap(1, [1, 4], input_ix, use_angle_value),
        FeatureMap(0, [19, 18, 20], input_ix, use_angle_value),
    ]
    d = sum(2 if (m.type_id == 2 and not use_angle_value) else 1
            for m in fmaps)
    flayer = FeatureLayer(fmaps, n)
    align = None
    if with_alignment:
        align = AlignmentLayer(u.atoms.positions[[0, 1, 4]], [0, 1, 4],
                               input_ix)
    pp = PreprocessingANN(align, flayer)
    return MolANN(pp, sequential_mlp([d, *mlp_dims], seed=seed))
