"""Independent PyTorch oracle for parity tests.

A from-the-contract torch implementation of the feature/alignment math
(formulas documented in SURVEY.md §2.2, mirroring reference
molann/ann.py:157-199 and :288-356). Used to generate fresh randomized
oracles — values AND gradients — that the JAX implementation must match to
float32 tolerance. Runs on torch-CPU; no MDAnalysis needed.
"""

from __future__ import annotations

import torch


def bond(x, idx):
    r12 = x[:, idx[1], :] - x[:, idx[0], :]
    return torch.norm(r12, dim=1, keepdim=True)


def angle(x, idx, use_angle_value=False):
    r21 = x[:, idx[0], :] - x[:, idx[1], :]
    r23 = x[:, idx[2], :] - x[:, idx[1], :]
    r21l = torch.norm(r21, dim=1, keepdim=True)
    r23l = torch.norm(r23, dim=1, keepdim=True)
    cos_angle = (r21 * r23).sum(dim=1, keepdim=True) / (r21l * r23l)
    return torch.acos(cos_angle) if use_angle_value else cos_angle


def dihedral(x, idx, use_angle_value=False):
    r12 = x[:, idx[1], :] - x[:, idx[0], :]
    r23 = x[:, idx[2], :] - x[:, idx[1], :]
    r34 = x[:, idx[3], :] - x[:, idx[2], :]
    n1 = torch.cross(r12, r23, dim=1)
    n2 = torch.cross(r23, r34, dim=1)
    cos_phi = (n1 * n2).sum(dim=1, keepdim=True)
    sin_phi = (n1 * r34).sum(dim=1, keepdim=True) * torch.norm(
        r23, dim=1, keepdim=True
    )
    if use_angle_value:
        return torch.atan2(sin_phi, cos_phi)
    radius = torch.sqrt(cos_phi**2 + sin_phi**2)
    return torch.cat((cos_phi / radius, sin_phi / radius), dim=1)


def position(x, idx):
    return x[:, list(idx), :].reshape((-1, len(idx) * 3))


def kabsch_align(x, ref_x, align_idx):
    """Kabsch alignment, SVD construction with detached sign fix."""
    sub = x[:, list(align_idx), :]
    c = torch.mean(sub, 1, True)
    xtmp = (sub - c).permute((0, 2, 1))
    prod = torch.matmul(xtmp, ref_x)
    u, s, vh = torch.linalg.svd(prod)
    diag = torch.diag(torch.ones(3)).unsqueeze(0).repeat(x.size(0), 1, 1)
    diag = diag.to(x.device, dtype=u.dtype)
    diag[:, 2, 2] = torch.sign(torch.linalg.det(torch.matmul(u, vh))).detach()
    rot = torch.bmm(torch.bmm(u, diag), vh)
    return torch.matmul(x - c, rot)
