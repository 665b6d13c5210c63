"""Randomized parity vs an independent PyTorch oracle (values AND grads).

The oracle (torch_oracle.py) implements the documented formulas with torch
autograd on CPU; the JAX implementation must match to float32 tolerance on
random frames (SURVEY.md §4 test strategy, item c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch_oracle as oracle  # noqa: E402

from molann_tpu.ops.alignment import align_frames  # noqa: E402
from molann_tpu.ops.features import (  # noqa: E402
    angle_features,
    bond_features,
    dihedral_features,
    position_features,
)

ATOL = 1e-5


def random_frames(rng, l=16, n=12):
    return (3.0 * rng.normal(size=(l, n, 3))).astype(np.float32)


def to_torch(x):
    return torch.tensor(x, requires_grad=True)


def check_parity(jax_fn, torch_fn, x_np):
    """Compare outputs and input-gradients of a scalarized objective."""
    xj = jnp.asarray(x_np)
    out_j = np.asarray(jax_fn(xj))

    xt = to_torch(x_np)
    out_t = torch_fn(xt)
    np.testing.assert_allclose(out_j, out_t.detach().numpy(), atol=ATOL)

    # gradient of sum(sin(out)) — nontrivial cotangents
    gj = np.asarray(
        jax.grad(lambda xx: jnp.sum(jnp.sin(jax_fn(xx))))(xj)
    )
    torch.sum(torch.sin(out_t)).backward()
    gt = xt.grad.numpy()
    scale = max(np.abs(gt).max(), 1.0)
    np.testing.assert_allclose(gj, gt, atol=2e-4 * scale)


def test_bond_parity(rng):
    x = random_frames(rng)
    idx = (2, 7)
    check_parity(
        lambda xx: bond_features(xx, (idx,)),
        lambda xx: oracle.bond(xx, idx),
        x,
    )


@pytest.mark.parametrize("uav", [False, True])
def test_angle_parity(rng, uav):
    x = random_frames(rng)
    idx = (1, 4, 9)
    check_parity(
        lambda xx: angle_features(xx, (idx,), uav),
        lambda xx: oracle.angle(xx, idx, uav),
        x,
    )


@pytest.mark.parametrize("uav", [False, True])
def test_dihedral_parity(rng, uav):
    x = random_frames(rng)
    idx = (0, 3, 6, 10)

    def jf(xx):
        d = dihedral_features(xx, (idx,), uav)
        return d if uav else d.reshape(-1, 2)

    check_parity(jf, lambda xx: oracle.dihedral(xx, idx, uav), x)


def test_position_parity(rng):
    x = random_frames(rng)
    idx = (5, 0, 11)
    check_parity(
        lambda xx: position_features(xx, idx),
        lambda xx: oracle.position(xx, idx),
        x,
    )


@pytest.mark.parametrize("method", ["svd", "qcp", "eigh"])
def test_alignment_parity(rng, method):
    x = random_frames(rng, l=8, n=10)
    ref = rng.normal(size=(5, 3)).astype(np.float32)
    ref -= ref.mean(0, keepdims=True)
    idx = (0, 2, 4, 6, 8)

    xj = jnp.asarray(x)
    out_j = np.asarray(align_frames(xj, ref, idx, method=method))

    xt = to_torch(x)
    out_t = oracle.kabsch_align(xt, torch.tensor(ref), idx)
    np.testing.assert_allclose(out_j, out_t.detach().numpy(), atol=2e-5)

    gj = np.asarray(
        jax.grad(
            lambda xx: jnp.sum(jnp.sin(align_frames(xx, ref, idx, method=method)))
        )(xj)
    )
    torch.sum(torch.sin(out_t)).backward()
    gt = xt.grad.numpy()
    scale = max(np.abs(gt).max(), 1.0)
    np.testing.assert_allclose(gj, gt, atol=5e-4 * scale)


def test_full_model_parity_on_fixture(universe, feature_file, rng):
    """Histogram FeatureLayer on noisy fixture frames vs the torch oracle."""
    from molann_tpu.ann import FeatureLayer
    from molann_tpu.feature import FeatureFileReader

    feats = FeatureFileReader(feature_file, "Histogram", universe).read()
    layer = FeatureLayer(feats, universe.atoms, use_angle_value=False)
    x = (
        universe.atoms.positions[None]
        + 0.1 * rng.normal(size=(32, 22, 3)).astype(np.float32)
    )

    def torch_layer(xx):
        cols = []
        for f in feats:
            idx = tuple(int(i) - 1 for i in f.get_atom_indices())
            t = f.get_type()
            if t == "bond":
                cols.append(oracle.bond(xx, idx))
            elif t == "angle":
                cols.append(oracle.angle(xx, idx, False))
            else:
                cols.append(oracle.dihedral(xx, idx, False))
        return torch.cat(cols, dim=1)

    check_parity(lambda xx: layer(xx), torch_layer, x)
