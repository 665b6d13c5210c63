"""Property-based tests (hypothesis): invariances and parser robustness."""

import io

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from molann_tpu.feature import Feature, FeatureFileReader
from molann_tpu.ops.alignment import align_frames
from molann_tpu.ops.features import (
    angle_features,
    bond_features,
    dihedral_features,
)
from molann_tpu.topology import Universe

N_ATOMS = 12


def random_frames(seed, l=4):
    rng = np.random.default_rng(seed)
    # well-separated atoms: rejection-free jitter around a lattice
    base = rng.normal(size=(1, N_ATOMS, 3)) * 4.0
    x = base + 0.3 * rng.normal(size=(l, N_ATOMS, 3))
    return x.astype(np.float32)


def rigid_motion(seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, i, j, k = q
    rot = np.array(
        [
            [1 - 2 * (j * j + k * k), 2 * (i * j - w * k), 2 * (i * k + w * j)],
            [2 * (i * j + w * k), 1 - 2 * (i * i + k * k), 2 * (j * k - w * i)],
            [2 * (i * k - w * j), 2 * (j * k + w * i), 1 - 2 * (i * i + j * j)],
        ],
        dtype=np.float32,
    )
    t = (5.0 * rng.normal(size=3)).astype(np.float32)
    return rot, t


idx_strategy = st.lists(
    st.integers(0, N_ATOMS - 1), min_size=4, max_size=4, unique=True
)


@settings(max_examples=25, deadline=None)
@given(idx=idx_strategy, seed=st.integers(0, 10_000))
def test_dihedral_rigid_motion_invariance(idx, seed):
    x = random_frames(seed)
    rot, t = rigid_motion(seed + 1)
    x2 = x @ rot.T + t
    d1 = np.asarray(dihedral_features(jnp.asarray(x), (tuple(idx),), True))
    d2 = np.asarray(dihedral_features(jnp.asarray(x2), (tuple(idx),), True))
    # angles can wrap at ±π; compare on the circle
    diff = np.abs(np.angle(np.exp(1j * (d1 - d2))))
    assert diff.max() < 5e-3


@settings(max_examples=25, deadline=None)
@given(idx=idx_strategy, seed=st.integers(0, 10_000))
def test_angle_bond_rigid_motion_invariance(idx, seed):
    x = random_frames(seed)
    rot, t = rigid_motion(seed + 1)
    x2 = x @ rot.T + t
    a1 = np.asarray(angle_features(jnp.asarray(x), (tuple(idx[:3]),), False))
    a2 = np.asarray(angle_features(jnp.asarray(x2), (tuple(idx[:3]),), False))
    np.testing.assert_allclose(a1, a2, atol=2e-4)
    b1 = np.asarray(bond_features(jnp.asarray(x), (tuple(idx[:2]),)))
    b2 = np.asarray(bond_features(jnp.asarray(x2), (tuple(idx[:2]),)))
    np.testing.assert_allclose(b1, b2, atol=2e-4)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_alignment_idempotent(seed):
    """Aligning an already-aligned frame is a no-op (projection property)."""
    x = jnp.asarray(random_frames(seed, l=3))
    ref = np.asarray(x[0, :5] - x[0, :5].mean(0, keepdims=True))
    idx = [0, 1, 2, 3, 4]
    once = align_frames(x, ref, idx, method="qcp")
    twice = align_frames(once, ref, idx, method="qcp")
    np.testing.assert_allclose(
        np.asarray(once), np.asarray(twice), atol=5e-5
    )


name_chars = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=20, deadline=None)
@given(
    names=st.lists(name_chars, min_size=1, max_size=5, unique=True),
    seed=st.integers(0, 100),
)
def test_feature_file_roundtrip(tmp_path_factory_bypass, names, seed):
    """Generated feature files parse back to the same feature lists."""
    rng = np.random.default_rng(seed)
    u = Universe.from_arrays(rng.normal(size=(N_ATOMS, 3)))
    lines = ["[S]"]
    expected = []
    for nm in names:
        kind = ["bond", "angle", "dihedral"][rng.integers(0, 3)]
        count = {"bond": 2, "angle": 3, "dihedral": 4}[kind]
        atoms = rng.permutation(N_ATOMS)[:count] + 1  # 1-based
        sel = ", ".join(f"bynum {a}" for a in atoms)
        lines.append(f"{nm}, {kind}, {sel}")
        expected.append((nm, kind, list(atoms)))
    lines.append("[End]")
    p = tmp_path_factory_bypass / f"f_{seed}.txt"
    p.write_text("\n".join(lines) + "\n")

    feats = FeatureFileReader(str(p), "S", u).read()
    assert len(feats) == len(expected)
    for f, (nm, kind, atoms) in zip(feats, expected):
        assert f.get_name() == nm
        assert f.get_type() == kind
        np.testing.assert_array_equal(f.get_atom_indices(), atoms)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tmp_path_factory_bypass(tmp_path_factory):
    # hypothesis forbids function-scoped fixtures; session temp dir is fine
    return tmp_path_factory.mktemp("prop")
