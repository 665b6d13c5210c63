"""Periodic-boundary utilities: wrap / minimum image / make_whole /
unwrap_time (molann_tpu/pbc.py) and the 'unwrap' CLI.

Oracles: brute-force image enumeration for the triclinic minimum image,
rigid-motion reconstruction for make_whole (a wrapped rigid walk must
come back bond-exact), and exact path recovery for whole+nojump.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molann_tpu.pbc import (
    bond_tree_levels,
    box_to_dcd_cell,
    dcd_cell_to_box,
    guess_bonds,
    make_whole,
    minimum_image,
    unwrap_time,
    wrap,
)
from molann_tpu.systems import alanine_universe

BOX = np.diag([8.0, 8.0, 8.0]).astype(np.float32)


def bond_lengths(x, bonds):
    return np.linalg.norm(
        np.asarray(x)[..., bonds[:, 0], :] - np.asarray(x)[..., bonds[:, 1], :],
        axis=-1,
    )


@pytest.fixture(scope="module")
def alanine():
    u = alanine_universe()
    bonds = guess_bonds(u)
    return u, bonds, np.asarray(u.atoms.positions, np.float32)


def rigid_walk_trajectory(x0, n=40, seed=0):
    """COM random walk + small internal jitter: bonds stay ~covalent."""
    rng = np.random.default_rng(seed)
    com = np.cumsum(rng.normal(scale=0.8, size=(n, 1, 3)), 0)
    jitter = rng.normal(scale=0.05, size=(n, x0.shape[0], 3))
    return (x0[None] + com + jitter).astype(np.float32)


# ---------------------------------------------------------------- wrap


def test_wrap_orthorhombic_golden():
    out = np.asarray(wrap(jnp.array([-1.0, 5.5, 17.0]),
                          jnp.diag(jnp.array([4.0, 5.0, 6.0]))))
    np.testing.assert_allclose(out, [3.0, 0.5, 5.0], atol=1e-6)


def test_wrap_is_exact_in_f32():
    # wrap must NOT route coordinates through a (possibly bf16-default)
    # matmul: the shift applied must be an exact lattice multiple
    x = np.array([[10.713, -3.2, 17.9]], np.float32)
    out = np.asarray(wrap(jnp.asarray(x), jnp.asarray(BOX)))
    np.testing.assert_allclose(out, x - 8.0 * np.floor(x / 8.0),
                               atol=1e-6)


def test_wrap_triclinic_stays_in_cell():
    box = np.array([[10, 0, 0], [3, 9, 0], [-2, 1, 8]], np.float32)
    rng = np.random.default_rng(3)
    x = rng.uniform(-40, 40, size=(256, 3)).astype(np.float32)
    out = np.asarray(wrap(jnp.asarray(x), jnp.asarray(box)))
    # the GROMACS brick cell: every Cartesian component in [0, box[i][i])
    diag = np.diag(box)
    assert (out >= -1e-4).all() and (out < diag + 1e-4).all()
    # and the move is a lattice translation: fractional shift is integer
    dfrac = (out - x) @ np.linalg.inv(box.astype(np.float64))
    np.testing.assert_allclose(dfrac, np.round(dfrac), atol=1e-4)


def test_wrap_per_frame_boxes():
    boxes = np.stack([BOX, 2 * BOX]).astype(np.float32)
    x = np.full((2, 5, 3), 9.0, np.float32)
    out = np.asarray(wrap(jnp.asarray(x), jnp.asarray(boxes)))
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 9.0, atol=1e-6)


def test_wrap_shape_mismatch():
    with pytest.raises(ValueError, match="per-frame boxes"):
        wrap(jnp.zeros((3, 5, 3)), jnp.zeros((2, 3, 3)))
    with pytest.raises(ValueError, match="box must be"):
        wrap(jnp.zeros((5, 3)), jnp.zeros((4, 4)))


# ------------------------------------------------------- minimum image


def test_minimum_image_orthorhombic_golden():
    out = np.asarray(minimum_image(jnp.array([9.0, 0.2, -9.5]),
                                   jnp.asarray(BOX) * 1.25))
    np.testing.assert_allclose(out, [-1.0, 0.2, 0.5], atol=1e-6)


def test_minimum_image_triclinic_vs_brute_force():
    box = np.array([[10, 0, 0], [3, 9, 0], [-2, 1, 8]], np.float32)
    rng = np.random.default_rng(7)
    dx = rng.uniform(-15, 15, size=(500, 3)).astype(np.float32)
    got = np.asarray(minimum_image(jnp.asarray(dx), jnp.asarray(box)))
    shifts = np.array(
        [[i, j, k] for i in range(-3, 4) for j in range(-3, 4)
         for k in range(-3, 4)], np.float64)
    images = dx[:, None, :].astype(np.float64) - shifts[None] @ box
    best = np.linalg.norm(images, axis=-1).min(axis=1)
    norm = np.linalg.norm(got, axis=-1)
    # exact minimum image for every displacement below half the
    # inscribed sphere (all physical bonds/contacts); never an invalid
    # (non-lattice) translation anywhere
    short = best < 3.5
    assert short.sum() > 50
    np.testing.assert_allclose(norm[short], best[short], atol=1e-4)
    frac_g = got @ np.linalg.inv(box.astype(np.float64))
    frac_d = dx @ np.linalg.inv(box.astype(np.float64))
    np.testing.assert_allclose(np.round(frac_g - frac_d), frac_g - frac_d,
                               atol=1e-4)


def test_minimum_image_per_frame_boxes_broadcast():
    boxes = np.stack([BOX, 4 * BOX]).astype(np.float32)
    dx = np.full((2, 6, 3), 7.0, np.float32)
    out = np.asarray(minimum_image(jnp.asarray(dx), jnp.asarray(boxes)))
    np.testing.assert_allclose(out[0], -1.0, atol=1e-6)  # 7 - 8
    np.testing.assert_allclose(out[1], 7.0, atol=1e-6)  # 32-box: unchanged


# ------------------------------------------------------- bond guessing


def test_guess_bonds_alanine_is_spanning_tree(alanine):
    u, bonds, x0 = alanine
    assert len(bonds) == 21  # 22 atoms, acyclic molecule
    assert (bonds[:, 0] < bonds[:, 1]).all()
    # every guessed bond is a plausible covalent distance
    bl = bond_lengths(x0, bonds)
    assert bl.max() < 1.8 and bl.min() > 0.8
    levels = bond_tree_levels(22, bonds)
    covered = {int(c) for cs, _ in levels for c in cs}
    assert covered == set(range(1, 22))  # root 0 + all others reached


def test_bond_tree_levels_rejects_bad_indices():
    with pytest.raises(ValueError, match="outside"):
        bond_tree_levels(4, [[0, 9]])


def test_bond_tree_levels_isolated_atoms():
    levels = bond_tree_levels(5, [[0, 1], [3, 4]])
    covered = {int(c) for cs, _ in levels for c in cs}
    assert 2 not in covered  # isolated atom: left alone
    assert covered == {1, 4}


# ---------------------------------------------------------- make_whole


def test_make_whole_restores_wrapped_rigid_shift(alanine):
    u, bonds, x0 = alanine
    xs = x0 + np.float32([6.0, 6.0, 6.0])
    xw = np.asarray(wrap(jnp.asarray(xs), jnp.asarray(BOX)))
    assert bond_lengths(xw, bonds).max() > 4.0  # actually broken
    fixed = np.asarray(make_whole(jnp.asarray(xw), jnp.asarray(BOX),
                                  universe=u))
    np.testing.assert_allclose(bond_lengths(fixed, bonds),
                               bond_lengths(x0, bonds), atol=1e-5)


def test_make_whole_batched_per_frame_boxes(alanine):
    u, bonds, x0 = alanine
    traj = rigid_walk_trajectory(x0)
    boxes = np.repeat(BOX[None], traj.shape[0], 0)
    trajw = np.asarray(wrap(jnp.asarray(traj), jnp.asarray(boxes)))
    fixed = np.asarray(make_whole(jnp.asarray(trajw), jnp.asarray(boxes),
                                  bonds=guess_bonds(u)))
    np.testing.assert_allclose(bond_lengths(fixed, bonds),
                               bond_lengths(traj, bonds), atol=1e-4)


def test_make_whole_is_jittable(alanine):
    u, bonds, x0 = alanine
    levels = bond_tree_levels(len(x0), bonds)
    fn = jax.jit(lambda x, b: make_whole(x, b, levels=levels))
    xw = wrap(jnp.asarray(x0 + np.float32([5, 5, 5])), jnp.asarray(BOX))
    out = np.asarray(fn(xw[None], jnp.asarray(BOX)))
    np.testing.assert_allclose(bond_lengths(out[0], bonds),
                               bond_lengths(x0, bonds), atol=1e-5)


def test_make_whole_needs_connectivity():
    with pytest.raises(ValueError, match="bonds=, universe=, or levels="):
        make_whole(jnp.zeros((2, 3, 3)), jnp.asarray(BOX))


# --------------------------------------------------------- unwrap_time


def test_unwrap_time_recovers_continuous_path(alanine):
    u, bonds, x0 = alanine
    traj = rigid_walk_trajectory(x0, n=60, seed=2)
    trajw = np.asarray(wrap(jnp.asarray(traj), jnp.asarray(BOX)))
    whole = make_whole(jnp.asarray(trajw), jnp.asarray(BOX), bonds=bonds)
    uw = np.asarray(unwrap_time(whole, jnp.asarray(BOX)))
    # whole+nojump recovers the original path up to ONE constant lattice
    # offset (set by frame 0's wrap)
    d = uw - traj
    np.testing.assert_allclose(d, np.broadcast_to(d[0], d.shape),
                               atol=1e-4)
    np.testing.assert_allclose(np.round(d[0, 0] / 8.0) * 8.0, d[0, 0],
                               atol=1e-4)


def test_unwrap_time_box_count_mismatch():
    with pytest.raises(ValueError, match="boxes for"):
        unwrap_time(jnp.zeros((5, 2, 3)), jnp.zeros((3, 3, 3)))


# ------------------------------------------------------------ DCD cell


def test_dcd_cell_to_box_degrees_and_cosines():
    deg = dcd_cell_to_box(np.array([10.0, 90.0, 11.0, 90.0, 90.0, 12.0]))
    np.testing.assert_allclose(deg, np.diag([10, 11, 12]), atol=1e-5)
    cosform = dcd_cell_to_box(np.array([10.0, 0.0, 11.0, 0.0, 0.0, 12.0]))
    np.testing.assert_allclose(cosform, np.diag([10, 11, 12]), atol=1e-5)
    # triclinic round-trip: box -> (a,b,c,angles) -> box
    box = np.array([[10, 0, 0], [3, 9, 0], [-2, 1, 8]], np.float64)
    a, b, c = (np.linalg.norm(box[i]) for i in range(3))
    cosa = box[1] @ box[2] / (b * c)
    cosb = box[0] @ box[2] / (a * c)
    cosg = box[0] @ box[1] / (a * b)
    rec = dcd_cell_to_box(np.array([a, cosg, b, cosb, cosa, c]))
    np.testing.assert_allclose(rec, box, atol=1e-4)


def test_box_to_dcd_cell_roundtrip():
    tri = np.array([[10, 0, 0], [3, 9, 0], [-2, 1, 8]], np.float64)
    np.testing.assert_allclose(dcd_cell_to_box(box_to_dcd_cell(tri)),
                               tri, atol=1e-4)
    # batched, mixed orthorhombic/triclinic
    boxes = np.stack([np.diag([8.0, 9.0, 10.0]), tri])
    np.testing.assert_allclose(dcd_cell_to_box(box_to_dcd_cell(boxes)),
                               boxes, atol=1e-4)
    with pytest.raises(ValueError, match=r"\[l, 3, 3\]"):
        box_to_dcd_cell(np.zeros((3,)))


# ------------------------------------------------------------- the CLI


def test_cli_unwrap_xtc_roundtrip(alanine, tmp_path):
    from molann_tpu.cli import main
    from molann_tpu.io.xdr import write_xtc
    from molann_tpu.systems import alanine_pdb_text

    u, bonds, x0 = alanine
    pdb = tmp_path / "ala.pdb"
    pdb.write_text(alanine_pdb_text())
    traj = rigid_walk_trajectory(x0, n=16, seed=5)
    trajw = np.asarray(wrap(jnp.asarray(traj), jnp.asarray(BOX)))
    assert bond_lengths(trajw, bonds).max() > 4.0
    xtc = tmp_path / "wrapped.xtc"
    write_xtc(str(xtc), trajw, box=BOX, precision=100000.0)
    out = tmp_path / "whole.npy"
    rc = main(["unwrap", str(xtc), str(pdb), str(out),
               "--mode", "whole+nojump"])
    assert rc == 0
    fixed = np.load(out)
    # XTC quantizes to 1/precision; bonds must be covalent again
    np.testing.assert_allclose(bond_lengths(fixed, bonds),
                               bond_lengths(traj, bonds), atol=1e-3)
    # nojump: continuous in time (no ~box-length jumps)
    assert np.abs(np.diff(fixed, axis=0)).max() < 4.0


def test_cli_unwrap_keeps_box(alanine, tmp_path):
    """Repaired trajectories must carry their cell: an unwrap output in
    any box-bearing format feeds a SECOND box-consuming pass (or GROMACS
    tools) without --box."""
    from molann_tpu.cli import main
    from molann_tpu.io.dcd import read_dcd
    from molann_tpu.io.xdr import read_xtc, write_xtc
    from molann_tpu.systems import alanine_pdb_text

    u, bonds, x0 = alanine
    pdb = tmp_path / "ala.pdb"
    pdb.write_text(alanine_pdb_text())
    traj = rigid_walk_trajectory(x0, n=8, seed=7)
    trajw = np.asarray(wrap(jnp.asarray(traj), jnp.asarray(BOX)))
    xtc = tmp_path / "wrapped.xtc"
    write_xtc(str(xtc), trajw, box=BOX, precision=100000.0)

    whole_xtc = tmp_path / "whole.xtc"
    assert main(["unwrap", str(xtc), str(pdb), str(whole_xtc),
                 "--mode", "whole"]) == 0
    frames, _, boxes = read_xtc(str(whole_xtc))
    np.testing.assert_allclose(boxes, np.broadcast_to(BOX, boxes.shape),
                               atol=1e-5)
    # second pass consumes the written box — no --box needed
    out = tmp_path / "nojump.npy"
    assert main(["unwrap", str(whole_xtc), str(pdb), str(out),
                 "--mode", "nojump"]) == 0
    assert np.abs(np.diff(np.load(out), axis=0)).max() < 4.0

    whole_dcd = tmp_path / "whole.dcd"
    assert main(["unwrap", str(xtc), str(pdb), str(whole_dcd),
                 "--mode", "whole"]) == 0
    _, cell = read_dcd(str(whole_dcd))
    assert cell is not None
    np.testing.assert_allclose(dcd_cell_to_box(cell),
                               np.broadcast_to(BOX, (8, 3, 3)), atol=1e-5)


def test_cli_unwrap_npy_needs_box(alanine, tmp_path):
    from molann_tpu.cli import main
    from molann_tpu.systems import alanine_pdb_text

    u, bonds, x0 = alanine
    pdb = tmp_path / "ala.pdb"
    pdb.write_text(alanine_pdb_text())
    npy = tmp_path / "traj.npy"
    xw = np.asarray(wrap(jnp.asarray(x0[None] + np.float32([6, 0, 6])),
                         jnp.asarray(BOX)))
    np.save(npy, xw)
    with pytest.raises(SystemExit, match="no box vectors"):
        main(["unwrap", str(npy), str(pdb), str(tmp_path / "o.npy")])
    rc = main(["unwrap", str(npy), str(pdb), str(tmp_path / "o.npy"),
               "--box", "8,8,8"])
    assert rc == 0
    fixed = np.load(tmp_path / "o.npy")
    np.testing.assert_allclose(bond_lengths(fixed[0], bonds),
                               bond_lengths(x0, bonds), atol=1e-5)


def test_cli_unwrap_atom_count_mismatch(alanine, tmp_path):
    from molann_tpu.cli import main
    from molann_tpu.systems import alanine_pdb_text

    pdb = tmp_path / "ala.pdb"
    pdb.write_text(alanine_pdb_text())
    npy = tmp_path / "traj.npy"
    np.save(npy, np.zeros((2, 5, 3), np.float32))
    with pytest.raises(SystemExit, match="22 atoms"):
        main(["unwrap", str(npy), str(pdb), str(tmp_path / "o.npy"),
              "--box", "8,8,8"])
