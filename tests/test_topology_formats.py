"""GRO / XYZ topology front-ends + unit-cell metadata (PDB CRYST1, .gro
box line). The reference hard-depends on MDAnalysis for topology
reading (reference molann/feature.py:101 uses AtomGroups only); this
front-end replaces it, so it must speak the coordinate formats
MD users actually have."""

import numpy as np
import pytest

from molann_tpu.topology import Universe

_GRO_ATOMS = [
    (1, "ACE", "HH31", 0.200, 0.108, 0.000),
    (1, "ACE", "CH3", 0.309, 0.100, 0.000),
    (1, "ACE", "C", 0.366, 0.238, 0.000),
    (2, "ALA", "N", 0.298, 0.352, 0.000),
    (2, "ALA", "CA", 0.348, 0.490, -0.012),
]

GRO = "alanine fragment, t= 0.0\n5\n" + "".join(
    f"{ri:5d}{rn:<5s}{nm:>5s}{i + 1:5d}{x:8.3f}{y:8.3f}{z:8.3f}\n"
    for i, (ri, rn, nm, x, y, z) in enumerate(_GRO_ATOMS)
) + "   2.50000   2.60000   2.70000\n"

GRO_TRICLINIC_BOX = (
    "   2.50000   2.60000   2.70000   0.00000   0.00000   0.40000"
    "   0.00000   0.30000   0.20000\n"
)

XYZ = """3
water molecule, Angstroms
O   0.000   0.000   0.117
H   0.757   0.586  -0.000
H  -0.757   0.586  -0.000
"""


def test_gro_loads_positions_names_residues(tmp_path):
    p = tmp_path / "m.gro"
    p.write_text(GRO)
    u = Universe(str(p))
    assert u.n_atoms == 5
    assert list(u.atoms.names) == ["HH31", "CH3", "C", "N", "CA"]
    assert list(u.atoms.resids) == [1, 1, 1, 2, 2]
    assert list(u.atoms.resnames) == ["ACE", "ACE", "ACE", "ALA", "ALA"]
    # nm -> Angstrom
    np.testing.assert_allclose(u.atoms.positions[1], [3.09, 1.00, 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.diag(u.box), [25.0, 26.0, 27.0],
                               atol=1e-5)
    # the selection language works over .gro-loaded universes
    assert u.select_atoms("resid 2 and name CA").ix.tolist() == [4]
    assert len(u.select_atoms("type H")) == 1


def test_gro_triclinic_box(tmp_path):
    p = tmp_path / "m.gro"
    p.write_text(GRO.replace("   2.50000   2.60000   2.70000\n",
                             GRO_TRICLINIC_BOX))
    u = Universe(str(p))
    expect = 10.0 * np.asarray(
        [[2.5, 0, 0], [0.4, 2.6, 0], [0.3, 0.2, 2.7]])
    np.testing.assert_allclose(u.box, expect, atol=1e-5)


def test_gro_velocities_ignored(tmp_path):
    lines = GRO.splitlines()
    lines[2:7] = [ln + "  0.1000  0.2000  0.3000" for ln in lines[2:7]]
    p = tmp_path / "m.gro"
    p.write_text("\n".join(lines) + "\n")
    u = Universe(str(p))
    np.testing.assert_allclose(u.atoms.positions[1], [3.09, 1.00, 0.0],
                               atol=1e-5)


def test_gro_rejects_corruption(tmp_path):
    p = tmp_path / "m.gro"
    p.write_text("title\nnotanumber\n")
    with pytest.raises(ValueError, match="atom count"):
        Universe(str(p))
    p.write_text("title\n9\n    1ACE     CH3    1   0.1   0.1   0.1\n")
    with pytest.raises(ValueError, match="promises 9 atoms"):
        Universe(str(p))


def test_xyz_loads(tmp_path):
    p = tmp_path / "w.xyz"
    p.write_text(XYZ)
    u = Universe(str(p))
    assert u.n_atoms == 3
    assert list(u.atoms.names) == ["O", "H", "H"]
    assert list(u.atoms.types) == ["O", "H", "H"]
    np.testing.assert_allclose(u.atoms.positions[0], [0, 0, 0.117],
                               atol=1e-6)
    assert u.box is None
    assert len(u.select_atoms("type H")) == 2


def test_xyz_rejects_corruption(tmp_path):
    p = tmp_path / "w.xyz"
    p.write_text("2\ncomment\nO 0 0\n")  # missing z AND an atom line
    with pytest.raises(ValueError):
        Universe(str(p))


def test_pdb_cryst1_box(tmp_path, fixture_dir):
    pdb = (fixture_dir / "alanine.pdb").read_text()
    assert Universe(str(fixture_dir / "alanine.pdb")).box is None
    p = tmp_path / "boxed.pdb"
    p.write_text(
        "CRYST1   25.000   26.000   27.000  90.00  90.00  90.00 P 1\n"
        + pdb)
    u = Universe(str(p))
    np.testing.assert_allclose(np.diag(u.box), [25.0, 26.0, 27.0],
                               atol=1e-4)
    assert u.n_atoms == 22
    # unit-cube placeholder CRYST1 = "no cell"
    p.write_text(
        "CRYST1    1.000    1.000    1.000  90.00  90.00  90.00 P 1\n"
        + pdb)
    assert Universe(str(p)).box is None


def test_gro_feature_pipeline_end_to_end(tmp_path):
    """A model built over a .gro universe evaluates identically to one
    built over the equivalent arrays (the front-end is topology-only)."""
    import jax.numpy as jnp

    from molann_tpu.feature import Feature
    from molann_tpu.models import FeatureLayer

    p = tmp_path / "m.gro"
    p.write_text(GRO)
    u = Universe(str(p))
    f = Feature("b1", "bond", u.select_atoms("bynum 2 3"))
    layer = FeatureLayer([f], u.atoms)
    x = jnp.asarray(u.atoms.positions)[None]
    got = np.asarray(layer(x))[0, 0]
    expect = np.linalg.norm(u.atoms.positions[2] - u.atoms.positions[1])
    np.testing.assert_allclose(got, expect, rtol=1e-6)
