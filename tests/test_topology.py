"""Topology front-end: PDB parsing + MDAnalysis-compatible selections."""

import numpy as np
import pytest

from fixtures import ALANINE, COORDS
from molann_tpu.topology import SelectionError, Universe, guess_atom_type


def test_pdb_parse(universe):
    assert universe.n_atoms == 22
    np.testing.assert_allclose(universe.atoms.positions, COORDS, atol=1e-6)
    assert universe.atoms.positions.dtype == np.float32
    assert list(universe.atoms.names[:3]) == ["1HH3", "CH3", "2HH3"]
    assert list(universe.atoms.resids[:7]) == [1, 1, 1, 1, 1, 1, 2]
    assert list(universe.atoms.resnames[6:8]) == ["ALA", "ALA"]


def test_bynum_selection(universe):
    ag = universe.select_atoms("bynum 5")
    assert list(ag.ix) == [4]
    # multi-atom selector comes back index-sorted (MDAnalysis semantics)
    ag = universe.select_atoms("bynum 5 2")
    assert list(ag.ix) == [1, 4]
    ag = universe.select_atoms("bynum 2:5")
    assert list(ag.ix) == [1, 2, 3, 4]
    ag = universe.select_atoms("bynum 1-3 7")
    assert list(ag.ix) == [0, 1, 2, 6]


def test_concatenation_preserves_order(universe):
    ag = universe.select_atoms("bynum 5") + universe.select_atoms("bynum 2")
    assert list(ag.ix) == [4, 1]
    # duplicates are preserved by + (rejection happens in Feature)
    ag2 = ag + universe.select_atoms("bynum 5")
    assert list(ag2.ix) == [4, 1, 4]


def test_resid_name_type_selections(universe):
    ag = universe.select_atoms("resid 2")
    assert list(ag.ix) == list(range(6, 16))
    ag = universe.select_atoms("name CA")
    assert list(ag.ix) == [8]
    ag = universe.select_atoms("type C or type O or type N")
    expected = [
        i for i, a in enumerate(ALANINE) if guess_atom_type(a[0]) in "CON"
    ]
    assert list(ag.ix) == expected
    ag = universe.select_atoms("resid 2 and not type H")
    assert all(universe.atoms.types[i] != "H" for i in ag.ix)


def test_boolean_operators_and_parens(universe):
    a = universe.select_atoms("(bynum 1 2) or (bynum 5 and all)")
    assert list(a.ix) == [0, 1, 4]
    b = universe.select_atoms("not bynum 1:21")
    assert list(b.ix) == [21]
    c = universe.select_atoms("all")
    assert len(c) == 22


def test_atom_identity_and_iteration(universe):
    ag = universe.select_atoms("bynum 1 2 5")
    atoms = list(ag)
    assert len(atoms) == 3
    assert atoms[0].name == "1HH3" and atoms[2].name == "C"
    # hashability/equality by (universe, ix) — needed for Feature's
    # duplicate check via set()
    assert len(set(list(ag) + list(ag))) == 3


def test_selection_errors(universe):
    with pytest.raises(SelectionError):
        universe.select_atoms("bonded name CA")  # outside supported subset
    with pytest.raises(SelectionError):
        universe.select_atoms("")
    with pytest.raises(SelectionError):
        universe.select_atoms("bynum")


def test_compound_selection_keywords(universe):
    assert len(universe.select_atoms("protein")) == 22  # ACE/ALA/NME all in
    bb = universe.select_atoms("backbone")
    assert set(universe.atoms.names[bb.ix]) <= {"N", "CA", "C", "O"}
    assert list(bb.ix) == [4, 5, 6, 8, 14, 15, 16]  # C/O(ACE) N/CA/C/O(ALA) N(NME)
    h = universe.select_atoms("hydrogen")
    heavy = universe.select_atoms("heavy")
    assert len(h) + len(heavy) == 22
    assert all(t == "H" for t in universe.atoms.types[h.ix])


def test_guess_atom_type():
    assert guess_atom_type("1HH3") == "H"
    assert guess_atom_type("CH3") == "C"
    assert guess_atom_type("CA") == "C"  # PDB alpha-carbon, not calcium
    assert guess_atom_type("N") == "N"
    assert guess_atom_type("CL1") == "Cl"


def test_from_arrays():
    u = Universe.from_arrays(COORDS, names=[a[0] for a in ALANINE])
    assert u.n_atoms == 22
    assert list(u.select_atoms("bynum 2").ix) == [1]
