"""Feature spec + feature-file reader: validation, info, parser grammar."""

import numpy as np
import pandas as pd
import pytest

from molann_tpu.feature import Feature, FeatureFileReader


def test_feature_validation(universe):
    f = Feature("phi", "dihedral", universe.select_atoms("bynum 5 7 9 15"))
    assert f.get_type() == "dihedral"
    assert f.get_type_id() == 2
    assert f.get_name() == "phi"
    np.testing.assert_array_equal(f.get_atom_indices(), [5, 7, 9, 15])

    with pytest.raises(NotImplementedError):
        Feature("x", "torsion", universe.select_atoms("bynum 1 2 3 4"))
    with pytest.raises(IndexError):
        ag = universe.select_atoms("bynum 1") + universe.select_atoms("bynum 1")
        Feature("x", "bond", ag)
    with pytest.raises(AssertionError):
        Feature("x", "bond", universe.select_atoms("bynum 1 2 3"))
    with pytest.raises(AssertionError):
        Feature("x", "angle", universe.select_atoms("bynum 1 2"))
    with pytest.raises(AssertionError):
        Feature("x", "dihedral", universe.select_atoms("bynum 1 2 3"))
    # position accepts any atom count
    Feature("x", "position", universe.select_atoms("bynum 1:9"))


def test_type_ids(universe):
    assert Feature("a", "angle", universe.select_atoms("bynum 1 2 3")).type_id == 0
    assert Feature("b", "bond", universe.select_atoms("bynum 1 2")).type_id == 1
    assert Feature("d", "dihedral", universe.select_atoms("bynum 1 2 3 4")).type_id == 2
    assert Feature("p", "position", universe.select_atoms("bynum 1")).type_id == 3


def test_feature_info_dataframe(universe):
    f = Feature("b1", "bond", universe.select_atoms("bynum 2 5"))
    df = f.get_feature_info()
    assert isinstance(df, pd.DataFrame)
    assert list(df.columns) == ["name", "type", "type_id", "atom indices (1-based)"]
    assert df.loc[0, "name"] == "b1"
    assert df.loc[0, "type_id"] == 1
    np.testing.assert_array_equal(df.loc[0, "atom indices (1-based)"], [2, 5])


def test_reader_sections(universe, feature_file):
    r = FeatureFileReader(feature_file, "Histogram", universe)
    feats = r.read()
    assert r.get_num_of_features() == 6
    assert [f.get_name() for f in feats] == ["d1", "d2", "b1", "b2", "a1", "a2"]
    assert [f.get_type() for f in feats] == [
        "dihedral", "dihedral", "bond", "bond", "angle", "angle",
    ]
    # per-atom selectors preserve order
    np.testing.assert_array_equal(feats[0].get_atom_indices(), [5, 7, 9, 15])
    np.testing.assert_array_equal(feats[4].get_atom_indices(), [20, 19, 21])
    # multi-atom selector 'bynum 2 5' comes back index-sorted
    np.testing.assert_array_equal(feats[2].get_atom_indices(), [2, 5])

    r2 = FeatureFileReader(feature_file, "Preprocessing", universe)
    feats2 = r2.read()
    assert len(feats2) == 1
    assert feats2[0].get_type() == "position"
    np.testing.assert_array_equal(
        feats2[0].get_atom_indices(), list(range(7, 17))
    )

    r3 = FeatureFileReader(feature_file, "Output", universe)
    feats3 = r3.read()
    assert len(feats3) == 2
    assert feats3[0].get_type() == "dihedral"


def test_reader_feature_info(universe, feature_file):
    r = FeatureFileReader(feature_file, "Histogram", universe)
    r.read()
    df = r.get_feature_info()
    assert len(df) == 6
    assert list(df["name"]) == ["d1", "d2", "b1", "b2", "a1", "a2"]


def test_reader_first_section_only(universe, tmp_path):
    p = tmp_path / "f.txt"
    p.write_text(
        "[S]\nb1, bond, bynum 1 2\n[End]\n[S]\nb2, bond, bynum 3 4\n[End]\n"
    )
    feats = FeatureFileReader(str(p), "S", universe).read()
    assert [f.get_name() for f in feats] == ["b1"]


def test_reader_comments_and_blanks(universe, tmp_path):
    p = tmp_path / "f.txt"
    p.write_text(
        "# comment\n\n[S]\n# inner comment\n\nb1, bond, bynum 1 2\n[End]\n"
    )
    feats = FeatureFileReader(str(p), "S", universe).read()
    assert len(feats) == 1


def test_reader_missing_section(universe, feature_file):
    feats = FeatureFileReader(feature_file, "NoSuchSection", universe).read()
    assert feats == []


def test_reader_stray_header_raises(universe, tmp_path):
    # Reference quirk (SURVEY.md §3.4): a non-[End] header inside a section
    # falls through to feature-line parsing and raises ValueError.
    p = tmp_path / "f.txt"
    p.write_text("[S]\n[Other]\nb1, bond, bynum 1 2\n[End]\n")
    with pytest.raises(ValueError):
        FeatureFileReader(str(p), "S", universe).read()


def test_reader_selector_concatenation_order(universe, tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("[S]\nd, dihedral, bynum 9, bynum 5, bynum 7, bynum 15\n[End]\n")
    feats = FeatureFileReader(str(p), "S", universe).read()
    np.testing.assert_array_equal(feats[0].get_atom_indices(), [9, 5, 7, 15])


def test_feature_equality_and_hash(universe):
    f1 = Feature("b", "bond", universe.select_atoms("bynum 2 5"))
    f2 = Feature("b", "bond", universe.select_atoms("bynum 2 5"))
    f3 = Feature("b", "bond", universe.select_atoms("bynum 2 6"))
    assert f1 == f2 and hash(f1) == hash(f2)
    assert f1 != f3
