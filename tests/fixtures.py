"""Test fixtures: the alanine-dipeptide test system.

The 22-atom ACE-ALA-NME vacuum structure (the standard idealized geometry
used by the reference's test suite and countless MD tutorials) is embedded
here as data and written out as a PDB + feature config at test time, keeping
the tests hermetic.
"""

from __future__ import annotations

import numpy as np

from molann_tpu.systems import ALANINE_ATOMS as ALANINE, alanine_pdb_text

COORDS = np.array([[a[3], a[4], a[5]] for a in ALANINE], dtype=np.float32)

# Same feature sections as the reference's test config: a position feature
# over residue 2, the histogram observables (phi/psi dihedrals, two bonds,
# two angles), and the phi/psi output dihedrals.
FEATURE_FILE_TEXT = """\
# alanine dipeptide feature definitions (test fixture)

# Note: to keep the order of atoms, use one selector per atom
# ('bynum 5, bynum 2'), since a multi-atom selector returns atoms
# in index-sorted order.

[Preprocessing]
p1, position, resid 2
[End]
[Histogram]
d1, dihedral, bynum 5, bynum 7, bynum 9, bynum 15
d2, dihedral, bynum 7, bynum 9, bynum 15, bynum 17
b1, bond, bynum 2 5
b2, bond, bynum 5 6
a1, angle, bynum 20, bynum 19, bynum 21
a2, angle, bynum 16, bynum 15, bynum 17
[End]
[Output]
d1, dihedral, bynum 5 7 9 15
d2, dihedral, bynum 7 9 15 17
[End]
"""


def write_fixture_files(directory):
    (directory / "alanine.pdb").write_text(alanine_pdb_text())
    (directory / "features.txt").write_text(FEATURE_FILE_TEXT)
    return directory


# Golden values for the histogram features on the fixture geometry
# (float32; SURVEY.md §2.2, independently recomputable with the torch
# oracle in torch_oracle.py).
GOLDEN = {
    # name: (use_angle_value=False, use_angle_value=True)
    "d1": ([-1.0, 0.0], 3.1415927),
    "d2": ([-1.0, 0.0], 3.1415927),
    "b1": (1.529683, 1.529683),
    "b2": (1.2300372, 1.2300372),
    "a1": (-0.33281142, 1.9100797),
    "a2": (-0.5423109, 2.1439815),
}

# Centered reference coordinates of the align group 'bynum 1 2 5'.
GOLDEN_REF_X = np.array(
    [
        [-0.47566676, -0.9103333, 0.0],
        [-0.47566676, 0.17966664, 0.0],
        [0.9513333, 0.73066676, 0.0],
    ],
    dtype=np.float32,
)
