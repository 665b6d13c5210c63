"""Molecular feature specs and the feature-file config front-end.

API-compatible rebuild of the reference's L1 layer (zwpku/molann
``molann/feature.py``): an immutable :class:`Feature` describing one
geometric observable over an atom group, and :class:`FeatureFileReader`
parsing ``[Section] ... [End]`` text configs into feature lists.

Behavioral contract mirrored from the reference (with file:line citations
into /root/reference):

- ``Feature`` validates its type (NotImplementedError, feature.py:81-82),
  rejects duplicate atoms (IndexError, feature.py:84-85), and asserts atom
  counts 3/2/4/any for angle/bond/dihedral/position (feature.py:87-97);
  type ids are angle=0, bond=1, dihedral=2, position=3.
- ``get_atom_indices`` returns **1-based** indices (feature.py:118-123).
- ``get_feature_info`` returns a single-row pandas DataFrame with the exact
  reference column names (feature.py:132-137).
- ``FeatureFileReader.read`` reproduces the reference grammar byte-for-byte
  (feature.py:224-265): blank/'#' lines skipped; a ``[X]`` header strips all
  surrounding brackets; only the FIRST matching section is read (break at
  ``[End]``); feature lines are ``name, type, selector[, selector...]`` with
  selectors passed verbatim (not stripped) to ``select_atoms`` and
  concatenated with order-preserving ``+``; a stray non-``[End]`` header
  inside a section raises ValueError from tuple unpacking exactly like the
  reference does.

Atom groups are duck-typed: anything exposing ``.ix`` (0-based numpy ints),
``.positions``, ``len`` and iteration works — our :class:`~.topology.AtomGroup`
or a real MDAnalysis one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["Feature", "FeatureFileReader", "FEATURE_TYPE_IDS"]

FEATURE_TYPE_IDS = {"angle": 0, "bond": 1, "dihedral": 2, "position": 3}
_REQUIRED_ATOM_COUNTS = {"angle": 3, "bond": 2, "dihedral": 4}


class Feature:
    """Immutable spec of one molecular observable over an atom group.

    :param str name: feature's name
    :param str feature_type: one of ``'angle'``, ``'bond'``, ``'dihedral'``,
        ``'position'``
    :param atom_group: atoms defining the feature, in order (duck-typed;
        our AtomGroup or MDAnalysis')

    Raises ``NotImplementedError`` for unknown types, ``IndexError`` for
    repeated atoms, ``AssertionError`` for wrong atom counts — matching the
    reference's exception classes (reference molann/feature.py:79-97).

    Example (runnable; executed by tests/test_docs.py):

    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> f = Feature("b1", "bond", u.select_atoms("bynum 2 5"))
    >>> f.get_type_id()
    1
    >>> f.get_atom_indices().tolist()   # 1-based, like the reference
    [2, 5]
    >>> f
    Feature(name='b1', type='bond', atoms(1-based)=[2, 5])
    """

    def __init__(self, name, feature_type, atom_group):
        if feature_type not in FEATURE_TYPE_IDS:
            raise NotImplementedError(f"feature {feature_type} not implemented!")

        if len(set(atom_group)) < len(atom_group):
            raise IndexError("atom group contains repeated elements!")

        required = _REQUIRED_ATOM_COUNTS.get(feature_type)
        if required is not None:
            assert len(atom_group) == required, (
                f"{required} atoms are needed to define a {feature_type} "
                f"feature, {len(atom_group)} provided"
            )

        self.name = name
        self.type_name = feature_type
        self.atom_group = atom_group
        self.type_id = FEATURE_TYPE_IDS[feature_type]

    def get_name(self):
        """Return :attr:`name`."""
        return self.name

    def get_type(self):
        """Return :attr:`type_name`."""
        return self.type_name

    def get_atom_indices(self):
        """Return **1-based** atom indices as a numpy int array
        (reference molann/feature.py:118-123)."""
        return np.asarray(self.atom_group.ix) + 1

    def get_type_id(self):
        """Return :attr:`type_id` (angle=0, bond=1, dihedral=2, position=3)."""
        return self.type_id

    def get_feature_info(self):
        """Return a one-row :class:`pandas.DataFrame` describing the feature
        (same columns as reference molann/feature.py:132-137)."""
        return pd.DataFrame(
            {
                "name": self.name,
                "type": self.type_name,
                "type_id": self.type_id,
                "atom indices (1-based)": [self.get_atom_indices()],
            }
        )

    # Value-based equality/hash so that models embedding Features as static
    # pytree metadata get stable jit-cache keys across reconstructions.
    def _key(self):
        return (self.name, self.type_name, tuple(int(i) for i in self.atom_group.ix))

    def __eq__(self, other):
        return isinstance(other, Feature) and other._key() == self._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return (
            f"Feature(name={self.name!r}, type={self.type_name!r}, "
            f"atoms(1-based)={self.get_atom_indices().tolist()})"
        )


class FeatureFileReader:
    """Build a list of :class:`Feature` from one section of a feature file.

    :param str feature_file: path to the text config
    :param str section_name: section to read (case sensitive)
    :param universe: universe used to resolve selection strings (duck-typed:
        needs ``select_atoms``)

    The file grammar is the reference's (molann/feature.py:147-195): sections
    are delimited by ``[section_name]`` / ``[End]`` lines; feature lines are
    comma-separated ``name, type, selector[, selector...]``; ``#`` starts a
    comment line; atom groups are built by ``+``-concatenating one selection
    per selector field, preserving selector order.

    Example (runnable; executed by tests/test_docs.py):

    >>> import os, tempfile
    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> path = os.path.join(tempfile.mkdtemp(), "features.txt")
    >>> _ = open(path, "w").write(
    ...     "[Output]\\n"
    ...     "b1, bond, bynum 2 5\\n"
    ...     "d1, dihedral, bynum 5, bynum 7, bynum 9, bynum 15\\n"
    ...     "[End]\\n")
    >>> reader = FeatureFileReader(path, "Output", u)
    >>> feats = reader.read()
    >>> [f.get_name() for f in feats]
    ['b1', 'd1']
    >>> reader.get_num_of_features()
    2
    """

    def __init__(self, feature_file, section_name, universe):
        self.feature_file = feature_file
        self.section_name = section_name
        self.u = universe
        self.feature_list: list[Feature] = []

    def read(self):
        """Parse the file; return the list of features from the first
        matching section (reference molann/feature.py:224-265)."""
        self.feature_list = []
        in_section = False

        with open(self.feature_file, "r") as fh:
            for line in fh:
                line = line.strip()

                if not line or line.startswith("#"):
                    continue

                if line.startswith("["):
                    if line.strip("[]") == self.section_name:
                        in_section = True
                        continue
                    if in_section and line.strip("[]") == "End":
                        break

                if in_section:
                    # Mirrors the reference exactly: a stray header line in a
                    # section has <2 comma fields and raises ValueError here.
                    feature_name, feature_type, *selector_list = line.split(",")
                    ag = None
                    for selector in selector_list:
                        sel = self.u.select_atoms(selector)
                        ag = sel if ag is None else ag + sel
                    self.feature_list.append(
                        Feature(feature_name.strip(), feature_type.strip(), ag)
                    )

        return self.feature_list

    def get_feature_list(self):
        """Return the feature list built by :meth:`read`."""
        return self.feature_list

    def get_num_of_features(self):
        """Return the number of features read."""
        return len(self.feature_list)

    def get_feature_info(self):
        """Return a :class:`pandas.DataFrame` with one row per feature
        (reference molann/feature.py:281-290)."""
        df = pd.DataFrame()
        for f in self.feature_list:
            df = pd.concat([df, f.get_feature_info()], ignore_index=True)
        return df
