"""Alias module mirroring the reference's import path ``molann.ann``.

Users of the reference write ``from molann.ann import MolANN, ...``; the
drop-in equivalent here is ``from molann_tpu.ann import MolANN, ...``.
Implementation lives in :mod:`molann_tpu.models.ann`.
"""

from .models.ann import (  # noqa: F401
    AlignmentLayer,
    FeatureLayer,
    FeatureMap,
    Identity,
    MolANN,
    PreprocessingANN,
    SequentialNN,
    create_sequential_nn,
)

__all__ = [
    "AlignmentLayer",
    "FeatureMap",
    "FeatureLayer",
    "PreprocessingANN",
    "MolANN",
    "SequentialNN",
    "Identity",
    "create_sequential_nn",
]
