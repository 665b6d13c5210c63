"""molann_tpu — TPU-native collective-variable networks for molecular systems.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
zwpku/molann: neural networks over molecular features (bonds, angles,
dihedrals, positions) with Kabsch alignment, for learning collective
variables from MD trajectories.

Drop-in API surface (``molann_tpu.feature`` / ``molann_tpu.ann`` mirror the
reference's ``molann.feature`` / ``molann.ann``), plus the TPU-native layer
the reference never had: compiled static feature specs, a differentiable
quaternion Kabsch, fused Pallas feature+MLP kernels, `jax.grad` forces,
ICI data-parallel training, and StableHLO export.
"""

from . import ann, feature, ops, pbc, spec, topology  # noqa: F401
from .ops.fused import (  # noqa: F401
    active_atom_indices,
    fused_cv_forces,
    fused_model_forward,
    fused_train_grads,
)
from .ann import (  # noqa: F401
    AlignmentLayer,
    FeatureLayer,
    FeatureMap,
    Identity,
    MolANN,
    PreprocessingANN,
    SequentialNN,
    create_sequential_nn,
)
from .feature import Feature, FeatureFileReader  # noqa: F401
from .topology import Atom, AtomGroup, Universe  # noqa: F401

__version__ = "0.1.0"

__all__ = [
    "Feature",
    "FeatureFileReader",
    "AlignmentLayer",
    "FeatureMap",
    "FeatureLayer",
    "PreprocessingANN",
    "MolANN",
    "SequentialNN",
    "Identity",
    "create_sequential_nn",
    "Atom",
    "AtomGroup",
    "Universe",
    "fused_model_forward",
    "active_atom_indices",
    "fused_cv_forces",
    "fused_train_grads",
]
