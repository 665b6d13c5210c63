from . import alignment, features, fused  # noqa: F401
from .alignment import align_frames, rotation_eigh, rotation_qcp, rotation_svd
from .features import (
    angle_features,
    apply_compiled_features,
    bond_features,
    dihedral_features,
    position_features,
)
from .fused import fused_apply, fused_cv_forces, fused_model_forward

__all__ = [
    "align_frames",
    "rotation_svd",
    "rotation_eigh",
    "rotation_qcp",
    "angle_features",
    "bond_features",
    "dihedral_features",
    "position_features",
    "apply_compiled_features",
    "fused_apply",
    "fused_model_forward",
    "fused_cv_forces",
]
