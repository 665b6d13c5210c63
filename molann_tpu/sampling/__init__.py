"""Enhanced-sampling building blocks: the downstream consumer the
reference feeds but never ships.

The reference's artifacts exist to drive biased MD (reference
README.rst:51 — "adaptive learning of reaction coordinates"); this
subpackage closes that loop in-framework: a differentiable toy
internal-coordinate force field (:mod:`potentials`), an overdamped
Langevin integrator built on ``lax.scan`` (:mod:`langevin`), and CV-space
biases — steered-MD moving restraints, well-tempered-style
metadynamics (:mod:`bias`), and OPES (:mod:`opes`) — whose forces come
from differentiating a MolANN model's collective variables w.r.t.
coordinates.

Everything is jit/vmap-friendly: walkers are a leading batch axis, steps
are a ``lax.scan``, deposits are ``dynamic_update_slice`` writes — the
whole biased trajectory runs as ONE compiled TPU program.
"""

from .bias import MetadBias, metadynamics_langevin, steered_langevin
from .committor import empirical_committor, rotate_torsion
from .opes import OpesBias, opes_langevin
from .langevin import baoab_langevin, kinetic_temperature, overdamped_langevin
from .mbar import mbar, pmf_from_samples, umbrella_sampling
from .msm import (
    MSM,
    BootstrapMSM,
    bootstrap_msm,
    ck_test,
    coarse_grain,
    count_matrix,
    estimate_msm,
    grid_assign,
    mfpt,
    pcca_memberships,
    transition_matrix,
)
from .pathcv import PathCV
from .potentials import LennardJonesPotential, ToyPeptidePotential
from .remd import replica_exchange_langevin
from .tpt import TPT, forward_committor, tpt
from .string import grid_interpolator, linear_path, string_method


def load_bias(path):
    """Load a saved bias file: dispatches between OPES kernels
    (:meth:`OpesBias.save`) and metadynamics hills
    (:meth:`MetadBias.save`) by the ``opes`` marker field — the one
    loader the ``fes``/``mep`` CLI commands use."""
    import numpy as np

    with np.load(path) as f:
        is_opes = "opes" in f
    return OpesBias.load(path) if is_opes else MetadBias.load(path)

__all__ = [
    "ToyPeptidePotential",
    "LennardJonesPotential",
    "overdamped_langevin",
    "baoab_langevin",
    "kinetic_temperature",
    "steered_langevin",
    "metadynamics_langevin",
    "MetadBias",
    "opes_langevin",
    "OpesBias",
    "load_bias",
    "empirical_committor",
    "rotate_torsion",
    "mbar",
    "umbrella_sampling",
    "pmf_from_samples",
    "replica_exchange_langevin",
    "string_method",
    "grid_interpolator",
    "linear_path",
    "PathCV",
    "MSM",
    "estimate_msm",
    "grid_assign",
    "count_matrix",
    "transition_matrix",
    "ck_test",
    "mfpt",
    "pcca_memberships",
    "coarse_grain",
    "bootstrap_msm",
    "BootstrapMSM",
    "TPT",
    "tpt",
    "forward_committor",
]
