"""superbblas_tpu — a TPU-native distributed tensor-algebra engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
superbblas C++ library (label-based tensor copy/permute/scale/add, einsum
contractions, block-sparse lattice operators, distributed dense solvers,
sharded storage), re-designed for TPU: GSPMD meshes instead of MPI,
dot_general/Pallas instead of vendor BLAS, ppermute halo exchange instead of
Ialltoallv.
"""

from . import flags, labels
from .labels import ContractionPlan
from .ops import local_contraction, local_copy, local_permute

__version__ = "0.1.0"

__all__ = [
    "flags",
    "labels",
    "ContractionPlan",
    "local_copy",
    "local_permute",
    "local_contraction",
]
