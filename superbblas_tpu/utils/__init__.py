from .testing import (
    check_consistency,
    numpy_contraction_reference,
    numpy_copy_reference,
    verify_copy,
)

__all__ = [
    "check_consistency",
    "numpy_contraction_reference",
    "numpy_copy_reference",
    "verify_copy",
]
