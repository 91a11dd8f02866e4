from .wilson import (
    adjoint_operator,
    apply_wilson,
    apply_wilson_dagger,
    cg_solve,
    cg_step,
    gamma_matrices,
    random_su3_links,
    wilson_operator,
)

__all__ = [
    "adjoint_operator",
    "apply_wilson",
    "apply_wilson_dagger",
    "cg_solve",
    "cg_step",
    "gamma_matrices",
    "random_su3_links",
    "wilson_operator",
]
