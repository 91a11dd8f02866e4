from .wilson import (
    adjoint_operator,
    apply_wilson,
    apply_wilson_dagger,
    cg_solve,
    cg_step,
    gamma_matrices,
    random_su3_links,
    twisted_mass_operator,
    wilson_operator,
)
from .staggered import apply_staggered, eta_phases, staggered_operator
from .clover import (
    CloverOperator,
    apply_clover,
    clover_field_strength,
    wilson_clover_operator,
)
from .even_odd import checkerboard_masks, eo_solve, schur_matvec
from .coarse import apply_coarse, coarse_operator
from .domain_wall import apply_domain_wall, domain_wall_operator
from .multigrid import (
    build_hierarchy,
    build_prolongator,
    coarse_bsr_operator,
    coarse_matrix,
    two_grid_error_contraction,
    two_grid_preconditioner,
    vcycle_preconditioner,
)
from .eo_packed import (
    apply_hopping_packed,
    cb_pack,
    cb_unpack,
    eo_solve_packed,
    eo_solve_packed_soa,
    hopping_packed,
    hopping_packed_soa,
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
    "twisted_mass_operator",
    "apply_staggered",
    "eta_phases",
    "staggered_operator",
    "CloverOperator",
    "apply_clover",
    "clover_field_strength",
    "wilson_clover_operator",
    "checkerboard_masks",
    "eo_solve",
    "schur_matvec",
    "apply_coarse",
    "coarse_operator",
    "apply_domain_wall",
    "domain_wall_operator",
    "build_prolongator",
    "build_hierarchy",
    "vcycle_preconditioner",
    "coarse_matrix",
    "coarse_bsr_operator",
    "two_grid_error_contraction",
    "two_grid_preconditioner",
    "apply_hopping_packed",
    "cb_pack",
    "cb_unpack",
    "eo_solve_packed",
    "eo_solve_packed_soa",
    "hopping_packed_soa",
    "hopping_packed",
]
