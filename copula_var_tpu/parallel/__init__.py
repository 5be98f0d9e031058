from copula_var_tpu.parallel.mesh import make_mesh
from copula_var_tpu.parallel.quadrature import (
    sharded_msm_step,
    sharded_garch_step,
    sharded_cached_step,
    sharded_bisection_solve,
    grid_sharded_garch_integrals,
)

__all__ = [
    "make_mesh",
    "sharded_msm_step",
    "sharded_garch_step",
    "sharded_cached_step",
    "sharded_bisection_solve",
    "grid_sharded_garch_integrals",
]
