"""Compute ops: stencils, boundary conditions, Poisson/multigrid solvers."""
from .bc import bc_vector, bc_scalar_periodic, exit_bc
from .convect import quick, vanleer, median3, conv_diff, accelerate
from .poisson import (PoissonLevel, make_level, mult, residual, jacobi, pcg,
                      increment, poisson_solve)
from .multigrid import (n_levels, restrict, restrict_L, prolongate,
                        build_levels, update_levels, vcycle, ml_solve)
