"""Ghost-cell boundary conditions.

Functional, whole-plane `.at[].set` updates replacing the reference's slice
kernels (`BC!` src/util.jl:192-210, `exitBC!` :216-222, `perBC!` :227-231).
All plane writes are static-shape dynamic-update-slices, which XLA compiles
to cheap in-place updates on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid import plane

__all__ = ["bc_vector", "bc_scalar_periodic", "exit_bc"]


def bc_vector(u: jax.Array, A, save_exit: bool = False, perdir: tuple = ()) -> jax.Array:
    """Apply domain BCs to the ghost cells of a vector field ``u`` (D,*S).

    Mirrors reference ``BC!`` (src/util.jl:192-210):
    - periodic direction ``j``: ghost planes copy the opposite interior plane;
    - normal component (``i==j``): Dirichlet ``A[i]`` on *both* the ghost and
      the first interior plane at the low wall, and on the high ghost plane
      (skipped for ``i==0`` when ``save_exit`` to preserve the outlet);
    - tangential components: zero-Neumann copy of the adjacent plane.

    Loop order (components outer, directions inner) matches the reference so
    ghost-corner values agree exactly.
    """
    D = u.shape[0]
    S = u.shape[1:]
    for i in range(D):
        for j in range(D):
            pj = lambda idx: (i,) + plane(D, j, idx)
            if j in perdir:
                u = u.at[pj(0)].set(u[pj(S[j] - 2)])
                u = u.at[pj(S[j] - 1)].set(u[pj(1)])
            elif i == j:
                u = u.at[pj(0)].set(A[i])
                u = u.at[pj(1)].set(A[i])
                if not (save_exit and i == 0):
                    u = u.at[pj(S[j] - 1)].set(A[i])
            else:
                u = u.at[pj(0)].set(u[pj(1)])
                u = u.at[pj(S[j] - 1)].set(u[pj(S[j] - 2)])
    return u


def bc_scalar_periodic(a: jax.Array, perdir: tuple, D: int | None = None) -> jax.Array:
    """Periodic ghost fill for a scalar field (reference ``perBC!``)."""
    if not perdir:
        return a
    D = a.ndim if D is None else D
    lead = a.ndim - D
    S = a.shape[lead:]
    for j in perdir:
        pj = lambda idx: (slice(None),) * lead + plane(D, j, idx)
        a = a.at[pj(0)].set(a[pj(S[j] - 2)])
        a = a.at[pj(S[j] - 1)].set(a[pj(1)])
    return a


def exit_bc(u: jax.Array, u0: jax.Array, U, dt) -> jax.Array:
    """1D convective outlet on the high-x ghost plane + global flux fix.

    Mirrors reference ``exitBC!`` (src/util.jl:216-222): the exit plane
    (last x-ghost, interior in the transverse directions) is advected out of
    the domain with speed ``U[0]`` and then shifted uniformly so the mean
    outflow equals ``U[0]`` (global mass conservation).
    """
    D = u.shape[0]
    S = u.shape[1:]
    ex = (0, S[0] - 1) + tuple(slice(1, -1) for _ in range(D - 1))
    exm = (0, S[0] - 2) + tuple(slice(1, -1) for _ in range(D - 1))
    new = u0[ex] - U[0] * dt * (u0[ex] - u0[exm])
    flux = jnp.mean(new) - U[0]
    return u.at[ex].set(new - flux)
