"""Ghost-cell boundary conditions in mask+roll form.

Replaces the reference's boundary slice kernels (`BC!` src/util.jl:192-210,
`exitBC!` :216-222, `perBC!` :227-231).  Every plane update is expressed as
``where(index-mask, rolled-neighbour-or-value, field)`` — a pure elementwise
program with no scatters.  This matters twice on TPU: XLA fuses the whole
BC sweep into one VMEM pass, and the SPMD partitioner handles masked
elementwise ops exactly under *uneven* spatial sharding (integer-indexed
plane scatters do not).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid import shift, axis_coord

__all__ = ["bc_vector", "bc_scalar_periodic", "exit_bc"]


def _per_fill(a: jax.Array, j: int) -> jax.Array:
    """Periodic ghost fill along spatial axis j of a scalar-shaped array."""
    S = a.shape
    k = axis_coord(S, j)
    a = jnp.where(k == 0, shift(a, j, S[j] - 2), a)
    return jnp.where(k == S[j] - 1, shift(a, j, -(S[j] - 2)), a)


def bc_vector(u: jax.Array, A, save_exit: bool = False, perdir: tuple = ()) -> jax.Array:
    """Apply domain BCs to the ghost cells of a vector field ``u`` (D,*S).

    Mirrors reference ``BC!`` (src/util.jl:192-210):
    - periodic direction ``j``: ghost planes copy the opposite interior plane;
    - normal component (``i==j``): Dirichlet ``A[i]`` on the ghost *and*
      first interior plane at the low wall, and on the high ghost plane
      (skipped for ``i==0`` when ``save_exit`` to preserve the outlet);
    - tangential components: zero-Neumann copy of the adjacent plane.

    Sequential update order (component-major, direction-minor) matches the
    reference so ghost-corner values agree exactly.
    """
    D = u.shape[0]
    S = u.shape[1:]
    comps = []
    for i in range(D):
        a = u[i]
        for j in range(D):
            k = axis_coord(S, j)
            if j in perdir:
                a = _per_fill(a, j)
            elif i == j:
                lo = (k == 0) | (k == 1)
                a = jnp.where(lo, A[i], a)
                if not (save_exit and i == 0):
                    a = jnp.where(k == S[j] - 1, A[i], a)
            else:
                a = jnp.where(k == 0, shift(a, j, +1), a)
                a = jnp.where(k == S[j] - 1, shift(a, j, -1), a)
        comps.append(a)
    return jnp.stack(comps, axis=0)


def bc_scalar_periodic(a: jax.Array, perdir: tuple, D: int | None = None) -> jax.Array:
    """Periodic ghost fill for a scalar field (reference ``perBC!``)."""
    if not perdir:
        return a
    D = a.ndim if D is None else D
    lead = a.ndim - D
    if lead == 0:
        for j in perdir:
            a = _per_fill(a, j)
        return a
    # leading component axes: vectorize over them via reshape-free mapping
    S = a.shape[lead:]
    for j in perdir:
        k = axis_coord(a.shape, lead + j)
        a = jnp.where(k == 0, shift(a, lead + j, S[j] - 2), a)
        a = jnp.where(k == S[j] - 1, shift(a, lead + j, -(S[j] - 2)), a)
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
    mask = axis_coord(S, 0) == S[0] - 1
    count = 1
    for d in range(1, D):
        k = axis_coord(S, d)
        mask = mask & (k >= 1) & (k <= S[d] - 2)
        count *= S[d] - 2
    conv = u0[0] - U[0] * dt * (u0[0] - shift(u0[0], 0, -1))
    flux = jnp.sum(jnp.where(mask, conv, 0.0)) / count - U[0]
    return u.at[0].set(jnp.where(mask, conv - flux, u[0]))
