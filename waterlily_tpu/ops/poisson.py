"""Matrix-free variable-coefficient Poisson operator and smoothers.

TPU-native re-design of the reference solver (src/Poisson.jl).  The linear
system is ``Ax = [L+D+L']x = z`` where ``L`` holds the face coefficients
(these *are* the BDIM zeroth moments — src/WaterLily.jl:77) and the diagonal
is derived: ``D[I] = -Σᵢ(L[I,i]+L[I+δᵢ,i])``.

Design differences from the reference, driven by XLA semantics:
- The reference's PCG exits early on degenerate ``rho``/``alpha``
  (src/Poisson.jl:127,132,137).  Data-dependent returns don't exist under
  `jit`, so the smoother carries a boolean ``dead`` flag and masks all state
  updates once tripped — bit-identical control flow, fixed trip count.
- All dot products are on-device `vdot`s; nothing syncs to the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..grid import shift, interior, interior_view, inside_count
from .bc import bc_scalar_periodic

__all__ = ["PoissonLevel", "make_level", "mult", "residual", "jacobi", "pcg",
           "increment", "poisson_solve"]


@struct.dataclass
class PoissonLevel:
    """One multigrid level: face coefficients + derived (inverse) diagonal.

    ``perdir`` is static pytree metadata (it selects program structure)."""
    L: jax.Array      # (D, *S) lower-diagonal face coefficients
    D: jax.Array      # (*S) diagonal, zero in ghosts
    iD: jax.Array     # (*S) guarded inverse diagonal (0 inside bodies)
    perdir: tuple = struct.field(pytree_node=False, default=())


def _diag(L: jax.Array) -> jax.Array:
    """D[I] = -Σᵢ (L[I,i] + L[I+δᵢ,i]) on the interior (src/Poisson.jl:48-54)."""
    D = L.shape[0]
    S = L.shape[1:]
    s = jnp.zeros(S, L.dtype)
    for i in range(D):
        s = s - (L[i] + shift(L[i], i, +1))
    out = jnp.zeros(S, L.dtype)
    return out.at[interior(len(S))].set(s[interior(len(S))])


def make_level(L: jax.Array, perdir: tuple = ()) -> PoissonLevel:
    """Build a level from face coefficients (reference ``set_diag!``)."""
    Dd = _diag(L)
    eps = jnp.finfo(L.dtype).eps
    iD = jnp.where(Dd * Dd < 2 * eps, 0.0, 1.0 / jnp.where(Dd == 0, 1.0, Dd))
    iD = iD.astype(L.dtype) * (Dd != 0)
    return PoissonLevel(L=L, D=Dd, iD=iD, perdir=perdir)


def mult(lev: PoissonLevel, x: jax.Array) -> jax.Array:
    """z = A x with zero ghosts (reference ``mult!``, src/Poisson.jl:62-75)."""
    x = bc_scalar_periodic(x, lev.perdir)
    D = lev.L.shape[0]
    S = x.shape
    s = x * lev.D
    for i in range(D):
        s = s + shift(x, i, -1) * lev.L[i] + shift(x, i, +1) * shift(lev.L[i], i, +1)
    out = jnp.zeros_like(x)
    return out.at[interior(len(S))].set(s[interior(len(S))])


def residual(lev: PoissonLevel, x: jax.Array, z: jax.Array) -> jax.Array:
    """r = z - Ax, zeroed inside bodies and mean-corrected for solvability
    (reference ``residual!``, src/Poisson.jl:91-97)."""
    D = len(x.shape)
    ax = mult(lev, x)
    r_int = jnp.where(interior_view(lev.iD, D) == 0, 0.0,
                      interior_view(z, D) - interior_view(ax, D))
    r = jnp.zeros_like(x).at[interior(D)].set(r_int)
    s = jnp.sum(r) / inside_count(x.shape)
    eps = jnp.finfo(x.dtype).eps
    corr = jnp.where(jnp.abs(s) <= 2 * eps, 0.0, s).astype(x.dtype)
    return r.at[interior(D)].add(-corr)


def increment(lev: PoissonLevel, x, r, eps):
    """Fused r -= A eps; x += eps on the interior (src/Poisson.jl:99-103)."""
    D = len(x.shape)
    ae = mult(lev, eps)
    r = r.at[interior(D)].add(-interior_view(ae, D))
    x = x.at[interior(D)].add(interior_view(eps, D))
    return x, r


def jacobi(lev: PoissonLevel, x, r, it: int = 1):
    """Jacobi smoother (src/Poisson.jl:110-113); used as the MG pre-smoother."""
    D = len(x.shape)
    for _ in range(it):
        eps = jnp.zeros_like(x).at[interior(D)].set(
            interior_view(r, D) * interior_view(lev.iD, D))
        x, r = increment(lev, x, r, eps)
    return x, r


def pcg(lev: PoissonLevel, x, r, it: int = 6):
    """Jacobi-preconditioned conjugate gradient smoother.

    Faithful port of src/Poisson.jl:123-143 with the early exits
    (|rho|<10eps before start, alpha outside [1e-2,1e2], |rho2|<10eps)
    expressed as a monotone ``dead`` mask so the trip count is static.
    """
    D = len(x.shape)
    dt = x.dtype
    teneps = 10 * jnp.finfo(dt).eps
    ii = interior(D)

    z = jnp.zeros_like(x).at[ii].set(interior_view(r, D) * interior_view(lev.iD, D))
    eps = z
    rho = jnp.vdot(r, z)
    dead = jnp.abs(rho) < teneps

    for i in range(it):
        eps = bc_scalar_periodic(eps, lev.perdir)
        z = mult(lev, eps)
        denom = jnp.vdot(z, eps)
        alpha = jnp.where(dead | (denom == 0), 0.0, rho / jnp.where(denom == 0, 1.0, denom)).astype(dt)
        dead = dead | (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)
        upd = jnp.where(dead, 0.0, alpha).astype(dt)
        x = x.at[ii].add(upd * interior_view(eps, D))
        r = r.at[ii].add(-upd * interior_view(z, D))
        if i == it - 1:
            break
        z2 = jnp.zeros_like(x).at[ii].set(interior_view(r, D) * interior_view(lev.iD, D))
        rho2 = jnp.vdot(r, z2)
        dead = dead | (jnp.abs(rho2) < teneps)
        beta = jnp.where(dead, 0.0, rho2 / jnp.where(rho == 0, 1.0, rho)).astype(dt)
        eps_new = jnp.zeros_like(x).at[ii].set(
            beta * interior_view(eps, D) + interior_view(z2, D))
        eps = jnp.where(dead, eps, eps_new)
        z = jnp.where(dead, z, z2)
        rho = jnp.where(dead, rho, rho2)
    return x, r


def poisson_solve(lev: PoissonLevel, x, z, tol=1e-4, itmx=1000, smoother=pcg):
    """Single-level iterative solve (reference ``solver!``, src/Poisson.jl:162-172).

    Runs at least one smoothing pass (the reference's loop tests the
    tolerance only *after* smoothing), with an on-device `while_loop`.
    Returns ``(x, r, n_iters)``.
    """
    r = residual(lev, x, z)

    def cond(c):
        x, r, n, r2 = c
        return (n == 0) | ((r2 >= tol) & (n < itmx))

    def body(c):
        x, r, n, _ = c
        x, r = smoother(lev, x, r)
        return (x, r, n + 1, jnp.vdot(r, r))

    x, r, n, r2 = jax.lax.while_loop(cond, body, (x, r, jnp.int32(0), jnp.vdot(r, r)))
    x = bc_scalar_periodic(x, lev.perdir)
    return x, r, n
