"""Matrix-free variable-coefficient Poisson operator and smoothers.

TPU-native re-design of the reference solver (src/Poisson.jl).  The linear
system is ``Ax = [L+D+L']x = z`` where ``L`` holds the face coefficients
(these *are* the BDIM zeroth moments — src/WaterLily.jl:77) and the diagonal
is derived: ``D[I] = -Σᵢ(L[I,i]+L[I+δᵢ,i])``.

Design notes, driven by XLA semantics:
- The reference's PCG exits early on degenerate ``rho``/``alpha``
  (src/Poisson.jl:127,132,137).  Data-dependent returns don't exist under
  `jit`, so the smoother carries a boolean ``dead`` flag and masks all state
  updates once tripped — same control flow, fixed trip count.
- Ghost-zeroing uses fused ``where(interior_mask, ., 0)`` forms, never
  slice assignments; every smoother iteration compiles to a handful of
  fused VMEM passes.  Residual/solution invariants: ``r``, ``z`` and all
  ``mult`` outputs are identically zero in ghost cells, so full-array
  `vdot`s equal the reference's interior dot products.
- All dot products stay on device; nothing syncs to the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..grid import (shift, interior_view, interior_mask, mask_interior,
                    inside_count)
from .bc import bc_scalar_periodic


def _off(D, i, v):
    return tuple(v if d == i else 0 for d in range(D))

__all__ = ["PoissonLevel", "make_level", "mult", "residual", "jacobi", "pcg",
           "smooth", "increment", "poisson_solve"]


@struct.dataclass
class PoissonLevel:
    """One multigrid level: face coefficients + derived (inverse) diagonal.

    ``blocked`` (static) selects the big-3D blocked Pallas stencil path;
    ``sharded`` (static) marks spatially-decomposed layouts, disabling ALL
    Pallas dispatch (GSPMD cannot partition Mosaic custom calls); ``perdir``
    is static pytree metadata (it selects program structure)."""
    L: jax.Array      # (D, *S) lower-diagonal face coefficients
    D: jax.Array      # (*S) diagonal, zero in ghosts
    iD: jax.Array     # (*S) guarded inverse diagonal (0 inside bodies)
    blocked: bool = struct.field(pytree_node=False, default=False)
    perdir: tuple = struct.field(pytree_node=False, default=())
    sharded: bool = struct.field(pytree_node=False, default=False)


def _diag(L: jax.Array) -> jax.Array:
    """D[I] = -Σᵢ (L[I,i] + L[I+δᵢ,i]) on the interior (src/Poisson.jl:48-54).

    Ghost-padded grids make every stencil neighbour of an interior cell a
    valid array position, so all reads are pure slices — XLA fuses the whole
    expression into one pass (rolls would materialise shifted copies)."""
    D = L.shape[0]
    s = None
    for i in range(D):
        t = interior_view(L[i], D) + interior_view(L[i], D, _off(D, i, +1))
        s = t if s is None else s + t
    return jnp.pad(-s, 1)


def make_level(L: jax.Array, perdir: tuple = (),
               sharded: bool = False) -> PoissonLevel:
    """Build a level from face coefficients (reference ``set_diag!``)."""
    from .pallas_stencil import use_blocked
    Dd = _diag(L)
    eps = jnp.finfo(L.dtype).eps
    guard = Dd * Dd < 2 * eps
    iD = jnp.where(guard, 0.0, 1.0 / jnp.where(guard, 1.0, Dd)).astype(L.dtype)
    return PoissonLevel(L=L, D=Dd, iD=iD,
                        blocked=use_blocked(L.shape[1:], L.dtype, sharded),
                        perdir=perdir, sharded=sharded)


def _mult_interior(lev: PoissonLevel, x: jax.Array) -> jax.Array:
    """Interior of A·x, all-slice form (caller handles periodic ghosts)."""
    D = lev.L.shape[0]
    s = interior_view(x, D) * interior_view(lev.D, D)
    for i in range(D):
        lo, hi = _off(D, i, -1), _off(D, i, +1)
        s = (s + interior_view(x, D, lo) * interior_view(lev.L[i], D)
             + interior_view(x, D, hi) * interior_view(lev.L[i], D, hi))
    return s


def mult(lev: PoissonLevel, x: jax.Array) -> jax.Array:
    """z = A x with zero ghosts (reference ``mult!``, src/Poisson.jl:62-75)."""
    x = bc_scalar_periodic(x, lev.perdir)
    if lev.blocked:
        from .pallas_stencil import mult3d_pallas
        return mult3d_pallas(lev.L, lev.D, x, x.shape)
    return jnp.pad(_mult_interior(lev, x), 1)


def residual(lev: PoissonLevel, x: jax.Array, z: jax.Array) -> jax.Array:
    """r = z - Ax, zeroed inside bodies and mean-corrected for solvability
    (reference ``residual!``, src/Poisson.jl:91-97)."""
    D = len(x.shape)
    xb = bc_scalar_periodic(x, lev.perdir)
    if lev.blocked:
        from .pallas_stencil import mult3d_pallas
        ax = interior_view(mult3d_pallas(lev.L, lev.D, xb, x.shape), D)
    else:
        ax = _mult_interior(lev, xb)
    r_int = jnp.where(interior_view(lev.iD, D) == 0, 0.0,
                      interior_view(z, D) - ax)
    s = jnp.sum(r_int) / inside_count(x.shape)
    eps = jnp.finfo(x.dtype).eps
    corr = jnp.where(jnp.abs(s) <= 2 * eps, 0.0, s).astype(x.dtype)
    return jnp.pad(r_int - corr, 1)


def increment(lev: PoissonLevel, x, r, eps):
    """Fused r -= A eps; x += eps on the interior (src/Poisson.jl:99-103).

    ``eps`` must be zero in (non-periodic) ghosts; ``mult`` output is
    ghost-zero so ``r`` stays ghost-zero.  Periodic-ghost pollution of ``x``
    is benign: every read of ``x`` ghosts goes through ``perBC`` first.
    """
    if lev.blocked:
        from .pallas_stencil import increment3d_pallas
        eps = bc_scalar_periodic(eps, lev.perdir)
        return increment3d_pallas(lev.L, lev.D, eps, x, r, x.shape)
    ae = mult(lev, eps)
    return x + eps, r - ae


def jacobi(lev: PoissonLevel, x, r, it: int = 1):
    """Jacobi smoother (src/Poisson.jl:110-113); the MG pre-smoother.

    ``iD`` is ghost-zero, so ``eps = r*iD`` needs no explicit masking."""
    for _ in range(it):
        x, r = increment(lev, x, r, r * lev.iD)
    return x, r


def pcg(lev: PoissonLevel, x, r, it: int = 6):
    """Jacobi-preconditioned conjugate gradient smoother.

    Faithful port of src/Poisson.jl:123-143 with the early exits
    (|rho|<10eps before start, alpha outside [1e-2,1e2], |rho2|<10eps)
    expressed as a monotone ``dead`` mask so the trip count is static.
    """
    dt = x.dtype
    teneps = 10 * jnp.finfo(dt).eps

    z = r * lev.iD
    eps = z
    rho = jnp.vdot(r, z)
    dead = jnp.abs(rho) < teneps

    for i in range(it):
        eps = bc_scalar_periodic(eps, lev.perdir)
        z = mult(lev, eps)
        denom = jnp.vdot(z, eps)
        alpha = jnp.where(dead | (denom == 0), 0.0,
                          rho / jnp.where(denom == 0, 1.0, denom)).astype(dt)
        dead = dead | (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)
        upd = jnp.where(dead, 0.0, alpha).astype(dt)
        x = x + upd * eps
        r = r - upd * z
        if i == it - 1:
            break
        z2 = r * lev.iD
        rho2 = jnp.vdot(r, z2)
        dead = dead | (jnp.abs(rho2) < teneps)
        beta = jnp.where(dead, 0.0, rho2 / jnp.where(rho == 0, 1.0, rho)).astype(dt)
        eps_new = mask_interior(beta * eps + z2)
        eps = jnp.where(dead, eps, eps_new)
        z = jnp.where(dead, z, z2)
        rho = jnp.where(dead, rho, rho2)
    return x, r


def smooth(lev: PoissonLevel, x, r, it: int = 6):
    """Default smoother (reference ``smooth! = pcg!``): the fused Pallas PCG
    on TPU when the level fits VMEM, the XLA path otherwise."""
    from .pallas_kernels import pcg_auto
    return pcg_auto(lev, x, r, it, xla_pcg=pcg)


def poisson_solve(lev: PoissonLevel, x, z, tol=1e-4, itmx=1000, smoother=smooth):
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
