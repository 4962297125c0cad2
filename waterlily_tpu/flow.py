"""Flow state and the momentum step (predictor/corrector + projection).

TPU-native re-design of src/Flow.jl.  The mutable `Flow` struct becomes an
immutable pytree `FlowState`; `mom_step!` becomes the pure function
`mom_step(cfg, levels, state) -> (state, aux)` which is jitted *whole* —
both pressure solves, the BDIM updates and the CFL reduction compile into a
single XLA program with no host round-trips.

Scratch arrays (`f`, `σ`, `u⁰`) from the reference are not part of the
state: XLA's buffer allocator reuses them across the fused program.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .grid import interior, interior_view, interior_mask, apply_field
from .ops.bc import bc_vector, bc_scalar_periodic, exit_bc
from .ops.convect import conv_diff, accelerate, quick
from .ops.multigrid import ml_solve

__all__ = ["FlowState", "FlowConfig", "bc_tuple", "div", "bdim", "project",
           "cfl", "mom_step", "flow_init"]


class FlowState(NamedTuple):
    """Simulation state pytree (reference `Flow` fields, src/Flow.jl:92-122)."""
    u: jax.Array     # (D, *S) velocity
    p: jax.Array     # (*S)   pressure
    V: jax.Array     # (D, *S) body velocity (BDIM)
    mu0: jax.Array   # (D, *S) zeroth kernel moment (= Poisson face coeffs)
    mu1: jax.Array   # (D, D, *S) first kernel moment × normal
    dt: jax.Array    # scalar: the time step to take next
    t: jax.Array     # scalar: accumulated time (= sum of completed dts)


class FlowConfig(NamedTuple):
    """Static configuration closed over by the jitted step."""
    D: int
    S: tuple                       # ghost-padded spatial shape
    nu: float = 0.0
    U: Any = None                  # tuple of BC velocities or callable (i,t)->u_i
    g: Callable | None = None      # body force g(i,t)
    perdir: tuple = ()
    exitBC: bool = False
    dtype: Any = jnp.float32
    limiter: Callable = quick
    tol: float = 1e-4
    itmx: int = 32
    log: bool = False              # capture per-iteration solver residual traces
    sharded: bool = False          # GSPMD layout: disables all Pallas dispatch


def bc_tuple(U, t, D, dtype):
    """Evaluate the BC velocity at time ``t`` (reference `BCTuple`, Flow.jl:79-80)."""
    if callable(U):
        return tuple(jnp.asarray(U(i, t), dtype) for i in range(D))
    return tuple(jnp.asarray(Ui, dtype) for Ui in U)


def _off(D, i, v):
    return tuple(v if d == i else 0 for d in range(D))


def div(u: jax.Array) -> jax.Array:
    """Cell divergence Σᵢ u[I+δᵢ,i]-u[I,i] on the interior, zero ghosts
    (reference `div`, src/Flow.jl:11-17).  All-slice form: XLA fuses the
    stencil into a single pass (ghost cells supply every neighbour)."""
    D = u.shape[0]
    s = None
    for i in range(D):
        t = interior_view(u[i], D, _off(D, i, +1)) - interior_view(u[i], D)
        s = t if s is None else s + t
    return jnp.pad(s, 1)


def bdim(u, u0, r, V, mu0, mu1, dt):
    """BDIM velocity blend (reference `BDIM!`, src/Flow.jl:131-135).

    ``f = u⁰ + dt·r - V`` on the whole array, then on the interior
    ``u += μ₁·∂f/∂n + V + μ₀∘f`` where the first-moment term is the
    central difference ``½Σⱼ μ₁[i,j](f[+δⱼ]-f[-δⱼ])`` (`μddn`, Flow.jl:18-24).
    """
    D = u.shape[0]
    f = u0 + dt * r - V
    iv = lambda a, off=None: interior_view(a, D, off)
    m = None
    for j in range(D):
        # vectorized over components; slices of f (ghosts are valid reads)
        t = iv(mu1[:, j]) * (iv(f, _off(D, j, +1)) - iv(f, _off(D, j, -1)))
        m = t if m is None else m + t
    upd = 0.5 * m + iv(V) + iv(mu0) * iv(f)
    return u + jnp.pad(upd, [(0, 0)] + [(1, 1)] * D)


def project(levels, u, p, dt_eff, cfg):
    """Pressure projection (reference `project!`, src/Flow.jl:137-145).

    The Poisson solution variable is the dt-scaled pressure (warm-started
    from the previous step); the velocity correction subtracts the
    μ₀-weighted pressure gradient.  Note the Poisson face coefficients are
    exactly ``flow.mu0`` (src/WaterLily.jl:77) — ``levels[0].L is mu0``.
    """
    D = cfg.D
    z = div(u)
    x = p * dt_eff
    out = ml_solve(levels, x, z, tol=cfg.tol, itmx=cfg.itmx, trace=cfg.log)
    x, r, n = out[:3]
    tr = out[3] if cfg.log else None
    L = levels[0].L
    upd = jnp.stack([
        interior_view(L[i], D)
        * (interior_view(x, D) - interior_view(x, D, _off(D, i, -1)))
        for i in range(D)], axis=0)
    u = u - jnp.pad(upd, [(0, 0)] + [(1, 1)] * D)
    p = x / dt_eff
    return u, p, (n, tr)


def cfl(u, nu, dt_max=10.0):
    """Adaptive time step (reference `CFL`/`flux_out`, src/Flow.jl:172-182)."""
    D = u.shape[0]
    s = None
    for i in range(D):
        t = (jnp.maximum(0.0, interior_view(u[i], D, _off(D, i, +1)))
             + jnp.maximum(0.0, -interior_view(u[i], D)))
        s = t if s is None else s + t
    mx = jnp.max(s)
    return jnp.minimum(jnp.asarray(dt_max, u.dtype), 1.0 / (mx + 5 * nu))


def mom_step(cfg: FlowConfig, levels, state: FlowState):
    """One predictor/corrector time step (reference `mom_step!`, Flow.jl:153-169).

    Returns the advanced state and an aux dict with the pressure-solver
    iteration counts ``(predictor, corrector)`` for observability.
    """
    D, dtype = cfg.D, cfg.dtype
    u0, p, dt, t = state.u, state.p, state.dt, state.t
    U = bc_tuple(cfg.U, t + dt, D, dtype)

    imask = interior_mask(cfg.S)

    # predictor u -> u'
    u = jnp.where(imask, 0.0, u0)                    # scale_u!(a, 0)
    r = conv_diff(u0, cfg.nu, cfg.perdir, cfg.limiter, cfg.sharded)
    r = accelerate(r, t, cfg.g, cfg.U, dtype)
    u = bdim(u, u0, r, state.V, state.mu0, state.mu1, dt)
    u = bc_vector(u, U, cfg.exitBC, cfg.perdir)
    if cfg.exitBC:
        u = exit_bc(u, u0, U, dt)
    u, p, (n1, tr1) = project(levels, u, p, dt, cfg)
    u = bc_vector(u, U, cfg.exitBC, cfg.perdir)

    # corrector u -> u¹
    r = conv_diff(u, cfg.nu, cfg.perdir, cfg.limiter, cfg.sharded)
    r = accelerate(r, t + dt, cfg.g, cfg.U, dtype)
    u = bdim(u, u0, r, state.V, state.mu0, state.mu1, dt)
    u = jnp.where(imask, 0.5 * u, u)                 # scale_u!(a, 0.5)
    u = bc_vector(u, U, cfg.exitBC, cfg.perdir)
    u, p, (n2, tr2) = project(levels, u, p, 0.5 * dt, cfg)
    u = bc_vector(u, U, cfg.exitBC, cfg.perdir)

    dt_new = cfl(u, cfg.nu)
    new = state._replace(u=u, p=p, dt=dt_new, t=t + dt)
    aux = {"pois_n": jnp.stack([n1, n2])}
    if cfg.log:
        aux["res_trace"] = jnp.stack([tr1, tr2])
    return new, aux


def flow_init(cfg: FlowConfig, ulam=None, dt0=0.25):
    """Initial state (reference `Flow` constructor, src/Flow.jl:110-121)."""
    D, S, dtype = cfg.D, cfg.S, cfg.dtype
    if ulam is None:
        if callable(cfg.U):
            ulam = lambda i, x: jnp.asarray(cfg.U(i, 0.0), dtype)
        else:
            ulam = lambda i, x: jnp.asarray(cfg.U[i], dtype)
    u = apply_field(ulam, (D,) + S, dtype, vector=True)
    U0 = bc_tuple(cfg.U, jnp.zeros((), dtype), D, dtype)
    u = bc_vector(u, U0, cfg.exitBC, cfg.perdir)
    u = exit_bc(u, u, U0, jnp.zeros((), dtype))   # always applied at init (Flow.jl:115)
    p = jnp.zeros(S, dtype)
    V = jnp.zeros((D,) + S, dtype)
    mu0 = bc_vector(jnp.ones((D,) + S, dtype), (0.0,) * D, False, cfg.perdir)
    mu1 = jnp.zeros((D, D) + S, dtype)
    return FlowState(u=u, p=p, V=V, mu0=mu0, mu1=mu1,
                     dt=jnp.asarray(dt0, dtype), t=jnp.zeros((), dtype))
