"""Convection-diffusion fluxes in gather form.

TPU-native re-design of the reference's `conv_diff!` (src/Flow.jl:36-60).
The reference computes a face flux `Φ` and *scatters* `r[I]+=Φ; r[I-δ]-=Φ`.
Scatters don't vectorize on TPU, so here every (i,j) sweep builds the whole
face-flux array with boundary variants selected by index masks, and the
momentum tendency is the gathered flux difference ``r = Φ - Φ(+δj)``.
XLA fuses each sweep into a single VMEM-resident elementwise pass.

Flux-face layout along sweep axis j (0-based, ghost-padded size S):
face k carries the flux through the lower face of cell k, defined for
k = 1..S-1.  Cell tendencies live on k = 1..S-2:  ``r[k] = F[k] - F[k+1]``.

Boundary variants (reference src/Flow.jl:6-9,54-60):
- interior face: QUICK upwind with median limiter;
- lower wall face (k=1): central difference for incoming (w>0) flux (ϕuL);
- upper wall face (k=S-1): central difference for incoming (w<0) flux (ϕuR);
- periodic: face k=1 wraps its far-upwind point to plane S-3 (ϕuP) and the
  top face flux is a copy of face 1's flux.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid import shift, axis_coord, plane

__all__ = ["quick", "vanleer", "median3", "conv_diff", "accelerate"]


def median3(a, b, c):
    """Median of three arrays, elementwise (reference `median`, src/Flow.jl:25)."""
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def quick(u, c, d):
    """QUICK upwind interpolation with median limiter (src/Flow.jl:4).

    ``u`` = far upwind, ``c`` = upwind, ``d`` = downwind value.
    """
    return median3((5.0 * c + 2.0 * d - u) / 6.0, c, median3(10.0 * c - 9.0 * u, c, d))


def vanleer(u, c, d):
    """van Leer flux limiter (src/Flow.jl:5), division-guarded for AD."""
    denom = jnp.where(d == u, 1.0, d - u)
    lim = c + (d - c) * (c - u) / denom
    keep = (c <= jnp.minimum(u, d)) | (c >= jnp.maximum(u, d))
    return jnp.where(keep, c, lim)


def _face_flux_all(u, j, nu, periodic, limiter):
    """Fluxes of ALL momentum components through the faces normal to ``j``.

    One vectorized sweep over the stacked component axis: the four stencil
    shifts are rolls of the full ``(D,*S)`` array (one kernel each instead
    of D), and only the advecting velocity needs per-component shifts.
    Positions outside face range 1..S-1 along axis j (and wrapped transverse
    planes) hold garbage masked by the caller's write-support mask.
    """
    D = u.shape[0]
    S = u.shape[1:]
    aj = j + 1  # array axis of spatial dim j in (D,*S)
    f = u
    fm1 = shift(f, aj, -1)
    fm2 = shift(f, aj, -2)
    fp1 = shift(f, aj, +1)
    # advecting velocity: component j averaged onto the (i,j) face (ϕ, Flow.jl:3)
    w = jnp.stack([0.5 * (u[j] + shift(u[j], i, -1)) for i in range(D)], axis=0)

    k = axis_coord(S, j)  # broadcasts over the component axis
    cd = 0.5 * (f + fm1)
    if periodic:
        # ϕuP: far-upwind point of face 1 wraps to interior plane S-3
        # (expressed as a roll so the op stays scatter-free under SPMD)
        fm2 = jnp.where(k == 1, shift(f, aj, S[j] - 4), fm2)
        pos = limiter(fm2, fm1, f)
        neg = limiter(fp1, f, fm1)
    else:
        pos = jnp.where(k == 1, cd, limiter(fm2, fm1, f))   # ϕuL at the low wall
        neg = jnp.where(k == S[j] - 1, cd, limiter(fp1, f, fm1))  # ϕuR at the high wall
    flux = jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)
    if periodic:
        # upperBoundary! Val{true}: top face flux copies face 1 (Flow.jl:60)
        flux = jnp.where(k == S[j] - 1, shift(flux, aj, -(S[j] - 2)), flux)
    return flux


def _support_mask(S, j):
    """Cells written by the reference's sweep along ``j`` (any component).

    Along j: 1..S-2.  Along every other axis: 1..S-1 — the reference's
    slices use ``low=2`` (1-based) and run to the top ghost
    (src/util.jl:180, src/Flow.jl:45-47,54-60).
    """
    m = None
    for d in range(len(S)):
        k = axis_coord(S, d)
        md = (k >= 1) & (k <= S[d] - 2) if d == j else (k >= 1)
        m = md if m is None else (m & md)
    return m


def conv_diff(u: jax.Array, nu, perdir: tuple = (), limiter=quick) -> jax.Array:
    """Momentum tendency r = -div(convective flux) + nu*laplacian, gather form.

    Faithful to reference `conv_diff!` (src/Flow.jl:36-51) including which
    ghost cells are (not) written: the returned array is zero wherever the
    reference never writes, so the BDIM first-moment stencil sees identical
    neighbour values.
    """
    D = u.shape[0]
    S = u.shape[1:]
    r = jnp.zeros_like(u)
    for j in range(D):
        periodic = j in perdir
        flux = _face_flux_all(u, j, nu, periodic, limiter)
        div_j = flux - shift(flux, j + 1, +1)
        r = r + jnp.where(_support_mask(S, j), div_j, 0.0)
    return r


def accelerate(r: jax.Array, t, g, U, dtype) -> jax.Array:
    """Add uniform body-force + frame acceleration to every cell.

    Mirrors reference `accelerate!` (src/Flow.jl:68-73): ``g(i,t)`` plus
    ``dU_i/dt`` when the domain BC ``U`` is a time function (the reference
    uses ForwardDiff.derivative; here `jax.grad` of the scalar map).
    """
    D = r.shape[0]
    terms = []
    if g is None and not callable(U):
        return r
    for i in range(D):
        a = jnp.zeros((), dtype)
        if g is not None:
            a = a + g(i, t)
        if callable(U):
            a = a + jax.grad(lambda tau: jnp.asarray(U(i, tau), dtype))(jnp.asarray(t, dtype))
        terms.append(a)
    return r + jnp.stack(terms).reshape((D,) + (1,) * (r.ndim - 1)).astype(r.dtype)
