"""Convection-diffusion fluxes in gather form, all-slice stencils.

TPU-native re-design of the reference's `conv_diff!` (src/Flow.jl:36-60).
The reference computes a face flux `Φ` and *scatters* `r[I]+=Φ; r[I-δ]-=Φ`.
Scatters don't vectorize on TPU, so each direction sweep builds the whole
face-flux window with boundary variants selected by index masks, and the
momentum tendency is the gathered flux difference ``r = Φ - Φ(+δj)``.

Memory layout: the QUICK stencil reads up to two cells beyond the ghost
ring, so ``u`` is edge-padded by 2 ONCE per call; after that every shifted
read in all D sweeps is a pure slice of that one buffer, which XLA fuses
into single-pass loop fusions (rolls would materialise a copy per shift —
~10x the HBM traffic at 256³).

Flux-face layout along sweep axis j (0-based, ghost-padded size S):
face k carries the flux through the lower face of cell k, defined for
k = 1..S-1.  Cell tendencies live on k = 1..S-2:  ``r[k] = F[k] - F[k+1]``.
The reference's write support (cells 1..S-2 along j, 1..S-1 transverse —
src/util.jl:180 `low=2`) is realised by zero-padding the gathered window,
so no masks are needed for the scatter support at all.

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

from ..grid import axis_coord

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


def conv_diff(u: jax.Array, nu, perdir: tuple = (), limiter=quick) -> jax.Array:
    """Momentum tendency r = -div(convective flux) + nu*laplacian, gather form.

    Faithful to reference `conv_diff!` (src/Flow.jl:36-51) including which
    ghost cells are (not) written: the returned array is zero wherever the
    reference never writes, so the BDIM first-moment stencil sees identical
    neighbour values.
    """
    D = u.shape[0]
    S = u.shape[1:]
    # single edge-padded buffer: every stencil read below is a slice of this
    up = jnp.pad(u, [(0, 0)] + [(2, 2)] * D, mode="edge")

    def win(c, offs):
        """Component(s) ``c`` of ``u`` on the face window of sweep j,
        offset by ``offs[d]`` cells along axis d.  Pure slice of ``up``."""
        sl = []
        for d in range(D):
            o = offs.get(d, 0)
            if d == offs["j"]:
                sl.append(slice(3 + o, 2 + S[d] + o))
            else:
                sl.append(slice(2 + o, 2 + S[d] + o))
        return up[(c,) + tuple(sl)]

    r = jnp.zeros_like(u)
    for j in range(D):
        periodic = j in perdir
        A = slice(None)  # all components
        f = win(A, {"j": j})
        fm1 = win(A, {"j": j, j: -1})
        fm2 = win(A, {"j": j, j: -2})
        fp1 = win(A, {"j": j, j: +1})
        # advecting velocity: component j averaged onto the (i,j) face
        # (ϕ, Flow.jl:3) — per-component transverse shift
        w = jnp.stack([
            0.5 * (win(j, {"j": j}) + win(j, {"j": j, i: -1}))
            for i in range(D)], axis=0)

        wshape = f.shape[1:]
        k = axis_coord(wshape, j) + 1   # window position l -> face index k=l+1
        cd = 0.5 * (f + fm1)
        if periodic:
            # ϕuP: face 1's far-upwind point wraps to interior plane S-3
            wrap_sl = tuple(slice(S[d] - 3, S[d] - 2) if d == j else slice(None)
                            for d in range(D))
            wrap = u[(A,) + wrap_sl]
            fm2 = jnp.where(k == 1, wrap, fm2)
            pos = limiter(fm2, fm1, f)
            neg = limiter(fp1, f, fm1)
        else:
            pos = jnp.where(k == 1, cd, limiter(fm2, fm1, f))          # ϕuL
            neg = jnp.where(k == S[j] - 1, cd, limiter(fp1, f, fm1))   # ϕuR
        flux = jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)
        if periodic:
            # upperBoundary! Val{true}: top face flux copies face 1 (Flow.jl:60)
            first = jax.lax.slice_in_dim(flux, 0, 1, axis=j + 1)
            flux = jnp.where(k == S[j] - 1, first, flux)

        # gather: r[k] = F[k] - F[k+1] on the reference's write support
        lo = jax.lax.slice_in_dim(flux, 0, S[j] - 2, axis=j + 1)
        hi = jax.lax.slice_in_dim(flux, 1, S[j] - 1, axis=j + 1)
        contrib = lo - hi
        # transverse support is 1..S-1 (top ghost included, bottom excluded)
        sl = tuple(slice(None) if d == j else slice(1, None) for d in range(D))
        contrib = contrib[(A,) + sl]
        pads = [(0, 0)] + [(1, 1) if d == j else (1, 0) for d in range(D)]
        r = r + jnp.pad(contrib, pads)
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
