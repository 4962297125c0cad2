"""Implicit geometry: signed-distance bodies measured with JAX autodiff.

TPU-native re-design of src/Body.jl and src/AutoBody.jl.  The reference
uses ForwardDiff dual numbers for sdf normals, map Jacobians and body
velocity; here `jax.grad` / `jax.jacfwd` / `jax.jvp` do the same and the
whole per-point measurement is vmapped over the grid, so the BDIM
rasterization (`measure_fields`, reference `measure!` Body.jl:31-53) is one
fused elementwise program instead of a branchy per-cell loop.

CSG note: the reference composes sdf/map *functions* with min/max selection
and differentiates the composite (AutoBody.jl:22-34, 75-93).  Gradients of
min/max select the active branch, so measuring each body independently and
where-selecting the winner (done here) is mathematically identical while
staying vectorization-friendly.
"""
from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from .grid import loc_grid, interior, mask_interior
from .ops.bc import bc_vector

__all__ = ["AbstractBody", "AutoBody", "Bodies", "NoBody", "measure", "sdf",
           "measure_fields", "measure_fields_banded", "measure_sdf", "kern",
           "kern0", "kern1", "mu0", "mu1", "curvature", "band_box_shape"]


# --- immersion kernel moments (reference Body.jl:56-61) ---

def kern(d):
    """Cosine immersion kernel ``½+½cos(πd)``."""
    return 0.5 + 0.5 * jnp.cos(jnp.pi * d)


def kern0(d):
    return 0.5 + 0.5 * d + 0.5 * jnp.sin(jnp.pi * d) / jnp.pi


def kern1(d):
    return (0.25 * (1 - d * d)
            - 0.5 * (d * jnp.sin(jnp.pi * d) + (1 + jnp.cos(jnp.pi * d)) / jnp.pi) / jnp.pi)


def mu0(d, eps):
    """Zeroth kernel moment with clamped support."""
    return kern0(jnp.clip(d / eps, -1, 1))


def mu1(d, eps):
    """First kernel moment with clamped support."""
    return eps * kern1(jnp.clip(d / eps, -1, 1))


# --- body types ---

class AbstractBody:
    """Contract (reference Body.jl:2-17): subclasses implement
    ``sdf(x,t)`` and point ``measure(x,t,fastd2)``."""


class NoBody(AbstractBody):
    """Body-free simulation marker (reference Body.jl:75-76)."""


def _as_ops(op):
    if op not in ("+", "-", "∩", "∪", "union", "inter", "diff"):
        raise ValueError(f"unsupported CSG op {op!r}")
    return {"union": "+", "∪": "+", "inter": "∩", "diff": "-"}.get(op, op)


class AutoBody(AbstractBody):
    """Implicit geometry from an sdf and optional coordinate map.

    ``sdf(x, t) -> scalar`` and ``map(x, t) -> vector`` are plain JAX-traceable
    Python closures, written point-wise exactly like the reference's Julia
    closures (AutoBody.jl:13-20).  ``compose=True`` uses
    ``sdf(map(x,t), t)``.
    """

    def __init__(self, sdf: Callable, map: Callable | None = None, compose: bool = True):
        self.raw_sdf = sdf
        self.map = map if map is not None else (lambda x, t: x)
        if compose and map is not None:
            self.sdf = lambda x, t: sdf(self.map(x, t), t)
        else:
            self.sdf = sdf

    # CSG operators build a flat `Bodies` (iterative reduce, no closure nesting)
    def __add__(self, other):
        return _to_bodies(self) + _to_bodies(other)

    def __sub__(self, other):
        if isinstance(other, (AutoBody, Bodies)):
            return _to_bodies(self) - _to_bodies(other)
        return NotImplemented

    def __neg__(self):
        s = self.sdf
        return AutoBody(lambda x, t: -s(x, t), self.map, compose=False)

    def union(self, other):
        return self + other

    def intersect(self, other):
        return Bodies([self, *_to_bodies(other).bodies], ["∩"] + _to_bodies(other).ops)


def _to_bodies(b):
    if isinstance(b, Bodies):
        return b
    return Bodies([b], [])


class Bodies(AbstractBody):
    """Flat list of `AutoBody` plus pairwise CSG ops (reference AutoBody.jl:55-68).

    ``ops[k-1]`` combines ``bodies[k]`` into the running result:
    ``'+'``/``'∪'`` union, ``'-'`` difference, ``'∩'`` intersection.
    """

    def __init__(self, bodies, ops=None):
        if ops is None:
            ops = ["+"] * (len(bodies) - 1)
        elif isinstance(ops, str):
            ops = [ops] * (len(bodies) - 1)
        ops = [_as_ops(o) for o in ops]
        if len(bodies) != len(ops) + 1:
            raise ValueError("len(bodies) != len(ops)+1")
        self.bodies = list(bodies)
        self.ops = ops

    def __add__(self, other):
        o = _to_bodies(other)
        return Bodies(self.bodies + o.bodies, self.ops + ["+"] + o.ops)

    def __sub__(self, other):
        o = _to_bodies(other)
        return Bodies(self.bodies + o.bodies, self.ops + ["-"] + o.ops)

    def sdf(self, x, t):
        return sdf(self, x, t)


def sdf(body, x, t=0.0):
    """Signed distance of ``body`` at ``x`` (reference AutoBody.jl:39,99)."""
    if isinstance(body, Bodies):
        d = body.bodies[0].sdf(x, t)
        for b, op in zip(body.bodies[1:], body.ops):
            db = b.sdf(x, t)
            if op == "+":
                d = jnp.minimum(d, db)
            elif op == "∩":
                d = jnp.maximum(d, db)
            else:  # difference: running ∩ -b
                d = jnp.maximum(d, -db)
        return d
    return body.sdf(x, t)


def _solve_small(J, b):
    """Solve J v = b for D=2/3 in closed form (vmaps to pure VPU math)."""
    D = b.shape[-1]
    if D == 2:
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        det = jnp.where(det == 0, jnp.nan, det)
        v0 = (b[0] * J[1, 1] - b[1] * J[0, 1]) / det
        v1 = (J[0, 0] * b[1] - J[1, 0] * b[0]) / det
        return jnp.stack([v0, v1])
    if D == 3:
        c0 = jnp.cross(J[:, 1], J[:, 2])
        det = jnp.dot(J[:, 0], c0)
        det = jnp.where(det == 0, jnp.nan, det)
        v0 = jnp.dot(b, c0) / det
        v1 = jnp.dot(b, jnp.cross(J[:, 2], J[:, 0])) / det
        v2 = jnp.dot(b, jnp.cross(J[:, 0], J[:, 1])) / det
        return jnp.stack([v0, v1, v2])
    return jnp.linalg.solve(J, b)


def _measure_one(sdf_fn, map_fn, x, t, fastd2=None):
    """Point measurement (reference `measure`, AutoBody.jl:115-131).

    Returns ``(d, n, V)``: pseudo-sdf-corrected distance, unit normal from
    ``∇sdf``, and body velocity ``V = -J⁻¹ ∂map/∂t``.
    """
    x = jnp.asarray(x)
    t = jnp.asarray(t, x.dtype)
    d_raw = sdf_fn(x, t)
    n = jax.grad(lambda y: sdf_fn(y, t))(x)
    isnan = jnp.any(jnp.isnan(n))
    n = jnp.where(jnp.isnan(n), 0.0, n)
    m = jnp.sqrt(jnp.sum(n * n))
    msafe = jnp.where(m == 0, 1.0, m)
    d_c = d_raw / msafe
    n_c = n / msafe
    J = jax.jacfwd(lambda y: map_fn(y, t))(x)
    _, mdot = jax.jvp(lambda tt: map_fn(x, tt), (t,), (jnp.ones((), t.dtype),))
    V = -_solve_small(J, jnp.asarray(mdot, x.dtype))
    V = jnp.where(jnp.isnan(V), 0.0, V)
    zero = jnp.zeros_like(x)
    d_out = jnp.where(isnan, d_raw, d_c)
    n_out = jnp.where(isnan, zero, n_c)
    V_out = jnp.where(isnan, zero, V)
    if fastd2 is not None:
        fast = d_raw * d_raw > fastd2
        d_out = jnp.where(fast, d_raw, d_out)
        n_out = jnp.where(fast, zero, n_out)
        V_out = jnp.where(fast, zero, V_out)
    return d_out, n_out, V_out


def measure(body, x, t=0.0, fastd2=None):
    """Geometric measurement ``(d, n, V)`` of any body at point ``x``.

    For `Bodies`, each member is measured and the winner selected following
    the reference's ``reduce_sdf_map`` rules (AutoBody.jl:88-93): union keeps
    the smaller raw distance, difference flips the subtracted body's sign,
    intersection keeps the larger.
    """
    x = jnp.asarray(x)
    if isinstance(body, AutoBody):
        return _measure_one(body.sdf, body.map, x, t, fastd2)
    if isinstance(body, Bodies):
        t_ = jnp.asarray(t, x.dtype)
        raws = [b.sdf(x, t_) for b in body.bodies]
        meas = [_measure_one(b.sdf, b.map, x, t_, fastd2) for b in body.bodies]
        d_sel = raws[0]
        dm, nm, Vm = meas[0]
        for k, op in enumerate(body.ops, start=1):
            rk = raws[k]
            dk, nk, Vk = meas[k]
            if op == "+":
                take = rk < d_sel
                cand = (rk, dk, nk, Vk)
            elif op == "∩":
                take = rk > d_sel
                cand = (rk, dk, nk, Vk)
            else:  # '-'
                take = -rk > d_sel
                cand = (-rk, -dk, -nk, Vk)
            d_sel = jnp.where(take, cand[0], d_sel)
            dm = jnp.where(take, cand[1], dm)
            nm = jnp.where(take, cand[2], nm)
            Vm = jnp.where(take, cand[3], Vm)
        return dm, nm, Vm
    raise TypeError(f"cannot measure {type(body)}")


def measure_sdf(body, S, t=0.0, dtype=jnp.float32):
    """Rasterize the sdf at cell centers (reference ``measure_sdf!``, Body.jl:68).

    Interior cells only; ghosts are zero."""
    D = len(S)
    pts = loc_grid(S, None, dtype)[interior(D)].reshape(-1, D)
    t_ = jnp.asarray(t, dtype)
    vals = jax.vmap(lambda x: sdf(body, x, t_))(pts)
    out = jnp.zeros(S, dtype)
    return out.at[interior(D)].set(vals.reshape(tuple(s - 2 for s in S)).astype(dtype))


def measure_fields(body, S, t=0.0, eps=1.0, perdir=(), exitBC=False,
                   dtype=jnp.float32, fuse_ok=False):
    """BDIM rasterization (reference ``measure!``, Body.jl:31-53).

    Fills ``V`` (body velocity), ``μ₀`` (zeroth moment) and ``μ₁`` (first
    moment × normal) on the whole padded grid, with the near-surface band
    ``d² < (2+eps)²`` measured at each face, deep-interior cells zeroed, and
    the vector BCs applied.  Returns ``(V, mu0, mu1, d_center)``.
    """
    D = len(S)
    if isinstance(body, NoBody) or body is None:
        V = jnp.zeros((D,) + S, dtype)
        m0 = bc_vector(jnp.ones((D,) + S, dtype), (0.0,) * D, False, perdir)
        m1 = jnp.zeros((D, D) + S, dtype)
        return V, m0, m1, jnp.zeros(S, dtype)

    t_ = jnp.asarray(t, dtype)
    fastd2 = (2.0 + eps) ** 2
    centers = loc_grid(S, None, dtype).reshape(-1, D)
    d_center = jax.vmap(lambda x: sdf(body, x, t_))(centers).reshape(S).astype(dtype)
    near = d_center * d_center < fastd2
    inside_deep = d_center < 0

    V_comps, m0_comps, m1_comps = [], [], []
    for i in range(D):
        pts = loc_grid(S, i, dtype).reshape(-1, D)
        di, ni, Vi = jax.vmap(lambda x: measure(body, x, t_, fastd2))(pts)
        di = di.reshape(S).astype(dtype)
        ni = ni.reshape(S + (D,)).astype(dtype)
        Vi = Vi.reshape(S + (D,)).astype(dtype)
        m0_i = jnp.where(near, mu0(di, eps), jnp.where(inside_deep, 0.0, 1.0))
        V_comps.append(jnp.where(near, Vi[..., i], 0.0))
        m0_comps.append(m0_i)
        m1_comps.append(jnp.stack(
            [jnp.where(near, mu1(di, eps) * ni[..., j], 0.0) for j in range(D)], axis=0))
    V = jnp.stack(V_comps, axis=0).astype(dtype)
    m0 = jnp.stack(m0_comps, axis=0).astype(dtype)
    m1 = jnp.stack(m1_comps, axis=0).astype(dtype)
    # the reference rasterizes interior cells only: μ₁ ghosts stay zero, and
    # V's ghosts are zero before BC fill so exitBC's saved exit plane stays 0
    m1 = jnp.zeros_like(m1).at[interior(D, lead=2)].set(m1[interior(D, lead=2)])
    V = mask_interior(V, D)
    m0 = bc_vector(m0, (0.0,) * D, False, perdir, fuse_ok=fuse_ok)
    V = bc_vector(V, (0.0,) * D, exitBC, perdir, fuse_ok=fuse_ok)
    return V, m0, m1, d_center


def _loc_window(W: tuple, start, i: int | None, dtype) -> jax.Array:
    """Physical coordinates of the box-window cells (indices ``start+1+k``).

    Same convention as `loc_grid` (cell center ``I-0.5``, face ``i`` shifted
    ``-0.5``) but generated directly on the static window shape ``W`` from
    the dynamic corner ``start`` — no full-grid coordinate arrays.
    """
    D = len(W)
    coords = []
    for d in range(D):
        c = (jax.lax.broadcasted_iota(jnp.int32, W, d) + start[d] + 1
             ).astype(dtype) - 0.5
        if i == d:
            c = c - 0.5
        coords.append(c)
    return jnp.stack(coords, axis=-1)


def measure_fields_banded(body, S, t, eps, perdir, exitBC, dtype, box_shape,
                          fuse_ok=True):
    """Narrow-band BDIM rasterization (reference ``measure!``, Body.jl:32-44).

    ``fuse_ok`` defaults True (single-device banded sims); sharded layouts
    pass False — they use this path for the MEASUREMENT only (the window
    fields are built replicated and resharded by the step's constraints;
    `Simulation._build_programs`), and the fused Pallas BC sweep cannot be
    GSPMD-partitioned.

    The reference evaluates the expensive autodiff ``measure`` only at cells
    whose center sdf satisfies ``d² < (2+ε)²``; this is the TPU-native
    equivalent: one cheap full-grid sdf pass (no gradients) locates the band,
    then the D face-grid measurements (sdf gradient + map Jacobian + jvp per
    point) run **only on the static-shape body window** and are scattered
    into constant far fields (``μ₀=1, V=0, μ₁=0`` — exact outside the band).
    Bitwise-equal to `measure_fields` whenever the window covers the
    ``d < 2+ε`` region (the `band_box_shape` contract).

    Cuts moving-body remeasure cost from O(grid × (D+1) autodiff measures)
    to O(grid sdf + window × D measures) — ~30× less measurement work for a
    sphere in a 256³ domain.
    """
    D = len(S)
    from .grid import band_box_start
    t_ = jnp.asarray(t, dtype)
    fastd2 = (2.0 + eps) ** 2
    centers = loc_grid(S, None, dtype).reshape(-1, D)
    d_center = jax.vmap(lambda x: sdf(body, x, t_))(centers).reshape(S).astype(dtype)
    start = band_box_start(d_center < (2.0 + eps), box_shape)

    # window views of the cheap center distance (box cells = start+1 …)
    W = tuple(box_shape)
    dw = jax.lax.dynamic_slice(d_center, tuple(start[d] + 1 for d in range(D)), W)
    near = dw * dw < fastd2
    inside_deep = dw < 0

    V_w, m0_w, m1_w = [], [], []
    for i in range(D):
        pts = _loc_window(W, start, i, dtype).reshape(-1, D)
        di, ni, Vi = jax.vmap(lambda x: measure(body, x, t_, fastd2))(pts)
        di = di.reshape(W).astype(dtype)
        ni = ni.reshape(W + (D,)).astype(dtype)
        Vi = Vi.reshape(W + (D,)).astype(dtype)
        m0_w.append(jnp.where(near, mu0(di, eps),
                              jnp.where(inside_deep, 0.0, 1.0)))
        V_w.append(jnp.where(near, Vi[..., i], 0.0))
        m1_w.append(jnp.stack(
            [jnp.where(near, mu1(di, eps) * ni[..., j], 0.0)
             for j in range(D)], axis=0))

    istart = tuple(start[d] + 1 for d in range(D))
    upd = lambda full, w, lead: jax.lax.dynamic_update_slice(
        full, w, (jnp.int32(0),) * lead + istart)
    m0 = upd(jnp.ones((D,) + S, dtype), jnp.stack(m0_w, axis=0), 1)
    V = upd(jnp.zeros((D,) + S, dtype), jnp.stack(V_w, axis=0), 1)
    m1 = upd(jnp.zeros((D, D) + S, dtype), jnp.stack(m1_w, axis=0), 2)
    # window cells are always interior, so μ₁ ghosts are already zero and V
    # ghosts are zero before the BC fill (same contract as the dense path)
    m0 = bc_vector(m0, (0.0,) * D, False, perdir, fuse_ok=fuse_ok)
    V = bc_vector(V, (0.0,) * D, exitBC, perdir, fuse_ok=fuse_ok)
    return V, m0, m1, d_center


def band_box_shape(body, S, t=0.0, eps=1.0, dtype=jnp.float32, margin=3,
                   max_frac=0.5):
    """Static band-box extents for the banded (sparse) immersed-boundary path.

    The BDIM fields deviate from their far-field constants (``μ₁=0, V=0,
    μ₀=1``) only where ``d < 2+eps`` — the kernel band plus the body interior
    (reference Body.jl:32-44 measures exactly this set).  This rasterizes the
    sdf once at ``t`` and returns per-axis extents of that region plus
    ``margin`` cells each side (static box *shape*; the box *position* is
    re-derived on device every remeasure).  Returns ``None`` when there is no
    band or the box would cover more than ``max_frac`` of the grid — banded
    dispatch then stays off.  One host sync, at construction only.
    """
    import numpy as np
    if isinstance(body, NoBody) or body is None:
        return None
    D = len(S)
    t_ = jnp.asarray(t, dtype)

    def _d_center(ts):
        # coordinates built inside the trace: a closed-over concrete array
        # would ride along as a program constant (remote-compile uploads
        # then exceed the tunnel's request limit at ≥320³ grids)
        centers = loc_grid(S, None, dtype).reshape(-1, D)
        return jax.vmap(lambda x: sdf(body, x, ts))(centers).reshape(S)

    d = jax.jit(_d_center)(t_)
    mask = np.asarray(d) < (2.0 + eps)
    if not mask.any():
        return None
    shape = []
    for a in range(D):
        proj = mask.any(axis=tuple(i for i in range(D) if i != a))
        idx = np.nonzero(proj)[0]
        shape.append(min(int(idx[-1] - idx[0] + 1) + 2 * margin, S[a] - 2))
    if math.prod(s + 2 for s in shape) > max_frac * math.prod(S):
        return None
    return tuple(shape)


def curvature(A):
    """Mean and Gaussian curvature from the sdf Hessian (AutoBody.jl:140-146)."""
    H = 0.5 * jnp.trace(A)
    if A.shape == (3, 3):
        K = (A[0, 0] * A[1, 1] + A[0, 0] * A[2, 2] + A[1, 1] * A[2, 2]
             - A[0, 1] ** 2 - A[0, 2] ** 2 - A[1, 2] ** 2)
    else:
        K = jnp.zeros_like(H)
    return H, K
