"""Pallas TPU kernels for the hot solver loops.

The multigrid smoother tail is dispatch-bound: a 6-iteration PCG per level
is ~30 small XLA fusions, and a V-cycle touches every level, so the solve
costs hundreds of kernel launches on arrays that easily fit in VMEM.  The
kernel below runs an ENTIRE PCG smooth — stencil applications, dot
products, axpys and the reference's early-exit logic — as ONE Pallas
program with all state resident in VMEM.  One launch replaces ~30.

Math is bit-faithful to `ops.poisson.pcg` (itself a port of reference
src/Poisson.jl:123-143): Jacobi-preconditioned CG with a monotone ``dead``
mask implementing the early exits.

Used automatically on TPU for levels whose working set fits VMEM
(`pcg_auto`); the XLA path remains for huge fine grids, CPU tests, and
sharded levels.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..grid import axis_coord

try:  # pallas imports fail gracefully on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

__all__ = ["pcg_pallas", "pcg_auto", "vmem_bytes_for_pcg", "HAS_PALLAS"]


def _interior_mask_arr(S, dtype):
    m = None
    for d in range(len(S)):
        k = axis_coord(S, d)
        md = (k >= 1) & (k <= S[d] - 2)
        m = md if m is None else m & md
    return m.astype(dtype)


def _roll(a, off, axis):
    # g[I] = a[I + off e_axis]; wrapped lanes are masked by the interior mask
    return jnp.roll(a, -off, axis=axis)


def _per_fill(a, j, S):
    k = axis_coord(S, j)
    a = jnp.where(k == 0, _roll(a, S[j] - 2, j), a)
    return jnp.where(k == S[j] - 1, _roll(a, -(S[j] - 2), j), a)


def _make_kernel(D, S, it, perdir, dtype):
    teneps = 10 * jnp.finfo(dtype).eps

    def mult(L_refs, Dd, iD, x, imask):
        for j in perdir:
            x = _per_fill(x, j, S)
        s = x * Dd
        for i in range(D):
            Li = L_refs[i]
            s = s + _roll(x, -1, i) * Li + _roll(x, +1, i) * _roll(Li, +1, i)
        return s * imask

    def kernel(*refs):
        # refs: L0..L(D-1), Dd, iD, x, r  ->  x_out, r_out
        L = [refs[i][...] for i in range(D)]
        Dd = refs[D][...]
        iD = refs[D + 1][...]
        x = refs[D + 2][...]
        r = refs[D + 3][...]
        x_out, r_out = refs[D + 4], refs[D + 5]
        imask = _interior_mask_arr(S, dtype)

        z = r * iD
        eps = z
        rho = jnp.sum(r * z)
        dead = jnp.abs(rho) < teneps

        for i in range(it):
            for j in perdir:
                eps = _per_fill(eps, j, S)
            z = mult(L, Dd, iD, eps, imask)
            denom = jnp.sum(z * eps)
            alpha = jnp.where(dead | (denom == 0), 0.0,
                              rho / jnp.where(denom == 0, 1.0, denom)).astype(dtype)
            dead = dead | (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)
            upd = jnp.where(dead, 0.0, alpha).astype(dtype)
            x = x + upd * eps
            r = r - upd * z
            if i == it - 1:
                break
            z2 = r * iD
            rho2 = jnp.sum(r * z2)
            dead = dead | (jnp.abs(rho2) < teneps)
            beta = jnp.where(dead, 0.0,
                             rho2 / jnp.where(rho == 0, 1.0, rho)).astype(dtype)
            eps_new = (beta * eps + z2) * imask
            eps = jnp.where(dead, eps, eps_new)
            z = jnp.where(dead, z, z2)
            rho = jnp.where(dead, rho, rho2)
        x_out[...] = x
        r_out[...] = r

    return kernel


def vmem_bytes_for_pcg(D, S, dtype=jnp.float32) -> int:
    """Conservative VMEM working-set estimate for the fused kernel.

    Accounts for TPU tiling (last dim padded to 128 lanes, second-to-last
    to 8 sublanes — a 4x blowup for small 3D levels) and for the roll
    temporaries the kernel body keeps live (~2x the named buffers)."""
    padded = list(S)
    padded[-1] = -(-S[-1] // 128) * 128
    if len(S) >= 2:
        padded[-2] = -(-S[-2] // 8) * 8
    cells = math.prod(padded)
    per = jnp.dtype(dtype).itemsize
    return 2 * (D + 8) * cells * per


def pcg_pallas(lev, x, r, it: int = 6, interpret: bool = False):
    """Whole PCG smooth as one Pallas program (TPU; interpret mode for tests)."""
    D = lev.L.shape[0]
    S = x.shape
    dtype = x.dtype
    kernel = _make_kernel(D, S, it, lev.perdir, dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM) if not interpret else pl.BlockSpec()
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(S, dtype), jax.ShapeDtypeStruct(S, dtype)),
        in_specs=[spec] * (D + 4),
        out_specs=(spec, spec),
        interpret=interpret,
    )(*[lev.L[i] for i in range(D)], lev.D, lev.iD, x, r)
    return out


# Budget for the single-block kernel, in units of the (conservative)
# `vmem_bytes_for_pcg` estimate.  Empirically the estimate overshoots the
# true working set by ~1.7x, so 24 MB here corresponds to ~14 MB real VMEM
# (v5e/v5p have ~16 MiB usable; a 90 MB-estimate kernel fails to compile).
# Measured on the (96,64,64) sphere: fusing the (50,34,34) level's PCG at
# this limit halves the whole step (5.2 -> 2.5 ms).
VMEM_LIMIT = 24 * 1024 * 1024


def pcg_auto(lev, x, r, it: int = 6, xla_pcg=None):
    """Dispatch to the fused Pallas PCG when profitable, else the XLA path.

    Pallas is used when running on TPU, f32, and the level's working set
    fits the VMEM budget.  ``xla_pcg`` is the fallback implementation
    (injected to avoid an import cycle).
    """
    D = lev.L.shape[0]
    use = (HAS_PALLAS
           and not lev.sharded  # GSPMD can't partition a Mosaic custom call
           # the fused kernel applies the f32 operator; a level carrying
           # bf16 shadows (L16) maintains its state with the ROUNDED A16
           # everywhere else, and mixing the two operators in one solve is
           # an inconsistency CG amplifies.  Since MIN_CELLS dropped to
           # 100k the blocked and fused gates CAN overlap on strongly
           # anisotropic levels — the fused whole-solve kernel wins the
           # dispatch there (one launch beats slab streaming when the
           # level fits VMEM); residual/increments elsewhere still use the
           # blocked forms, which is consistent: both apply the bit-exact
           # f32 operator.
           and lev.L16 is None
           and jax.default_backend() == "tpu"
           and x.dtype == jnp.float32
           and len(x.shape) >= 2
           and vmem_bytes_for_pcg(D, x.shape, x.dtype) <= VMEM_LIMIT)
    if use:
        return pcg_pallas(lev, x, r, it)
    return xla_pcg(lev, x, r, it)
