"""Blocked Pallas stencil kernels for large 3D grids.

XLA's lowering of the slice-form stencils materialises the shifted operand
streams: its own cost model reports ~31 field-passes for the 7-point
variable-coefficient `mult` (minimum: 6) at 256³.  The device executes that
bloated program at near-peak HBM bandwidth, so the remaining speedup is to
*generate less traffic*: these kernels stream (slab + halo-row) windows
through VMEM and compute every stencil tap from registers.

Blocking scheme (3D only — 2D grids fit the whole-array VMEM PCG kernel):
- the grid runs over slabs of ``B`` rows of spatial axis 0; axes 1/2 stay
  whole in VMEM.  Axis-0 halo rows arrive as separate one-row BlockSpec
  inputs whose index maps point at the neighbouring rows (clamped at the
  domain edges — the resulting garbage only ever lands in global ghost
  outputs, which the interior mask zeroes).  Mosaic restricts unaligned
  sublane/lane slicing, so axis-1/2 stencil taps are sublane/lane rolls,
  again ghost-safe.
- standard BlockSpec pipelining gives automatic DMA double-buffering and
  handles the ragged last slab.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

__all__ = ["mult3d_pallas", "increment3d_pallas", "use_blocked", "BLOCK"]

BLOCK = 2  # slab rows; ~2x the block working set must fit 16MB VMEM at 256^3


def _sub_roll(a, off):
    """a[.., j+off, ..] on the sublane axis; wraps land in global ghosts."""
    return jnp.roll(a, -off, axis=-2)


def _lane_roll(a, off):
    return jnp.roll(a, -off, axis=-1)


def _ghost_mask(S, B, dtype):
    s0 = pl.program_id(0) * B
    g0 = s0 + jax.lax.broadcasted_iota(jnp.int32, (B, S[1], S[2]), 0)
    g1 = jax.lax.broadcasted_iota(jnp.int32, (B, S[1], S[2]), 1)
    g2 = jax.lax.broadcasted_iota(jnp.int32, (B, S[1], S[2]), 2)
    m = ((g0 >= 1) & (g0 <= S[0] - 2) & (g1 >= 1) & (g1 <= S[1] - 2)
         & (g2 >= 1) & (g2 <= S[2] - 2))
    return m.astype(dtype)


def _mult_block(L, L0d, D, xc, xu, xd, mask, B):
    """A·x on a (B,S1,S2) slab from center + halo-row blocks."""
    xm = jnp.concatenate([xu, xc[:B - 1]], axis=0)   # x[I-δ0]
    xp = jnp.concatenate([xc[1:], xd], axis=0)       # x[I+δ0]
    L0 = L[0]
    L0p = jnp.concatenate([L0[1:], L0d], axis=0)     # L0[I+δ0]
    s = xc * D
    s = s + xm * L0 + xp * L0p
    L1 = L[1]
    s = s + _sub_roll(xc, -1) * L1 + _sub_roll(xc, +1) * _sub_roll(L1, +1)
    L2 = L[2]
    s = s + _lane_roll(xc, -1) * L2 + _lane_roll(xc, +1) * _lane_roll(L2, +1)
    return s * mask


def _specs(S, B):
    """Input BlockSpecs shared by the kernels: L, L0-down-row, D, x-center,
    x-up-row, x-down-row.  Halo-row indices are clamped at the domain edges;
    the resulting duplicate rows only feed global ghost outputs (masked).
    """
    up = lambda i: (jnp.maximum(i * B - 1, 0), 0, 0)
    dn = lambda i: (jnp.minimum(i * B + B, S[0] - 1), 0, 0)
    row = lambda f: pl.BlockSpec((1, S[1], S[2]), f)
    return [
        pl.BlockSpec((3, B, S[1], S[2]), lambda i: (0, i, 0, 0)),
        pl.BlockSpec((1, 1, S[1], S[2]),
                     lambda i: (0, jnp.minimum(i * B + B, S[0] - 1), 0, 0)),
        pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0)),
        pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0)),
        row(up),
        row(dn),
    ]


def _mult_kernel(S, B, dtype, L_ref, L0d_ref, D_ref, xc_ref, xu_ref, xd_ref,
                 z_ref):
    mask = _ghost_mask(S, B, dtype)
    z_ref[...] = _mult_block(L_ref[...], L0d_ref[0], D_ref[...], xc_ref[...],
                             xu_ref[...], xd_ref[...], mask, B)


def mult3d_pallas(L, Dd, x, S, interpret=False, block=BLOCK):
    """z = A x via the blocked streaming kernel (periodic ghosts of ``x``
    must already be filled by the caller)."""
    dtype = x.dtype
    B = block
    G = pl.cdiv(S[0], B)
    return pl.pallas_call(
        partial(_mult_kernel, S, B, dtype),
        grid=(G,),
        in_specs=_specs(S, B),
        out_specs=pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(S, dtype),
        interpret=interpret,
    )(L, L, Dd, x, x, x)


def _rsub_kernel(S, B, dtype, L_ref, L0d_ref, D_ref, ec_ref, eu_ref,
                 ed_ref, r_ref, ro_ref):
    """r -= A·eps — the stencil half of `increment` (src/Poisson.jl:99-103)."""
    mask = _ghost_mask(S, B, dtype)
    ae = _mult_block(L_ref[...], L0d_ref[0], D_ref[...], ec_ref[...],
                     eu_ref[...], ed_ref[...], mask, B)
    ro_ref[...] = r_ref[...] - ae


def increment3d_pallas(L, Dd, eps, x, r, S, interpret=False, block=BLOCK):
    """(x+eps, r-A·eps): the stencil update runs blocked in Pallas, the
    cheap axpy stays in XLA (keeps the kernel under the VMEM budget)."""
    dtype = x.dtype
    B = block
    G = pl.cdiv(S[0], B)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    ro = pl.pallas_call(
        partial(_rsub_kernel, S, B, dtype),
        grid=(G,),
        in_specs=_specs(S, B) + [slab],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct(S, dtype),
        input_output_aliases={6: 0},
        interpret=interpret,
    )(L, L, Dd, eps, eps, eps, r)
    return x + eps, ro


def use_blocked(S, dtype) -> bool:
    """Dispatch gate: big 3D f32 grids on TPU (single-device layouts)."""
    return (HAS_PALLAS and len(S) == 3 and dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and math.prod(S) >= 2_000_000 and S[0] >= 2 * BLOCK)
