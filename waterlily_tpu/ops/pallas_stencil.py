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

__all__ = ["mult3d_pallas", "increment3d_pallas", "use_blocked", "BLOCK",
           "block_for",
           "ana_mult3d_pallas", "use_ana"]

BLOCK = 2  # slab rows; ~2x the block working set must fit 16MB VMEM at 256^3

# Minimum interior+ghost cell count for the blocked/fused kernel tier.
# The tier wins at EVERY probed 3D size (same-session A/B ladder,
# scripts/ab_small_blocked.py + the 48³/64³ knee probe, docs/PERF.md):
# 48³ 1.40×, 64³ 1.89×, (96,64,64) 1.49×, donut (128,64,64) 1.82×,
# 256³-class from the round-2/3 ladders — identical pois_n everywhere
# (the kernels are bit-faithful).  The floor guards only the untested
# tiny-grid regime below the smallest verified config (50³ = 125k).
MIN_CELLS = 100_000


def _row_bytes(S, dtype) -> int:
    """Padded bytes of one (1, S1, S2) row block (TPU tiles the last two
    dims to (8,128) for f32)."""
    sub = -(-S[1] // 8) * 8
    lane = -(-S[2] // 128) * 128
    return sub * lane * jnp.dtype(dtype).itemsize


def block_for(S, dtype=jnp.float32) -> int:
    """Slab height for the mult/increment kernels: B=2 while the ~15
    resident rows × double buffering fit the 16 MB scoped-VMEM budget,
    else B=1 (at 322³ rows grow to 504 KB and B=2 overflows by ~4 MB)."""
    return 2 if 34 * _row_bytes(S, dtype) <= 14 * 2 ** 20 else 1


def _sub_roll(a, off):
    """a[.., j+off, ..] on the sublane axis; wraps land in global ghosts."""
    if off == 0:
        return a
    return jnp.roll(a, -off, axis=-2)


def _lane_roll(a, off):
    if off == 0:
        return a
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
    """A·x on a (B,S1,S2) slab from center + halo-row blocks.

    ``x`` blocks may arrive in bf16 (the smoother's reduced-precision
    search direction) and so may the coefficient blocks (the level's
    L16/D16 shadows — the HBM stream is halved); every tap is upcast to
    the f32 compute dtype in registers, so the result is the bf16-rounded
    operator applied in f32 arithmetic."""
    cdt = jnp.float32 if L.dtype == jnp.bfloat16 else L.dtype
    if L.dtype != cdt:
        L = L.astype(cdt)
        L0d = L0d.astype(cdt)
        D = D.astype(cdt)
    if xc.dtype != cdt:
        xc = xc.astype(cdt)
        xu = xu.astype(cdt)
        xd = xd.astype(cdt)
    if B == 1:   # zero-size concat operands are invalid vector types
        xm, xp, L0p = xu, xd, L0d[None] if L0d.ndim == 2 else L0d
        L0 = L[0]
    else:
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


def _mult_kernel(S, B, dtype, with_dot, L_ref, L0d_ref, D_ref, xc_ref,
                 xu_ref, xd_ref, *out_refs):
    mask = _ghost_mask(S, B, dtype)
    xc = xc_ref[...]
    z = _mult_block(L_ref[...], L0d_ref[0], D_ref[...], xc,
                    xu_ref[...], xd_ref[...], mask, B)
    out_refs[0][...] = z
    if with_dot:
        # per-slab partial of ⟨A·x, x⟩ (z is ghost-zero, so this is the
        # interior dot) — saves the two full re-read passes XLA would
        # spend on a separate vdot (the PCG alpha denominator).  where()
        # rather than relying on z's mask factor: a ragged tail slab reads
        # out-of-bounds rows whose garbage (NaN in interpret mode) would
        # survive a multiply-by-zero.
        mask = _ghost_mask(S, B, jnp.bool_)
        out_refs[1][...] = jnp.sum(jnp.where(mask, z * xc, 0.0)).reshape(1, 1, 1)


def mult3d_pallas(L, Dd, x, S, interpret=False, block=None, with_dot=False):
    """z = A x via the blocked streaming kernel (periodic ghosts of ``x``
    must already be filled by the caller).  ``with_dot`` also returns
    ⟨A·x, x⟩ accumulated in-kernel.  ``x`` and/or the coefficients may be
    bf16 (smoother search direction / the level's L16-D16 shadows); ``z``
    and the dot are always f32 (compute upcasts in registers)."""
    dtype = jnp.float32 if L.dtype == jnp.bfloat16 else L.dtype
    B = block_for(S, dtype) if block is None else block
    G = pl.cdiv(S[0], B)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    out_specs = [slab]
    out_shape = [jax.ShapeDtypeStruct(S, dtype)]
    if with_dot:
        out_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((G, 1, 1), dtype))
    out = pl.pallas_call(
        partial(_mult_kernel, S, B, dtype, with_dot),
        grid=(G,),
        in_specs=_specs(S, B),
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        interpret=interpret,
    )(L, L, Dd, x, x, x)
    if with_dot:
        return out[0], jnp.sum(out[1])
    return out


def _rsub_kernel(S, B, dtype, L_ref, L0d_ref, D_ref, ec_ref, eu_ref,
                 ed_ref, r_ref, ro_ref):
    """r -= A·eps — the stencil half of `increment` (src/Poisson.jl:99-103)."""
    mask = _ghost_mask(S, B, dtype)
    ae = _mult_block(L_ref[...], L0d_ref[0], D_ref[...], ec_ref[...],
                     eu_ref[...], ed_ref[...], mask, B)
    ro_ref[...] = r_ref[...] - ae


def increment3d_pallas(L, Dd, eps, x, r, S, interpret=False, block=None):
    """(x+eps, r-A·eps): the stencil update runs blocked in Pallas, the
    cheap axpy stays in XLA (keeps the kernel under the VMEM budget)."""
    dtype = x.dtype
    B = block_for(S, dtype) if block is None else block
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


def use_blocked(S, dtype, sharded: bool = False) -> bool:
    """Dispatch gate: big 3D f32 grids on TPU, single-device layouts ONLY.

    ``sharded`` must be True for any GSPMD/spatially-decomposed program:
    XLA cannot partition a Mosaic custom call, so a `pallas_call` on sharded
    operands would replicate or miscompile.  Threaded from
    ``FlowConfig.sharded`` / ``make_level(sharded=)``.
    """
    return (HAS_PALLAS and not sharded and len(S) == 3
            and dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and math.prod(S) >= MIN_CELLS and S[0] >= 2 * BLOCK)


# --- blocked CFL reduction kernel ------------------------------------------
#
# XLA's CFL max reduction over the tiled (3,258³) stream measures well
# below the streaming kernels' bandwidth in the very same program
# (round-5 device profile, docs/PERF.md); this kernel streams tall slabs
# (no stencil halo state, so B can be 4× the matvecs') and emits one
# partial max per slab — the final max over the tiny (G,1,1) partial
# array stays in XLA.  The ANALOGOUS solver-dot kernels are retired to
# `ops.attic` (standalone Mosaic reduces and the fused axpy+rho sweep
# both measured SLOWER than XLA's fused multiply_reduce — ab_reduce.py).

BLOCK_CFL = 4  # 3 comps × B rows + 1 halo row ≈ 5.3 MB ≤ the VMEM budget


def _cfl_kernel(S, B, u_ref, u0d_ref, out_ref):
    mask = _ghost_mask(S, B, jnp.bool_)
    u0, u1, u2 = u_ref[0], u_ref[1], u_ref[2]
    if B == 1:
        u0p = u0d_ref[0]
    else:
        u0p = jnp.concatenate([u0[1:], u0d_ref[0]], axis=0)
    zero = jnp.zeros((), u0.dtype)
    # identical association to flow.cfl's  s = t0; s += t1; s += t2
    s = jnp.maximum(zero, u0p) + jnp.maximum(zero, -u0)
    s = s + (jnp.maximum(zero, _sub_roll(u1, 1)) + jnp.maximum(zero, -u1))
    s = s + (jnp.maximum(zero, _lane_roll(u2, 1)) + jnp.maximum(zero, -u2))
    out_ref[...] = jnp.max(jnp.where(mask, s, 0.0)).reshape(1, 1, 1)


def cfl3d_pallas(u, S, interpret=False, block=None):
    """max over interior of the CFL flux-out sum (flow.cfl's reduction,
    reference src/Flow.jl:172-182) via per-slab partial maxes.

    The +δ taps are one down halo row (axis 0) and in-slab rolls whose
    wrap rows land outside the interior mask; ``max`` is association-free
    and the per-term algebra matches `flow.cfl`, so the result is
    bitwise-equal to the XLA form (asserted in tests)."""
    B = BLOCK_CFL if block is None else block
    G = pl.cdiv(S[0], B)
    part = pl.pallas_call(
        partial(_cfl_kernel, S, B),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((3, B, S[1], S[2]), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((1, 1, S[1], S[2]),
                         lambda i: (0, jnp.minimum(i * B + B, S[0] - 1),
                                    0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 1, 1), u.dtype),
        interpret=interpret,
    )(u, u)
    return jnp.max(part)



# --- fused boundary-condition kernel (big 3D, single-device) ---------------
#
# bc_vector's 21-update DUS chain leaves ~4 un-elided full-array copies in
# XLA (3.3 ms/call at 258³ = ~18% of the step over 4 call sites), and every
# single-pass XLA reformulation materializes its layout ops (select
# cascades 4.4 ms, concat trees 5.7 ms — PERF.md round-3 decomposition).
# This kernel applies the reference's sequential stage semantics
# (component-major, direction-minor, util.jl:192-210) in registers in ONE
# read+write sweep: the component is a grid axis (so the stacked (3,S)
# array is never sliced or re-stacked), axis-0 ghost sources are the two
# interior boundary rows fetched once per component via constant index
# maps, and axis-1/2 ghosts are in-row sublane/lane plane selects of the
# ALREADY axis-0-updated value — which is exactly the sequential order, so
# the result is bitwise-equal to the DUS chain, ghost corners included.

BLOCK_BC = 4


def _bc_kernel(S, S_glob, B, save_exit, perdir, with_base, a_ref, *refs):
    if with_base:
        base_ref, xc_ref, r1_ref, rS2_ref, out_ref = refs
    else:
        (xc_ref, r1_ref, rS2_ref, out_ref), base_ref = refs, None
    c = pl.program_id(0)
    sh = (1, B, S[1], S[2])

    def gidx(ax, d):
        g = jax.lax.broadcasted_iota(jnp.int32, sh, ax)
        if d == 0:
            g = g + pl.program_id(1) * B
        if with_base:
            g = g + base_ref[0, d]
        return g

    g0 = gidx(1, 0)
    v = xc_ref[...]
    Ac = a_ref[0, c]

    # stage j=0 (rows): sources are the ORIGINAL boundary rows (stage 0
    # runs first in the reference's sequence).  Under shard_map the source
    # row inputs point at LOCAL rows 1 / S-2, which hold the global rows 1
    # / S_glob-2 exactly on the shards that also own the ghost planes
    # (blocks are ≥2 rows); elsewhere their garbage is never selected.
    if 0 in perdir:
        v = jnp.where(g0 == 0, rS2_ref[...], v)
        v = jnp.where(g0 == S_glob[0] - 1, r1_ref[...], v)
    else:
        tang = jnp.where(g0 == 0, r1_ref[...],
                         jnp.where(g0 == S_glob[0] - 1, rS2_ref[...], v))
        hi = (g0 == S_glob[0] - 1) & (c != 0) if save_exit \
            else (g0 == S_glob[0] - 1)
        dirv = jnp.where((g0 <= 1) | hi, Ac, v)
        v = jnp.where(c == 0, dirv, tang)

    # stages j=1,2 (sublanes/lanes): in-row plane selects of the updated v
    # (local planes 1 / S-2 hold global planes 1 / S_glob-2 on the owning
    # shards — same ownership argument as stage 0)
    for j, ax in ((1, 2), (2, 3)):
        k = gidx(ax, j)
        Sj = S[j]
        pl_ = lambda p: jax.lax.slice_in_dim(v, p, p + 1, axis=ax)
        if j in perdir:
            v = jnp.where(k == 0, pl_(Sj - 2), v)
            v = jnp.where(k == S_glob[j] - 1, pl_(1), v)
        else:
            tang = jnp.where(k == 0, pl_(1),
                             jnp.where(k == S_glob[j] - 1, pl_(Sj - 2), v))
            dirv = jnp.where((k <= 1) | (k == S_glob[j] - 1), Ac, v)
            v = jnp.where(c == j, dirv, tang)
    out_ref[...] = v


def bc3d_pallas(u, A, save_exit=False, perdir=(), interpret=False,
                block=None, S_glob=None, base=None):
    """BC-filled copy of the stacked (3, S0, S1, S2) velocity field in one
    fused sweep (bitwise-equal to the DUS chain in `ops.bc.bc_vector`).

    ``S_glob``/``base`` support shard_map-local calls (non-periodic only):
    ``u`` is then a local block whose cell 0 sits at global index ``base``
    per axis (traced, SMEM); boundary selects compare GLOBAL positions
    while ghost sources come from the block's local rows (see the kernel
    docstring for the ownership argument)."""
    S = u.shape[1:]
    dtype = u.dtype
    B = BLOCK_BC if block is None else block
    G = pl.cdiv(S[0], B)
    if S_glob is None:
        S_glob = S
    assert not (perdir and base is not None), (
        "periodic BC kernel is whole-grid only")
    Aarr = jnp.stack([jnp.asarray(a, dtype) for a in A]).reshape(1, 3)
    slab = pl.BlockSpec((1, B, S[1], S[2]), lambda c, g: (c, g, 0, 0))
    row = lambda p: pl.BlockSpec((1, 1, S[1], S[2]),
                                 lambda c, g, p=p: (c, p, 0, 0))
    a_spec = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
        else pl.BlockSpec()
    in_specs = [a_spec]
    args = [Aarr]
    if base is not None:
        in_specs.append(a_spec)
        args.append(jnp.asarray(base, jnp.int32).reshape(1, 3))
    in_specs += [slab, row(1), row(S[0] - 2)]
    args += [u, u, u]
    return pl.pallas_call(
        partial(_bc_kernel, S, S_glob, B, bool(save_exit), tuple(perdir),
                base is not None),
        grid=(3, G),
        in_specs=in_specs,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct(u.shape, dtype),
        interpret=interpret,
    )(*args)


def use_bc3d(S, dtype) -> bool:
    """Dispatch gate for the fused BC kernel: big 3D f32 on a single TPU.
    Mirrors `use_blocked`; sharded layouts keep the GSPMD-safe DUS path
    (the caller checks its own ``sharded`` flag before this gate)."""
    return (HAS_PALLAS and len(S) == 3 and dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and math.prod(S) >= MIN_CELLS and S[0] >= BLOCK_BC)


# --- fused projection tail (big 3D, single-device) -------------------------
#
# The projection's velocity correction (`project!` tail, src/Flow.jl:141-145)
# is three chained XLA ops — interior μ₀-weighted gradient, ghost-pad,
# u-subtract, plus the p=x/dt rescale — measured at ~4.4 ms/call at 258³
# (PERF.md round-3 decomposition) against a ~1.3 ms traffic bound.  This
# kernel emits u_new and p in ONE sweep: the axis-0 backward difference
# reads one clamped halo row (its garbage reaches only ghost-row outputs,
# which pass u through unchanged), axes 1/2 are sublane/lane rolls, and
# dt rides SMEM (it is traced — the CFL feedback loop).

BLOCK_PR = 1  # 24 resident rows at B=1 ~= 9.7 MB VMEM


def _project_kernel(S, S_glob, B, dtype, with_base, dt_ref, *refs):
    if with_base:
        base_ref, x_ref, xu_ref, L_ref, u_ref, uo_ref, p_ref = refs
    else:
        (x_ref, xu_ref, L_ref, u_ref, uo_ref, p_ref), base_ref = refs, None
    sh = (B, S[1], S[2])
    g0 = pl.program_id(0) * B + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    g1 = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    g2 = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    if with_base:
        g0 = g0 + base_ref[0, 0]
        g1 = g1 + base_ref[0, 1]
        g2 = g2 + base_ref[0, 2]
    m = ((g0 >= 1) & (g0 <= S_glob[0] - 2) & (g1 >= 1)
         & (g1 <= S_glob[1] - 2) & (g2 >= 1) & (g2 <= S_glob[2] - 2))
    xc = x_ref[...]
    if B == 1:
        xm0 = xu_ref[...]
    else:
        xm0 = jnp.concatenate([xu_ref[...], xc[:B - 1]], axis=0)
    u = u_ref[...]
    L = L_ref[...]
    upd0 = L[0] * (xc - xm0)
    upd1 = L[1] * (xc - _sub_roll(xc, -1))
    upd2 = L[2] * (xc - _lane_roll(xc, -1))
    upd = jnp.stack([upd0, upd1, upd2], axis=0)
    uo_ref[...] = jnp.where(m[None], u - upd, u).astype(dtype)
    p_ref[...] = (xc / dt_ref[0, 0]).astype(dtype)


def project3d_pallas(L, x, u, dt_eff, interpret=False, block=None,
                     S_glob=None, base=None):
    """(u - pad_interior(L∘∇x), x/dt) in one fused sweep (dense levels).

    ``S_glob``/``base``: shard_map-local calls on halo-extended blocks —
    the interior mask compares GLOBAL positions (cell 0 of the array sits
    at global ``base`` per axis)."""
    S = x.shape
    dtype = x.dtype
    B = BLOCK_PR if block is None else block
    G = pl.cdiv(S[0], B)
    if S_glob is None:
        S_glob = S
    up = lambda g: (jnp.maximum(g * B - 1, 0), 0, 0)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda g: (g, 0, 0))
    slab4 = pl.BlockSpec((3, B, S[1], S[2]), lambda g: (0, g, 0, 0))
    dt_spec = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
        else pl.BlockSpec()
    dt_arr = jnp.asarray(dt_eff, dtype).reshape(1, 1)
    in_specs = [dt_spec]
    args = [dt_arr]
    if base is not None:
        in_specs.append(dt_spec if not interpret else pl.BlockSpec())
        args.append(jnp.asarray(base, jnp.int32).reshape(1, 3))
    in_specs += [slab, pl.BlockSpec((1, S[1], S[2]), up), slab4, slab4]
    args += [x, x, L, u]
    u_new, p = pl.pallas_call(
        partial(_project_kernel, S, S_glob, B, dtype, base is not None),
        grid=(G,),
        in_specs=in_specs,
        out_specs=[slab4, slab],
        out_shape=[jax.ShapeDtypeStruct((3,) + S, dtype),
                   jax.ShapeDtypeStruct(S, dtype)],
        input_output_aliases={(5 if base is not None else 4): 0},
        interpret=interpret,
    )(*args)
    return u_new, p


def use_project3d(S, dtype) -> bool:
    """Gate for the fused projection tail: big 3D f32, single TPU, dense
    level (the banded window branch keeps the XLA path)."""
    return (HAS_PALLAS and len(S) == 3 and dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and math.prod(S) >= MIN_CELLS and S[0] >= BLOCK_PR)


# --- fused divergence + solver warm start (big 3D, single-device) ----------
#
# The projection head computes z = div(u) (XLA materializes the six
# shifted operand streams: ~7 passes against a 4-pass bound) and the
# dt-scaled warm start x = p*dt.  One sweep emits both: u's axis-0
# forward difference reads one clamped down-halo row, axes 1/2 are
# sublane/lane rolls, and p rides along for the rescale.


def _div_kernel(S, S_glob, B, dtype, with_base, dt_ref, *refs):
    if with_base:
        base_ref, u_ref, ud_ref, p_ref, z_ref, x_ref = refs
    else:
        (u_ref, ud_ref, p_ref, z_ref, x_ref), base_ref = refs, None
    sh = (B, S[1], S[2])
    g0 = pl.program_id(0) * B + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    g1 = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    g2 = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    if with_base:
        g0 = g0 + base_ref[0, 0]
        g1 = g1 + base_ref[0, 1]
        g2 = g2 + base_ref[0, 2]
    m = ((g0 >= 1) & (g0 <= S_glob[0] - 2) & (g1 >= 1)
         & (g1 <= S_glob[1] - 2) & (g2 >= 1) & (g2 <= S_glob[2] - 2))
    u = u_ref[...]
    if B == 1:
        u0p = ud_ref[0]
    else:
        u0p = jnp.concatenate([u[0, 1:], ud_ref[0]], axis=0)   # u0[I+δ0]
    # same summation association as flow.div: ((t0 + t1) + t2)
    s = (u0p - u[0]) + (_sub_roll(u[1], +1) - u[1])
    s = s + (_lane_roll(u[2], +1) - u[2])
    z_ref[...] = jnp.where(m, s, 0.0).astype(dtype)
    x_ref[...] = (p_ref[...] * dt_ref[0, 0]).astype(dtype)


def div3d_pallas(u, p, dt_eff, interpret=False, block=None, S_glob=None,
                 base=None):
    """(div(u) interior, p*dt) in one fused sweep.

    ``S_glob``/``base``: shard_map-local calls on halo-extended blocks
    (the interior mask compares GLOBAL positions)."""
    S = u.shape[1:]
    dtype = u.dtype
    B = BLOCK_PR if block is None else block
    G = pl.cdiv(S[0], B)
    if S_glob is None:
        S_glob = S
    dn = lambda g: (0, jnp.minimum(g * B + B, S[0] - 1), 0, 0)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda g: (g, 0, 0))
    slab4 = pl.BlockSpec((3, B, S[1], S[2]), lambda g: (0, g, 0, 0))
    dt_spec = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
        else pl.BlockSpec()
    dt_arr = jnp.asarray(dt_eff, dtype).reshape(1, 1)
    in_specs = [dt_spec]
    args = [dt_arr]
    if base is not None:
        in_specs.append(dt_spec if not interpret else pl.BlockSpec())
        args.append(jnp.asarray(base, jnp.int32).reshape(1, 3))
    in_specs += [slab4, pl.BlockSpec((1, 1, S[1], S[2]), dn), slab]
    args += [u, u, p]
    return pl.pallas_call(
        partial(_div_kernel, S, S_glob, B, dtype, base is not None),
        grid=(G,),
        in_specs=in_specs,
        out_specs=[slab, slab],
        out_shape=[jax.ShapeDtypeStruct(S, dtype),
                   jax.ShapeDtypeStruct(S, dtype)],
        interpret=interpret,
    )(*args)


# --- analytic (far-field) Poisson stencil ----------------------------------
#
# On banded levels the operator away from the body is the constant-coefficient
# Laplacian with index-determined wall-face zeros (ops/poisson.py banded path),
# so this kernel reads NO coefficient fields at all: traffic is x (+2 halo
# rows per slab) and the output — ~2.5 field passes vs 7 for the
# variable-coefficient kernel.  The caller overwrites the body window with
# the true coefficient compute in XLA (tiny).

ANA_BLOCK = 4


def _ana_kernel(S, B, c, perdir, with_dot, dtype,
                xc_ref, xu_ref, xd_ref, *out_refs):
    s0 = pl.program_id(0) * B
    sh = (B, S[1], S[2])
    g0 = s0 + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    g1 = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    g2 = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    gmask = ((g0 >= 1) & (g0 <= S[0] - 2) & (g1 >= 1) & (g1 <= S[1] - 2)
             & (g2 >= 1) & (g2 <= S[2] - 2))
    one = jnp.ones(sh, dtype)

    def faces(d, g):
        if d in perdir:
            return one, one
        lo = (g != 1).astype(dtype)
        hi = (g != S[d] - 2).astype(dtype)
        return lo, hi

    lo0, hi0 = faces(0, g0)
    lo1, hi1 = faces(1, g1)
    lo2, hi2 = faces(2, g2)
    xc = xc_ref[...]
    xm = jnp.concatenate([xu_ref[...], xc[:B - 1]], axis=0) if B > 1 else xu_ref[...]
    xp = jnp.concatenate([xc[1:], xd_ref[...]], axis=0) if B > 1 else xd_ref[...]
    t = (lo0 * xm + hi0 * xp
         + lo1 * _sub_roll(xc, -1) + hi1 * _sub_roll(xc, +1)
         + lo2 * _lane_roll(xc, -1) + hi2 * _lane_roll(xc, +1))
    nf = lo0 + hi0 + lo1 + hi1 + lo2 + hi2
    z = jnp.where(gmask, c * t - (c * nf) * xc, 0.0).astype(dtype)
    out_refs[0][...] = z
    if with_dot:
        # where() rather than z's zero factor: a ragged tail slab reads
        # out-of-bounds rows whose garbage (NaN in interpret mode) survives
        # a multiply-by-zero and would poison the PCG denominator
        out_refs[1][...] = jnp.sum(jnp.where(gmask, z * xc, 0.0)).reshape(1, 1, 1)


def ana_mult3d_pallas(x, c, perdir=(), with_dot=False, interpret=False,
                      block=ANA_BLOCK):
    """z = A·x for the analytic far-field operator (+ optional per-slab
    partial dots Σ z·x for a fused ⟨Ax, x⟩)."""
    S = x.shape
    dtype = x.dtype
    B = block
    G = pl.cdiv(S[0], B)
    up = lambda i: (jnp.maximum(i * B - 1, 0), 0, 0)
    dn = lambda i: (jnp.minimum(i * B + B, S[0] - 1), 0, 0)
    row = lambda f: pl.BlockSpec((1, S[1], S[2]), f)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    out_shape = [jax.ShapeDtypeStruct(S, dtype)]
    out_specs = [slab]
    if with_dot:
        out_shape.append(jax.ShapeDtypeStruct((G, 1, 1), dtype))
        out_specs.append(pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)))
    out = pl.pallas_call(
        partial(_ana_kernel, S, B, float(c), tuple(perdir), with_dot, dtype),
        grid=(G,),
        in_specs=[slab, row(up), row(dn)],
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        interpret=interpret,
    )(x, x, x)
    if with_dot:
        return out[0], jnp.sum(out[1])
    return out


def use_ana(S, dtype) -> bool:
    """Gate for the analytic Pallas stencil (banded levels are never sharded)."""
    return (HAS_PALLAS and len(S) == 3 and dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and math.prod(S) >= MIN_CELLS and S[0] >= 2 * ANA_BLOCK)


# --- blocked conv_diff (non-periodic 3D) -----------------------------------
#
# The QUICK flux sweeps are the other traffic-bloated op (XLA: ~224 field
# passes).  One all-sweeps kernel per output component: each kernel reads
# every velocity row it needs exactly once (comp i at +-2 rows for the
# axis-0 sweep, the advecting components at 0/+-1), so total traffic is
# ~28 row-passes per output row vs ~38 for the earlier 4-kernel split
# (measured 6.3 -> 3.5 ms per call at 258^3).  Periodic directions fall
# back to the XLA path.


def _gidx(shape, d, base_ref):
    """Global index along axis d for every cell of a (B,S1,S2) block.

    ``base_ref`` (SMEM, (1,3) i32) holds the global index of array cell 0
    per axis — zeros for the whole-grid call; the shard_map path passes its
    local block's offset (minus the halo width) so boundary-variant fluxes
    and write-support masks see GLOBAL positions."""
    g = jax.lax.broadcasted_iota(jnp.int32, shape, d)
    if d == 0:
        g = g + pl.program_id(0) * shape[0]
    return g + base_ref[0, d]


def _supp(S_glob, shape, j, base_ref):
    """Reference write-support mask for sweep j on a slab (util.jl:180):
    cells 1..S-2 along j, 1..S-1 transverse — in GLOBAL indices."""
    m = None
    for d in range(3):
        g = _gidx(shape, d, base_ref)
        md = ((g >= 1) & (g <= S_glob[d] - 2)) if d == j else (g >= 1)
        m = md if m is None else m & md
    return m


def _conv_comp_kernel(S, S_glob, B, nu, limiter, dtype, i, bases, perdir,
                      modular, base_ref, *refs):
    """All three sweeps for ONE output component ``i``.

    The 4-kernel split reads the velocity window once per kernel (~38
    effective row-passes per output row at B=1); reading each needed row
    exactly once per component cuts that to ~20-28.  Row windows arrive as
    clamped single-row BlockSpecs concatenated here; ``bases`` maps each
    velocity component to its window's first row offset.  ``S`` is the
    array geometry; ``S_glob``/``base_ref`` give the global-grid sizes and
    this array's global offset (equal to S / zeros for whole-grid calls).

    ``perdir`` selects periodic flux variants (reference src/Flow.jl:7,60):
    face 1's far-upwind tap wraps to interior plane ``S-3`` (ϕuP) and the
    top face's flux is a copy of face 1's.  Ghost planes of ``u`` are
    assumed periodic-filled by the caller's BC (the same contract as the
    XLA `conv_core`).  Whole-grid calls: along axis 0 the face-1 flux of
    the copy lives in a different slab, so it is recomputed from six
    fixed-global-row inputs (``fix_refs``).  Shard-local calls
    (``modular``): the array's pad planes hold the modular wrap values
    (`parallel.halo.halo_exchange` perdir=), so periodic fluxes are the
    UNIFORM periodic formula — no wrap refs, no copy (see conv_core's
    docstring for the bitwise-equivalence argument).
    """
    n_fix = 6 if 0 in perdir and not modular else 0
    out_ref = refs[-1]
    fix_refs = refs[len(refs) - 1 - n_fix:len(refs) - 1]
    wins = {}
    k = 0
    for c, (base, nrows) in bases.items():
        wins[c] = jnp.concatenate([refs[k + m][0, 0:1] for m in range(nrows)],
                                  axis=0)
        k += nrows

    def tap(c, o):
        lo = o - bases[c][0]
        return wins[c][lo:lo + B]

    sh = (B, S[1], S[2])
    kf0 = _gidx(sh, 0, base_ref)

    # axis-0 sweep (needs comp i at +-2 rows)
    if i == 1:
        wshift0 = lambda o: _sub_roll(tap(0, o), -1)
    elif i == 2:
        wshift0 = lambda o: _lane_roll(tap(0, o), -1)
    else:
        wshift0 = lambda o: tap(0, o - 1)

    if 0 in perdir and modular:
        # modular pad rows already hold the wrap values: plain periodic
        # formula, sequential evaluation as in the non-periodic branch
        def flux0m(s):
            f, fm1 = tap(i, s), tap(i, s - 1)
            w = 0.5 * (tap(0, s) + wshift0(s))
            pos = limiter(tap(i, s - 2), fm1, f)
            neg = limiter(tap(i, s + 1), f, fm1)
            return jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)

        supp0m = _supp(S_glob, sh, 0, base_ref)
        acc = jnp.where(supp0m, flux0m(0), 0.0)
        acc = acc - jnp.where(supp0m, flux0m(1), 0.0)
    elif 0 in perdir:
        wrap0 = fix_refs[0][0, 0:1]           # comp i, interior plane S-3
        r0, r1, r2 = (fix_refs[m][0, 0:1] for m in (1, 2, 3))  # rows 0,1,2
        w0a, w0b = fix_refs[4][0, 0:1], fix_refs[5][0, 0:1]    # u0 rows 0,1

        def flux0(s):
            f, fm1, fm2 = tap(i, s), tap(i, s - 1), tap(i, s - 2)
            w = 0.5 * (tap(0, s) + wshift0(s))
            # ϕuP: face 1's far-upwind point wraps to plane S-3
            pos = jnp.where(kf0 + s == 1, limiter(wrap0, fm1, f),
                            limiter(fm2, fm1, f))
            neg = limiter(tap(i, s + 1), f, fm1)
            return jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)

        # face 1's flux from the fixed rows (the top-face copy, Flow.jl:60)
        if i == 0:
            ws1 = w0a
        elif i == 1:
            ws1 = _sub_roll(w0b, -1)
        else:
            ws1 = _lane_roll(w0b, -1)
        w1 = 0.5 * (w0b + ws1)
        F1row = (jnp.where(w1 > 0, w1 * limiter(wrap0, r0, r1),
                           w1 * limiter(r2, r1, r0)) - nu * (r1 - r0))
        supp0 = _supp(S_glob, sh, 0, base_ref)
        acc = jnp.where(supp0, flux0(0), 0.0)
        F1 = jnp.where(kf0 + 1 == S_glob[0] - 1, F1row, flux0(1))
        acc = acc - jnp.where(supp0, F1, 0.0)
    else:
        def flux0(s):
            f, fm1, fm2, fp1 = (tap(i, s), tap(i, s - 1), tap(i, s - 2),
                                tap(i, s + 1))
            w = 0.5 * (tap(0, s) + wshift0(s))
            cd = 0.5 * (f + fm1)
            pos = jnp.where(kf0 + s == 1, cd, limiter(fm2, fm1, f))
            neg = jnp.where(kf0 + s == S_glob[0] - 1, cd, limiter(fp1, f, fm1))
            return jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)

        # sequential flux evaluation (not flux0(0)-flux0(1) in one
        # expression): halves the concurrent flux temporaries Mosaic must
        # stack-allocate
        acc = jnp.where(_supp(S_glob, sh, 0, base_ref), flux0(0), 0.0)
        acc = acc - jnp.where(_supp(S_glob, sh, 0, base_ref), flux0(1), 0.0)

    # axis-1/2 sweeps (sublane/lane rolls)
    for j in (1, 2):
        roll = _sub_roll if j == 1 else _lane_roll
        kf = _gidx(sh, j, base_ref)
        supp = _supp(S_glob, sh, j, base_ref)
        uj = tap(j, 0)
        if i == 0:
            ujm0 = tap(j, -1)
            ws = lambda o: roll(ujm0, o)
        elif i == j:
            ws = lambda o: roll(uj, o - 1)
        elif i == 1:
            ws = lambda o: _sub_roll(roll(uj, o), -1)
        else:
            ws = lambda o: _lane_roll(roll(uj, o), -1)

        fi = tap(i, 0)

        # The upper-face flux of cell k IS the lower-face flux of cell
        # k+1 (face-position specials are in-expression via ``kf``), so
        # one block-wide face evaluation + a roll replaces the second
        # limiter evaluation — the kernel is VPU-bound (round-5 profile),
        # and this halves the flux compute of the two in-block sweeps.
        # The roll's wrap row lands only at the top global ghost (outside
        # ``supp``) or under the explicit top-face where-override.
        if j in perdir and modular:
            # modular pad planes hold the wrap values: uniform formula
            def fluxpm(s):
                f, fm1 = roll(fi, s), roll(fi, s - 1)
                w = 0.5 * (roll(uj, s) + ws(s))
                pos = limiter(roll(fi, s - 2), fm1, f)
                neg = limiter(roll(fi, s + 1), f, fm1)
                return jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)

            F0 = fluxpm(0)
            acc = acc + jnp.where(supp, F0, 0.0)
            acc = acc - jnp.where(supp, roll(F0, 1), 0.0)
            continue
        if j in perdir:
            # whole planes live in VMEM: the ϕuP wrap is an in-block slice
            wrap_pl = jax.lax.slice_in_dim(fi, S[j] - 3, S[j] - 2, axis=j)

            def fluxp(s):
                f, fm1 = roll(fi, s), roll(fi, s - 1)
                w = 0.5 * (roll(uj, s) + ws(s))
                pos = jnp.where(kf + s == 1, limiter(wrap_pl, fm1, f),
                                limiter(roll(fi, s - 2), fm1, f))
                neg = limiter(roll(fi, s + 1), f, fm1)
                return jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)

            F0 = fluxp(0)
            acc = acc + jnp.where(supp, F0, 0.0)
            # top-face flux copies face 1's (periodic calls are whole-grid,
            # so local plane 1 IS global plane 1); elsewhere the roll of
            # F0 IS fluxp(1) (face specials are positional via ``kf``)
            F1 = jnp.where(kf + 1 == S_glob[j] - 1,
                           jax.lax.slice_in_dim(F0, 1, 2, axis=j),
                           roll(F0, 1))
            acc = acc - jnp.where(supp, F1, 0.0)
            continue

        def flux(s):
            f, fm1 = roll(fi, s), roll(fi, s - 1)
            w = 0.5 * (roll(uj, s) + ws(s))
            cd = 0.5 * (f + fm1)
            pos = jnp.where(kf + s == 1, cd,
                            limiter(roll(fi, s - 2), fm1, f))
            neg = jnp.where(kf + s == S_glob[j] - 1, cd,
                            limiter(roll(fi, s + 1), f, fm1))
            return jnp.where(w > 0, w * pos, w * neg) - nu * (f - fm1)

        F0 = flux(0)
        acc = acc + jnp.where(supp, F0, 0.0)
        acc = acc - jnp.where(supp, roll(F0, 1), 0.0)
    out_ref[...] = acc.astype(dtype)


BLOCK_CDF = 1  # B=2 exceeds the 16 MB scoped-VMEM limit at 258^3


def _comp_bases(i, B):
    """{comp: (first row offset, n rows)} needed by component ``i``."""
    bases = {i: (-2, B + 4)}
    if i != 0:
        bases[0] = (0, B + 1)
    for j in (1, 2):
        if j != i:
            lo = -1 if i == 0 else 0
            bases.setdefault(j, (lo, B - lo))
    return dict(sorted(bases.items()))


CONV_MERGED = True  # A/B knob (scripts/ab_reduce.py): one kernel, 3 comps


class _AccOut:
    """Output shim so `_conv_all_kernel` can drive `_conv_comp_kernel`'s
    body per component and collect the slab instead of storing it."""

    def __setitem__(self, idx, v):
        self.v = v


def _conv_all_kernel(S, S_glob, B, nu, limiter, dtype, perdir, modular,
                     base_ref, *refs):
    """All three output components in ONE kernel.

    Each velocity component's full row window (−2..B+1 relative to the
    slab) is fetched once and shared by the three per-component sweeps —
    the 3-kernel split re-fetches the cross-component rows per kernel
    (25 row reads per grid row at B=1 vs 15 here) and hands XLA three
    separate outputs whose `jnp.stack` materializes as a ~2 ms fusion at
    258³.  The flux algebra is `_conv_comp_kernel`'s own body, driven
    per component with window views (bitwise-identical expressions)."""
    n_fix = 14 if 0 in perdir and not modular else 0
    out_ref = refs[-1]
    fix = refs[len(refs) - 1 - n_fix:len(refs) - 1]
    rows = refs[:len(refs) - 1 - n_fix]
    per = B + 4
    for i in range(3):
        bases = _comp_bases(i, B)
        virt = []
        for c, (boff, nrows) in bases.items():
            first = boff + 2   # offset into comp c's fetched (−2..) window
            for m in range(nrows):
                virt.append(rows[c * per + first + m])
        fx = ([fix[4 * i], fix[4 * i + 1], fix[4 * i + 2], fix[4 * i + 3],
               fix[12], fix[13]] if n_fix else [])
        acc = _AccOut()
        _conv_comp_kernel(S, S_glob, B, nu, limiter, dtype, i, bases,
                          perdir, modular, base_ref, *virt, *fx, acc)
        out_ref[i, :, :, :] = acc.v


def conv_diff3d_pallas(u, nu, limiter, S, interpret=False,
                       block=None, S_glob=None, base=None, perdir=(),
                       modular=False):
    """Full conv_diff: one all-sweeps kernel per component.

    ``S_glob``/``base`` support shard_map-local calls: ``u`` is then a
    halo-extended local block whose cell 0 sits at global index ``base``
    (per axis, i32 — may be traced); boundary flux variants and write
    support use global positions, and the caller trims the halo planes of
    the output.  Defaults: whole grid (S_glob=S, base=0).

    ``perdir`` selects the periodic flux variants (ϕuP wrap + top-face flux
    copy, reference src/Flow.jl:7,60).  Whole-grid calls read the wrap
    rows via fixed-row BlockSpecs; shard-local calls must pass
    ``modular=True`` with a halo extension whose pad planes hold the
    modular wrap values (`parallel.halo.halo_exchange` perdir=) — the
    kernel then uses the uniform periodic formula with no wrap inputs."""
    dtype = u.dtype
    B = BLOCK_CDF if block is None else block
    G = pl.cdiv(S[0], B)
    if S_glob is None:
        S_glob = S
    assert modular or not (perdir and base is not None), (
        "shard-local periodic conv calls must use modular wrap halos")
    if base is None:
        base = jnp.zeros((1, 3), jnp.int32)
    else:
        base = jnp.asarray(base, jnp.int32).reshape(1, 3)
    perdir = tuple(perdir)

    def crow(c, off):
        def f(g, c=c, off=off):
            return (c, jnp.clip(g * B + off, 0, S[0] - 1), 0, 0)
        return pl.BlockSpec((1, 1, S[1], S[2]), f)

    def frow(c, row_):
        # fixed global row (the axis-0 periodic wrap/face-1 sources)
        return pl.BlockSpec((1, 1, S[1], S[2]),
                            lambda g, c=c, row_=row_: (c, row_, 0, 0))

    base_spec = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
        else pl.BlockSpec()
    slab = pl.BlockSpec((B, S[1], S[2]), lambda g: (g, 0, 0))
    if CONV_MERGED:
        # one kernel for ALL THREE components: each comp's full row window
        # is fetched once and shared (15 row reads + 3 writes per grid row
        # at B=1 vs the split's 25 + 3), and the stacked (3,S) output is
        # written directly — the jnp.stack below otherwise materializes as
        # a separate ~2 ms full-array fusion at 258³ (the round-5 device
        # profile's pad_maximum/concatenate fusions).
        specs, args = [base_spec], [base]
        for c in range(3):
            for m in range(B + 4):
                specs.append(crow(c, -2 + m))
                args.append(u)
        if 0 in perdir and not modular:
            for i in range(3):
                for row_ in (S[0] - 3, 0, 1, 2):
                    specs.append(frow(i, row_))
                    args.append(u)
            for row_ in (0, 1):
                specs.append(frow(0, row_))
                args.append(u)
        params = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                  if not interpret else None)
        return pl.pallas_call(
            partial(_conv_all_kernel, S, S_glob, B, nu, limiter, dtype,
                    perdir, modular),
            grid=(G,),
            in_specs=specs,
            out_specs=pl.BlockSpec((3, B, S[1], S[2]),
                                   lambda g: (0, g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((3,) + S, dtype),
            interpret=interpret,
            compiler_params=params,
        )(*args)
    comps = []
    for i in range(3):
        bases = _comp_bases(i, B)
        specs, args = [base_spec], [base]
        for c, (boff, nrows) in bases.items():
            for m in range(nrows):
                specs.append(crow(c, boff + m))
                args.append(u)
        if 0 in perdir and not modular:
            for c, row_ in [(i, S[0] - 3), (i, 0), (i, 1), (i, 2),
                            (0, 0), (0, 1)]:
                specs.append(frow(c, row_))
                args.append(u)
        # the six axis-0 wrap/face rows push the periodic variant past the
        # default 16 MB scoped-VMEM budget at 256^3 (17.64 MB measured);
        # raise the scoped limit for that variant only — v5e has 128 MB
        # physical VMEM and the non-periodic path (the benched sphere
        # configs) keeps the conservative default
        params = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                  if (perdir and not interpret) else None)
        comps.append(pl.pallas_call(
            partial(_conv_comp_kernel, S, S_glob, B, nu, limiter, dtype, i,
                    bases, perdir, modular),
            grid=(G,),
            in_specs=specs,
            out_specs=slab,
            out_shape=jax.ShapeDtypeStruct(S, dtype),
            interpret=interpret,
            compiler_params=params,
        )(*args))
    return jnp.stack(comps, axis=0)
