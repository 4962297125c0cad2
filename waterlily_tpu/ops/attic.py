"""Attic: retired Pallas kernel families, kept as measured negative results.

Two fully-working kernel architectures that LOST their step-level A/Bs on
hardware and are NOT dispatched anywhere in the package (docs/PERF.md holds
the numbers; VERDICT r4 weak #5 moved them out of the hot module):

1. **Fused whole-PCG-iteration sweeps** (`pcg_dir_mult`/`pcg_update`/
   `pcg_blocked`): the entire PCG iteration body in two blocked kernels with
   zero full-array XLA passes.  Measured 0.968x the per-pass smoother at
   256^3 (scripts/ab_pcgiter.py, docs/PERF.md round 4) — the per-pass
   remainder is already fusion-optimal and the two-sweep split re-reads the
   x/r/eps/z streams across sweeps at the VMEM-forced B=1.

2. **Carried-rows streaming mult/increment** (`mult3d_stream`/
   `increment3d_stream`): every input row fetched from HBM exactly once via
   a persistent VMEM carry and lagged BlockSpec index maps.  Measured
   40-70% slower than the halo-row kernels on the v5e (docs/PERF.md round-3
   negative results): those already run at ~HBM speed-of-light, so the
   (B+2)/B re-read tax costs no wall time, while the cross-step scratch
   dependency defeats Mosaic's double-buffered overlap.

3. **Round-5 solver-dot reduction kernels** (`dot3d_pallas`,
   `pcg_axpy_pallas`): standalone blocked dots (incl. the fused
   ``mode='rid'`` ⟨r, r∘iD⟩ that re-reads r/iD instead of materializing
   the product) and the axpy-pair+next-rho sweep.  Both LOST their 256³
   step A/Bs (scripts/ab_reduce.py: rid dots +1.9 ms/step, the axpy
   sweep +7.3 ms/step over XLA's fused multiply_reduce/elementwise
   forms) — in-program Mosaic reduce calls only pay when they ride an
   already-streaming stencil kernel (the matvec's ``with_dot``), never
   standalone.  Dispatch remains wired in `ops.poisson` behind
   ``KDOT``/``KAXPY`` (both False) for A/B reproducibility.

Each family keeps one interpret-mode parity test (tests/test_attic.py); the
architectures remain the reference implementations of "fused iteration" and
"each-row-once" streaming should a future runtime shift the trade-offs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .pallas_stencil import (HAS_PALLAS, _ghost_mask, _mult_block, _row_bytes,
                             _sub_roll, _lane_roll, block_for, mult3d_pallas,
                             increment3d_pallas)

if HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = ["pcg_dir_mult", "pcg_update", "pcg_blocked", "block_for_pcgiter",
           "mult3d_stream", "increment3d_stream"]

# --- fused whole-PCG-iteration sweeps (big 3D, non-periodic) ----------------
#
# The blocked smoother's XLA remainder costs ~8-10 full-array passes per PCG
# iteration (the eps rebuild, both axpys, r·iD and the second dot —
# ops/poisson.py pcg); at 256³ the pressure solves are ~45% of the step with
# the per-pass kernels already at HBM roofline, so pass-COUNT is the lever
# (round-3 verdict item 2).  Two sweeps replace the whole iteration body:
#
#   sweep 1 (`pcg_dir_mult`): rebuilds the search direction
#       eps = β·eps_prev + r∘iD  in registers (halo rows included, so the
#       stencil taps see the rebuilt direction), applies A, and accumulates
#       per-slab partials of ⟨A·eps, eps⟩ and ⟨r, r∘iD⟩ (the latter seeds
#       rho at β=0 — the first "iteration" IS the preamble z=r∘iD).
#   sweep 2 (`pcg_update`): x += upd·eps, r -= upd·z (aliased in place) and
#       the next rho partials Σ r'·(r'∘iD).
#
# All early-exit/dead-mask algebra stays in XLA scalars between the calls —
# bit-identical control flow to ops.poisson.pcg; only dot association and
# FMA contraction differ (per-slab partials, verified pois_n parity on
# hardware — docs/PERF.md round 4).  bf16 search directions round eps in
# registers BEFORE the stencil, so A is applied to the same rounded
# direction that updates x and r (the bf16_eps consistency contract).


def _pcg_rebuild(beta, ep, rr, iD, cdt):
    """eps rows from the previous direction + preconditioned residual."""
    return beta * ep.astype(cdt) + rr.astype(cdt) * iD.astype(cdt)


def _pcg_dir_mult_kernel(S, B, sdt, bf16, beta_ref, L_ref, L0d_ref, D_ref,
                         ec_ref, eu_ref, ed_ref, rc_ref, ru_ref, rd_ref,
                         ic_ref, iu_ref, id_ref,
                         eps_out, z_out, den_out, rre_out):
    cdt = jnp.float32
    beta = beta_ref[0, 0].astype(cdt)
    ec = _pcg_rebuild(beta, ec_ref[...], rc_ref[...], ic_ref[...], cdt)
    eu = _pcg_rebuild(beta, eu_ref[...], ru_ref[...], iu_ref[...], cdt)
    ed = _pcg_rebuild(beta, ed_ref[...], rd_ref[...], id_ref[...], cdt)
    if bf16:
        # round the direction BEFORE the stencil: x/r updates and A·eps
        # must see the same rounded eps (PoissonLevel.bf16_eps contract)
        ec, eu, ed = (a.astype(jnp.bfloat16) for a in (ec, eu, ed))
    mask = _ghost_mask(S, B, cdt)
    z = _mult_block(L_ref[...], L0d_ref[0], D_ref[...], ec, eu, ed, mask, B)
    ecf = ec.astype(cdt)
    eps_out[...] = ec.astype(sdt) if not bf16 else ec
    z_out[...] = z
    bmask = _ghost_mask(S, B, jnp.bool_)
    den_out[...] = jnp.sum(jnp.where(bmask, z * ecf, 0.0)).reshape(1, 1, 1)
    # rho seed (β=0 path): ⟨r, r∘iD⟩ with the UNROUNDED product, matching
    # ops.poisson.pcg's field_dot(r, z) against the f32 z
    rc = rc_ref[...].astype(cdt)
    rid = rc * ic_ref[...].astype(cdt)
    rre_out[...] = jnp.sum(jnp.where(bmask, rc * rid, 0.0)).reshape(1, 1, 1)


def _pcg_update_kernel(S, B, sdt, upd_ref, x_ref, r_ref, e_ref, z_ref,
                       iD_ref, xo_ref, ro_ref, rho2_out):
    cdt = jnp.float32
    upd = upd_ref[0, 0].astype(cdt)
    e = e_ref[...].astype(cdt)
    z = z_ref[...].astype(cdt)
    xn = x_ref[...].astype(cdt) + upd * e
    rn = r_ref[...].astype(cdt) - upd * z
    xo_ref[...] = xn.astype(sdt)
    ro_ref[...] = rn.astype(sdt)
    bmask = _ghost_mask(S, B, jnp.bool_)
    z2 = rn * iD_ref[...].astype(cdt)
    rho2_out[...] = jnp.sum(jnp.where(bmask, rn * z2, 0.0)).reshape(1, 1, 1)


def block_for_pcgiter(S, dtype=jnp.float32) -> int:
    """Slab height for the fused-iteration sweeps: sweep 1 keeps ~13 input
    + 2 output row-blocks resident (double-buffered)."""
    return 2 if 60 * _row_bytes(S, dtype) <= 14 * 2 ** 20 else 1


def pcg_dir_mult(L, Dd, eps_prev, r, iD, beta, S, bf16=False,
                 interpret=False, block=None):
    """(eps, z=A·eps, ⟨z,eps⟩, ⟨r,r∘iD⟩) in one blocked sweep.

    ``beta`` is a traced scalar (SMEM); ``beta=0`` reproduces the PCG
    preamble ``eps = r∘iD`` exactly (eps_prev is multiplied by zero — it
    must be finite, pass ``r``).  ``bf16`` stores/rounds the direction in
    bfloat16 in-registers before the stencil."""
    cdt = jnp.float32
    B = block_for_pcgiter(S) if block is None else block
    G = pl.cdiv(S[0], B)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    up = lambda i: (jnp.maximum(i * B - 1, 0), 0, 0)
    dn = lambda i: (jnp.minimum(i * B + B, S[0] - 1), 0, 0)
    row = lambda f: pl.BlockSpec((1, S[1], S[2]), f)
    part = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0))
    sdt = jnp.bfloat16 if bf16 else cdt
    beta_spec = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
        else pl.BlockSpec()
    beta_arr = jnp.asarray(beta, cdt).reshape(1, 1)
    out = pl.pallas_call(
        partial(_pcg_dir_mult_kernel, S, B, sdt, bool(bf16)),
        grid=(G,),
        in_specs=[beta_spec,
                  pl.BlockSpec((3, B, S[1], S[2]), lambda i: (0, i, 0, 0)),
                  pl.BlockSpec((1, 1, S[1], S[2]),
                               lambda i: (0, jnp.minimum(i * B + B, S[0] - 1),
                                          0, 0)),
                  slab, slab, row(up), row(dn), slab, row(up), row(dn),
                  slab, row(up), row(dn)],
        out_specs=[slab, slab, part, part],
        out_shape=[jax.ShapeDtypeStruct(S, sdt),
                   jax.ShapeDtypeStruct(S, cdt),
                   jax.ShapeDtypeStruct((G, 1, 1), cdt),
                   jax.ShapeDtypeStruct((G, 1, 1), cdt)],
        interpret=interpret,
    )(beta_arr, L, L, Dd, eps_prev, eps_prev, eps_prev, r, r, r, iD, iD, iD)
    return out[0], out[1], jnp.sum(out[2]), jnp.sum(out[3])


def pcg_update(x, r, eps, z, iD, upd, S, interpret=False, block=None):
    """(x+upd·eps, r−upd·z, ⟨r', r'∘iD⟩) in one aliased blocked sweep."""
    cdt = x.dtype
    B = block_for_pcgiter(S) if block is None else block
    G = pl.cdiv(S[0], B)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    part = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0))
    upd_spec = pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret \
        else pl.BlockSpec()
    upd_arr = jnp.asarray(upd, cdt).reshape(1, 1)
    out = pl.pallas_call(
        partial(_pcg_update_kernel, S, B, cdt),
        grid=(G,),
        in_specs=[upd_spec, slab, slab, slab, slab, slab],
        out_specs=[slab, slab, part],
        out_shape=[jax.ShapeDtypeStruct(S, cdt),
                   jax.ShapeDtypeStruct(S, cdt),
                   jax.ShapeDtypeStruct((G, 1, 1), cdt)],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(upd_arr, x, r, eps, z, iD)
    return out[0], out[1], jnp.sum(out[2])


def pcg_blocked(lev, x, r, it: int = 6, interpret: bool = False):
    """Whole PCG smooth from the two fused-iteration sweeps.

    Bit-faithful restructure of `ops.poisson.pcg` (reference
    src/Poisson.jl:123-143): identical dead-mask early exits in XLA
    scalars; denom for iteration i+1 comes from the sweep that rebuilds
    eps at the end of iteration i (same math, two kernels per iteration,
    ZERO full-array XLA passes).  Non-periodic levels only (the in-kernel
    eps rebuild cannot fill periodic ghosts)."""
    from .poisson import _opLD
    dt = x.dtype
    S = x.shape
    teneps = 10 * jnp.finfo(dt).eps
    L, Dd = _opLD(lev)
    iD = lev.iD16 if lev.iD16 is not None else lev.iD
    bf16 = bool(lev.bf16_eps)

    eps, z, denom, rho = pcg_dir_mult(L, Dd, r, r, iD, 0.0, S, bf16=bf16,
                                      interpret=interpret)
    dead = jnp.abs(rho) < teneps
    for i in range(it):
        alpha = jnp.where(dead | (denom == 0), 0.0,
                          rho / jnp.where(denom == 0, 1.0, denom)).astype(dt)
        dead = dead | (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)
        upd = jnp.where(dead, 0.0, alpha).astype(dt)
        x, r, rho2 = pcg_update(x, r, eps, z, iD, upd, S,
                                interpret=interpret)
        if i == it - 1:
            break
        dead = dead | (jnp.abs(rho2) < teneps)
        beta = jnp.where(dead, 0.0,
                         rho2 / jnp.where(rho == 0, 1.0, rho)).astype(dt)
        eps, z, denom, _ = pcg_dir_mult(L, Dd, eps, r, iD, beta, S,
                                        bf16=bf16, interpret=interpret)
        rho = jnp.where(dead, rho, rho2)
    return x, r


# --- carried-rows streaming mult/increment ---------------------------------
#
# NOT DISPATCHED — measured 40-70% slower than the halo-row kernels on the
# v5e (PERF.md round-3 negative results): the halo kernels already run at
# ~HBM speed-of-light, so the (B+2)/B re-read tax costs no wall time, while
# the cross-step scratch dependency here defeats Mosaic's double-buffered
# overlap.  Retained (with interpret-mode tests) as the reference
# implementation of the each-input-row-fetched-once architecture.
#
# The blocked kernels above re-read axis-0 halo rows every slab: at B=2 the
# x window is (B+2)/B = 2x and L0 (B+1)/B = 1.5x their algorithmic traffic.
# These variants fetch EVERY INPUT ROW EXACTLY ONCE with no manual DMA: the
# grid runs one step AHEAD of the output (the slab fetched at step g is
# consumed at step g+1), stencil state rides a persistent VMEM carry, and
# lagged BlockSpec index maps let Mosaic skip every duplicate fetch.
#
# Mechanics (grid = G+1 steps over G = S0/B slabs; requires B | S0):
# - x and L0 input maps point at slab min(g, G-1): the +1 axis-0 tap of the
#   step-(g) compute needs only the FIRST row of slab g.  L1/L2/D maps lag
#   one step (slab max(g-1, 0)) — they have no +1 tap.  Consecutive equal
#   block indices skip the copy, so every row moves from HBM once.
# - a (B+1)-row VMEM carry holds x rows [gB-1, (g+1)B) across steps (one
#   row of L0 likewise); step g>=1 computes output slab g-1 entirely from
#   carries + the current slab's first row.
# - the output map is max(g-1, 0): steps 0 and 1 both visit block 0, whose
#   garbage step-0 contents stay in VMEM and are fully overwritten at step
#   1 before Mosaic flushes on the index change.  Ghost outputs use
#   where()-masking (NOT multiply): the carry's seed row is uninitialized
#   VMEM whose NaNs would survive a multiply-by-zero.
# - the grid dimension is declared ARBITRARY (sequential): the carry makes
#   step g+1 depend on step g.


def _stream_params():
    return pltpu.CompilerParams(
        dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,))


def _stream_compute(S, B, g, L1, L2, Dd, xcar, l0car, x_in, l0_in):
    """A·x rows [(g-1)B, gB) from the carries + current slab's first row.

    Returns (z, xc) with z where-masked to zero on global ghosts."""
    # same contract as the halo-row kernels: bf16 coefficients are upcast
    # and applied in f32 registers (the bf16-rounded operator in f32
    # arithmetic) — never accumulate in bf16
    dtype = jnp.float32 if L1.dtype == jnp.bfloat16 else L1.dtype
    xm = xcar[0:B]
    xc = xcar[1:B + 1]
    if B == 1:   # zero-size concat operands are invalid vector types
        xp, L0p = x_in[0:1], l0_in[0:1]
    else:
        xp = jnp.concatenate([xcar[2:B + 1], x_in[0:1]], axis=0)
        L0p = jnp.concatenate([l0car[1:B], l0_in[0:1]], axis=0)
    if xc.dtype != dtype:
        xm, xc, xp = (a.astype(dtype) for a in (xm, xc, xp))
    if L1.dtype != dtype:
        L1, L2 = L1.astype(dtype), L2.astype(dtype)
        Dd = Dd.astype(dtype)
    L0 = l0car[0:B]
    if L0.dtype != dtype:
        L0, L0p = L0.astype(dtype), L0p.astype(dtype)
    s = xc * Dd + xm * L0 + xp * L0p
    s = s + _sub_roll(xc, -1) * L1 + _sub_roll(xc, +1) * _sub_roll(L1, +1)
    s = s + _lane_roll(xc, -1) * L2 + _lane_roll(xc, +1) * _lane_roll(L2, +1)
    s0 = (g - 1) * B
    sh = (B, S[1], S[2])
    g0 = s0 + jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    g1 = jax.lax.broadcasted_iota(jnp.int32, sh, 1)
    g2 = jax.lax.broadcasted_iota(jnp.int32, sh, 2)
    m = ((g0 >= 1) & (g0 <= S[0] - 2) & (g1 >= 1) & (g1 <= S[1] - 2)
         & (g2 >= 1) & (g2 <= S[2] - 2))
    return jnp.where(m, s, 0.0).astype(dtype), xc


def _carry_update(B, xcar, l0car, x_in, l0_in):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():  # seed the pre-window row with ANY finite value (never read
        xcar[0:1] = x_in[0:1]  # for a real output; where-masking guards it)

    @pl.when(g > 0)
    def _():
        xcar[0:1] = xcar[B:B + 1]
    xcar[1:B + 1] = x_in[...]
    l0car[0:B] = l0_in[...]


def _stream_mult_kernel(S, B, with_dot, x_in, l0_in, L1_ref, L2_ref, D_ref,
                        *rest):
    if with_dot:
        z_out, dot_out, xcar, l0car = rest
    else:
        (z_out, xcar, l0car), dot_out = rest, None
    g = pl.program_id(0)

    @pl.when(g > 0)
    def _():
        z, xc = _stream_compute(S, B, g, L1_ref[...], L2_ref[...], D_ref[...],
                                xcar, l0car, x_in, l0_in)
        z_out[...] = z
        if with_dot:
            dot_out[...] = jnp.sum(z * xc.astype(z.dtype)).reshape(1, 1, 1)

    if with_dot:
        @pl.when(g == 0)
        def _():
            dot_out[...] = jnp.zeros((1, 1, 1), z_out.dtype)

    _carry_update(B, xcar, l0car, x_in, l0_in)


def _stream_specs(S, B, G):
    cur = lambda g: (jnp.minimum(g, G - 1), 0, 0)
    lag = lambda g: (jnp.maximum(g - 1, 0), 0, 0)
    slab = lambda f: pl.BlockSpec((B, S[1], S[2]), f)
    return [slab(cur), slab(cur), slab(lag), slab(lag), slab(lag)], slab(lag)


def mult3d_stream(L, Dd, x, S, interpret=False, block=None, with_dot=False):
    """z = A·x with every input row fetched from HBM exactly once (carried-
    rows streaming; see the section comment).  Falls back to the halo-row
    kernel when the slab height does not divide S[0]."""
    # outputs/accumulation in f32 even for bf16 coefficient streams (the
    # carries stay in storage dtype; _stream_compute upcasts in registers)
    dtype = jnp.float32 if L.dtype == jnp.bfloat16 else L.dtype
    B = block_for(S, dtype) if block is None else block
    if S[0] % B != 0:
        return mult3d_pallas(L, Dd, x, S, interpret=interpret, block=block,
                             with_dot=with_dot)
    G = S[0] // B
    in_specs, lag_slab = _stream_specs(S, B, G)
    out_specs = [pl.BlockSpec((B, S[1], S[2]),
                              lambda g: (jnp.maximum(g - 1, 0), 0, 0))]
    out_shape = [jax.ShapeDtypeStruct(S, dtype)]
    if with_dot:
        out_specs.append(pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((G + 1, 1, 1), dtype))
    out = pl.pallas_call(
        partial(_stream_mult_kernel, S, B, with_dot),
        grid=(G + 1,),
        in_specs=in_specs,
        out_specs=out_specs if with_dot else out_specs[0],
        out_shape=out_shape if with_dot else out_shape[0],
        scratch_shapes=[pltpu.VMEM((B + 1, S[1], S[2]), x.dtype),
                        pltpu.VMEM((B, S[1], S[2]), L.dtype)],
        compiler_params=_stream_params(),
        interpret=interpret,
    )(x, L[0], L[1], L[2], Dd)
    if with_dot:
        return out[0], jnp.sum(out[1])
    return out


def _stream_rsub_kernel(S, B, x_in, l0_in, L1_ref, L2_ref, D_ref, r_ref,
                        ro_out, xcar, l0car):
    g = pl.program_id(0)

    @pl.when(g > 0)
    def _():
        ae, _ = _stream_compute(S, B, g, L1_ref[...], L2_ref[...], D_ref[...],
                                xcar, l0car, x_in, l0_in)
        ro_out[...] = r_ref[...] - ae

    _carry_update(B, xcar, l0car, x_in, l0_in)


def increment3d_stream(L, Dd, eps, x, r, S, interpret=False, block=None):
    """(x+eps, r-A·eps) with each input row fetched once (r rides a lagged
    aliased block; the axpy stays in XLA as in `increment3d_pallas`)."""
    dtype = x.dtype
    B = block_for(S, dtype) if block is None else block
    if S[0] % B != 0:
        return increment3d_pallas(L, Dd, eps, x, r, S, interpret=interpret,
                                  block=block)
    G = S[0] // B
    in_specs, lag_slab = _stream_specs(S, B, G)
    ro = pl.pallas_call(
        partial(_stream_rsub_kernel, S, B),
        grid=(G + 1,),
        in_specs=in_specs + [lag_slab],
        out_specs=pl.BlockSpec((B, S[1], S[2]),
                               lambda g: (jnp.maximum(g - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct(S, dtype),
        scratch_shapes=[pltpu.VMEM((B + 1, S[1], S[2]), eps.dtype),
                        pltpu.VMEM((B, S[1], S[2]), L.dtype)],
        input_output_aliases={5: 0},
        compiler_params=_stream_params(),
        interpret=interpret,
    )(eps, L[0], L[1], L[2], Dd, r)
    return x + eps, ro



# --- round-5 solver-dot reduction kernels (retired) ------------------------

BLOCK_RED = 8


def _dot_kernel(S, B, mode, *refs):
    mask = _ghost_mask(S, B, jnp.bool_)
    if mode == "aa":
        a_ref, out_ref = refs
        v = a_ref[...]
        v = v * v
    elif mode == "rid":
        # Σ a·(a·b) — the PCG rho/rho2 = ⟨r, r∘iD⟩ WITHOUT materializing
        # the elementwise product (XLA's multiply_reduce fuses it too;
        # a kernel that takes the product as an operand forces an extra
        # full-array write + read — measured +4.6 ms/step, ab_reduce.py).
        # Same multiply order as z2 = r*iD; rho2 = Σ r*z2.
        a_ref, b_ref, out_ref = refs
        a = a_ref[...]
        # b may be the level's bf16 iD16 shadow: upcast in registers, the
        # same promotion XLA applies in `_rid`'s r * iD16
        v = a * (a * b_ref[...].astype(a.dtype))
    else:
        a_ref, b_ref, out_ref = refs
        v = a_ref[...] * b_ref[...].astype(a_ref.dtype)
    out_ref[...] = jnp.sum(jnp.where(mask, v, 0.0)).reshape(1, 1, 1)


def dot3d_pallas(a, b, S, interpret=False, block=None, mode=None):
    """Interior dot via per-slab partials: ⟨a, b⟩ (``mode=None``), the
    one-stream ⟨a, a⟩ (``b is a``), or ``mode='rid'`` ⟨a, a∘b⟩ (PCG's
    rho against the Jacobi-preconditioned residual, product unwritten).
    Operands must be ghost-zero (the solver's residual/search streams
    are): the kernel masks the ghost band — which also guards the ragged
    tail slab — so the result equals `grid.field_dot` exactly up to sum
    association."""
    if mode is None:
        mode = "aa" if b is a else "ab"
    B = BLOCK_RED if block is None else block
    G = pl.cdiv(S[0], B)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    one = mode == "aa"
    part = pl.pallas_call(
        partial(_dot_kernel, S, B, mode),
        grid=(G,),
        in_specs=[slab] if one else [slab, slab],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 1, 1), a.dtype),
        interpret=interpret,
    )(*((a,) if one else (a, b)))
    return jnp.sum(part)


def _axpy_rid_kernel(S, B, x_ref, e_ref, r_ref, z_ref, iD_ref, upd_ref,
                     xo_ref, ro_ref, d_ref):
    upd = upd_ref[0, 0]
    x = x_ref[...]
    xo_ref[...] = x + upd * e_ref[...].astype(x.dtype)
    rn = r_ref[...] - upd * z_ref[...]
    ro_ref[...] = rn
    mask = _ghost_mask(S, B, jnp.bool_)
    v = rn * (rn * iD_ref[...].astype(rn.dtype))
    d_ref[...] = jnp.sum(jnp.where(mask, v, 0.0)).reshape(1, 1, 1)


def pcg_axpy_pallas(x, r, eps, z, iD, upd, interpret=False, block=None):
    """The PCG iteration's axpy pair + next rho in ONE streaming sweep:
    ``x' = x + upd·eps``, ``r' = r − upd·z``, ``rho2 = ⟨r', r'∘iD⟩``.

    In-kernel reduces attached to an already-streaming kernel are cheap
    (the matvec's `with_dot` denominator); only STANDALONE Mosaic dots
    lose to XLA's fused multiply_reduce (ab_reduce.py).  This fuses the
    two axpy fusions with the rho2 reduce — one read of each stream
    (783→677 MB/iteration at 258³) and the reduce rides along.  ``eps``
    may be bf16 (upcast in registers, XLA's own promotion); ``upd`` is
    the dead-masked scalar step."""
    dtype = x.dtype
    S = x.shape
    B = BLOCK_RED if block is None else block
    G = pl.cdiv(S[0], B)
    slab = pl.BlockSpec((B, S[1], S[2]), lambda i: (i, 0, 0))
    upd_spec = (pl.BlockSpec(memory_space=pltpu.SMEM) if not interpret
                else pl.BlockSpec())
    xo, ro, part = pl.pallas_call(
        partial(_axpy_rid_kernel, S, B),
        grid=(G,),
        in_specs=[slab, slab, slab, slab, slab, upd_spec],
        out_specs=[slab, slab, pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct(S, dtype),
                   jax.ShapeDtypeStruct(S, dtype),
                   jax.ShapeDtypeStruct((G, 1, 1), dtype)],
        input_output_aliases={0: 0, 2: 1},
        interpret=interpret,
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None),
    )(x, eps, r, z, iD, jnp.reshape(upd.astype(dtype), (1, 1)))
    return xo, ro, jnp.sum(part)
