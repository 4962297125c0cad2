"""Multi-chip fast path: the PCG smoother under `shard_map`.

The GSPMD path (`parallel.mesh`) is correct everywhere but executes the
~31-pass XLA stencil lowering on every smoother iteration — Mosaic custom
calls cannot be partitioned by GSPMD, so all Pallas dispatch is gated off
for sharded layouts.  `shard_map` removes that limitation: manual
partitioning composes with `pallas_call`, so each device can run the
blocked streaming kernels on its local block, with

- halo exchange via `jax.lax.ppermute` ring shifts (`parallel.halo`) — one
  plane of ``eps`` per sharded axis per iteration, pure ICI traffic;
- the PCG dot products as per-shard partial sums + `jax.lax.psum`.

The smoother dominates pressure-solve traffic (docs/PERF.md), so routing
it through this path gives a sharded step whose hot loop matches the
single-device kernel tier; the remaining V-cycle plumbing (restrict,
prolongate, jacobi, residual) stays on GSPMD where XLA's partitioner is
already collective-permute-clean (HLO-asserted in tests/test_sharding.py).

Math is the same masked-early-exit PCG as `ops.poisson.pcg` (reference
src/Poisson.jl:123-143); only the dot-product reduction order differs
(per-shard partials then psum), which perturbs results at the ulp level.

Reference scope: the reference has no distributed support (README.md:157);
SURVEY.md §5.8 and §7 stage 8 specify this design.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from .halo import (halo_exchange, _axis_shards, spatial_specs, shift_up,
                   ghost_mask_local, get_shard_map, per_fill_local)

__all__ = ["shardmap_pcg", "can_shardmap", "local_mult", "prep_local_op",
           "shardmap_increment", "shardmap_residual", "pcg_local",
           "increment_local", "residual_local", "conv_diff_local"]


# Per-shard dispatch override for the conv regions only (None = size/backend
# auto).  "off" makes the conv regions MOSAIC-FREE: on the v5e tunnel every
# shard_map region containing a Mosaic call carries a ~10 ms fixed cost
# (docs/PERF.md round 4) while regions without Mosaic are free, so the XLA
# gather-form core inside the region can beat the blocked kernel + region
# tax.  A/B'd step-level in scripts/ab_conv_region.py.
CONV_PALLAS: str | None = None


def _spatial_names(mesh: Mesh):
    return tuple(n for n in mesh.axis_names if n != "r")


def can_shardmap(mesh: Mesh | None, S: tuple, perdir: tuple) -> bool:
    """Gate for the shard_map fast paths: a mesh whose shard counts divide
    the level shape evenly (shard_map requires exact divisibility, unlike
    GSPMD's padded sharding).  Periodic directions are supported via
    `per_fill_local` ghost fills + modular wrap halos (`halo_exchange`
    perdir=); a sharded periodic axis additionally needs local blocks of
    at least 4 planes so the width-2 wrap window [2, 4) / [B-4, B-2)
    stays clear of the ghost band."""
    if mesh is None:
        return False
    names = _spatial_names(mesh)
    if not names:
        return False
    for k in range(min(len(names), len(S))):
        n_sh = mesh.shape[names[k]]
        if S[k] % n_sh != 0:
            return False
        if k in perdir and n_sh > 1 and S[k] // n_sh < 4:
            return False
    return True


def prep_local_op(mesh: Mesh, L_l, Dd_l, D: int, pallas: str):
    """Kernel-ready local operator streams, built ONCE per shard_map region.

    L/D are constant across smoother iterations, so every matvec of a
    region shares this prep (the round-3 form rebuilt a stack+pad+DUS
    chain per call — ~5 full L-sized passes per matvec at 256³).

    Pallas path: the halo-extended ``L`` (one ppermute round — the upper
    halo plane of each component is the neighbour's first plane, exactly
    the ``L[I+δ]`` coefficient the blocked kernel reads at the block's top
    interior row; the lower halo plane is never read by the kernel) plus
    the zero-ghost-padded diagonal (the local diagonal already carries the
    global ghost zeros).  XLA path: the pre-shifted upper-face
    coefficients (`halo.shift_up`).
    """
    if pallas != "off":
        Lh = halo_exchange(L_l, mesh, D)
        Dh = jnp.pad(Dd_l, [(1, 1)] * D)
        return (Lh, Dh)
    ax = _axis_shards(mesh, D)
    return [shift_up(L_l[i], i, mesh, ax) for i in range(D)]


def local_mult(mesh: Mesh, S, L_l, Dd_l, op, x_l, mask, pallas: str = "off",
               perdir: tuple = ()):
    """A·x on a shard's local block after one halo-exchange round.

    ``op`` is `prep_local_op`'s output for this level (shared by every
    matvec in the region).  ``pallas``: 'off' = XLA slice form
    (CPU/virtual-mesh), 'compiled' / 'interpret' = the blocked streaming
    kernel on the halo'd local block (Mosaic on real TPU chips; interpret
    mode exercises the same composition on the virtual CPU mesh in tests).
    Periodic directions fill the global ghost planes first (the dense
    ``mult``'s `bc_scalar_periodic`, src/Poisson.jl:62-75 + perBC) — after
    the fill every boundary-adjacent stencil tap is an in-block read, so
    the zero edge halos stay unread exactly as in the wall case.
    """
    D = x_l.ndim
    if perdir:
        x_l = per_fill_local(x_l, mesh, S, perdir)
    xh = halo_exchange(x_l, mesh, D)
    if pallas != "off":
        from ..ops.pallas_stencil import mult3d_pallas
        # the halo'd block is exactly a ghost-padded grid for the kernel
        Lh, Dh = op
        zh = mult3d_pallas(Lh, Dh, xh, xh.shape,
                           interpret=(pallas == "interpret"))
        z = zh[(slice(1, -1),) * D]
        return jnp.where(mask, z, 0.0)
    z = x_l * Dd_l
    loc_shape = x_l.shape

    def sl(a, d, off):
        return a[tuple(
            slice(1 + (off if k == d else 0), 1 + (off if k == d else 0)
                  + loc_shape[k]) for k in range(D))]

    for i in range(D):
        z = z + sl(xh, i, -1) * L_l[i] + sl(xh, i, +1) * op[i]
    return jnp.where(mask, z, 0.0)


def pcg_local(mesh: Mesh, S, L_l, Dd_l, iD_l, x_l, r_l, it: int,
              pallas: str, bf16: bool = False, op=None, perdir: tuple = ()):
    """PCG smoother body on a shard's local block (must run inside a
    shard_map region).  Same algebra as `ops.poisson.pcg` with the
    dead-mask early exits; dots are per-shard partials + psum."""
    D = x_l.ndim
    dt = x_l.dtype
    teneps = 10 * jnp.finfo(dt).eps
    names = _spatial_names(mesh)
    mask = ghost_mask_local(mesh, S, x_l.shape)
    if op is None:
        op = prep_local_op(mesh, L_l, Dd_l, D, pallas)

    def matvec(eps_l):
        # eps is per-filled at the loop top (dense pcg's bc_scalar_periodic
        # position) — no refill inside the matvec
        return local_mult(mesh, S, L_l, Dd_l, op,
                          eps_l.astype(dt), mask, pallas)

    def gdot(a, b):
        return jax.lax.psum(jnp.sum(a * b), names)

    def mask_int(a):
        return jnp.where(mask, a, 0).astype(a.dtype)

    z = r_l * iD_l
    eps = z.astype(jnp.bfloat16) if bf16 else z
    rho = gdot(r_l, z)
    dead = jnp.abs(rho) < teneps
    for i in range(it):
        if perdir:
            # fill BEFORE the axpy too: dense pcg's x += alpha*eps uses the
            # filled eps, so x's periodic ghosts carry the same (benign)
            # pollution — full-array parity with `ops.poisson.pcg`
            eps = per_fill_local(eps, mesh, S, perdir)
        z = matvec(eps)
        denom = gdot(z, eps.astype(dt))
        alpha = jnp.where(dead | (denom == 0), 0.0,
                          rho / jnp.where(denom == 0, 1.0, denom)).astype(dt)
        dead = dead | (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)
        upd = jnp.where(dead, 0.0, alpha).astype(dt)
        x_new = x_l + upd * eps
        r_new = r_l - upd * z
        x_l, r_l = x_new, r_new
        if i == it - 1:
            break
        z2 = r_l * iD_l
        rho2 = gdot(r_l, z2)
        dead = dead | (jnp.abs(rho2) < teneps)
        beta = jnp.where(dead, 0.0,
                         rho2 / jnp.where(rho == 0, 1.0, rho)).astype(dt)
        eps = mask_int(beta * eps.astype(dt) + z2)
        if bf16:
            eps = eps.astype(jnp.bfloat16)
        rho = jnp.where(dead, rho, rho2)
    return x_l, r_l


def shardmap_pcg(lev, x, r, it: int = 6, pallas: str | None = None):
    """Jacobi-preconditioned CG smoother with explicit collectives.

    Same algebra as `ops.poisson.pcg` with the dead-mask early exits;
    search directions in bf16 when ``lev.bf16_eps`` (same consistency
    argument — x and r are updated from the same rounded direction).
    """
    mesh = lev.mesh
    D = x.ndim
    S = x.shape
    sc, vec = spatial_specs(mesh, D)
    if pallas is None:
        pallas = _auto_pallas(mesh, S, x.dtype)

    def local(L_l, Dd_l, iD_l, x_l, r_l):
        return pcg_local(mesh, S, L_l, Dd_l, iD_l, x_l, r_l, it, pallas,
                         bf16=lev.bf16_eps, perdir=lev.perdir)

    fn = get_shard_map()(local, mesh=mesh,
                         in_specs=(vec, sc, sc, sc, sc),
                         out_specs=(sc, sc), check_vma=False)
    return fn(lev.L, lev.D, lev.iD, x, r)


def _local_shape(mesh: Mesh, S: tuple) -> tuple:
    names = _spatial_names(mesh)
    return tuple(S[k] // (mesh.shape[names[k]] if k < len(names) else 1)
                 for k in range(len(S)))


def _auto_pallas(mesh: Mesh, S: tuple, dtype, extra: int = 2) -> str:
    """Per-shard kernel dispatch default: the blocked Mosaic kernels on real
    TPU meshes when the halo-extended local block is kernel-sized, the XLA
    slice forms elsewhere (CPU/virtual meshes, tiny blocks)."""
    from ..ops.pallas_stencil import use_blocked
    loc = _local_shape(mesh, S)
    return ("compiled"
            if jax.default_backend() == "tpu"
            and use_blocked(tuple(s + extra for s in loc), dtype,
                            sharded=False)
            else "off")


def shardmap_increment(lev, x, r, eps, pallas: str | None = None):
    """Fused ``x += eps; r -= A·eps`` with explicit ppermute halos.

    The V-cycle's remaining fine-level stencils (the Jacobi pre-smooth and
    the prolongate-increment, reference src/Poisson.jl:99-113) run the same
    per-shard blocked kernel + halo protocol as `shardmap_pcg`, so a sharded
    step's whole smoother ladder is kernel-tier.  ``eps`` must be ghost-zero
    (the matvec fills periodic ghosts itself, like the dense `increment`)."""
    mesh = lev.mesh
    D = x.ndim
    S = x.shape
    sc, vec = spatial_specs(mesh, D)
    if pallas is None:
        pallas = _auto_pallas(mesh, S, x.dtype)

    def local(L_l, Dd_l, x_l, r_l, eps_l):
        return increment_local(mesh, S, L_l, Dd_l, x_l, r_l, eps_l, pallas,
                               perdir=lev.perdir)

    fn = get_shard_map()(local, mesh=mesh, in_specs=(vec, sc, sc, sc, sc),
                         out_specs=(sc, sc), check_vma=False)
    return fn(lev.L, lev.D, x, r, eps)


def increment_local(mesh: Mesh, S, L_l, Dd_l, x_l, r_l, eps_l, pallas: str,
                    op=None, perdir: tuple = ()):
    """``x += eps; r -= A·eps`` on a local block (inside shard_map)."""
    D = x_l.ndim
    mask = ghost_mask_local(mesh, S, x_l.shape)
    if op is None:
        op = prep_local_op(mesh, L_l, Dd_l, D, pallas)
    ae = local_mult(mesh, S, L_l, Dd_l, op, eps_l, mask, pallas, perdir)
    return x_l + eps_l, r_l - ae


def shardmap_residual(lev, x, z, pallas: str | None = None):
    """``r = z - A·x`` body-masked and mean-corrected (reference
    ``residual!``, src/Poisson.jl:91-97) with explicit collectives: one
    ppermute halo round, per-shard blocked kernel, and the solvability mean
    as per-shard partial sums + psum."""
    mesh = lev.mesh
    D = x.ndim
    S = x.shape
    sc, vec = spatial_specs(mesh, D)
    if pallas is None:
        pallas = _auto_pallas(mesh, S, x.dtype)

    def local(L_l, Dd_l, iD_l, x_l, z_l):
        return residual_local(mesh, S, L_l, Dd_l, iD_l, x_l, z_l, pallas,
                              perdir=lev.perdir)

    fn = get_shard_map()(local, mesh=mesh, in_specs=(vec, sc, sc, sc, sc),
                         out_specs=sc, check_vma=False)
    return fn(lev.L, lev.D, lev.iD, x, z)


def residual_local(mesh: Mesh, S, L_l, Dd_l, iD_l, x_l, z_l, pallas: str,
                   op=None, perdir: tuple = ()):
    """Body-masked, mean-corrected ``r = z - A·x`` on a local block."""
    from ..grid import inside_count
    D = x_l.ndim
    dt = x_l.dtype
    names = _spatial_names(mesh)
    cnt = inside_count(S)
    teps = 2 * jnp.finfo(dt).eps
    mask = ghost_mask_local(mesh, S, x_l.shape)
    if op is None:
        op = prep_local_op(mesh, L_l, Dd_l, D, pallas)
    ax_l = local_mult(mesh, S, L_l, Dd_l, op, x_l, mask, pallas, perdir)
    r_int = jnp.where(mask & (iD_l != 0), z_l - ax_l, 0.0).astype(dt)
    s = jax.lax.psum(jnp.sum(r_int), names) / cnt
    corr = jnp.where(jnp.abs(s) <= teps, 0.0, s).astype(dt)
    return jnp.where(mask, r_int - corr, 0.0).astype(dt)


def shardmap_conv_diff(mesh: Mesh, u, nu, limiter, pallas: str | None = None,
                       perdir: tuple = ()):
    """conv_diff with explicit collectives: width-2 ppermute halos (QUICK
    reads ``I-2δ``, reference src/Flow.jl:6) and per-shard flux evaluation
    with global-index boundary masks.

    Each device runs the blocked all-sweeps Pallas kernels on its
    halo-extended local block (``pallas='compiled'``, the default on real
    TPU meshes when the block is kernel-sized; 'interpret' exercises the
    composition on the virtual CPU mesh; 'off' = the XLA gather-form
    core).  Periodic directions ride MODULAR wrap halos (`halo_exchange`
    perdir=): the halo planes hold the ghost-band-skipping wrap values, so
    the per-shard flux is the uniform periodic formula — bitwise the
    reference's ϕuP wrap + top-face flux copy (src/Flow.jl:7,60; see the
    halo_exchange docstring for the equivalence).  Together with
    `shardmap_pcg` this covers both hot loops of the step with the kernel
    tier + source-visible communication.
    """
    D = u.shape[0]
    S = u.shape[1:]
    sc, vec = spatial_specs(mesh, D)
    if pallas is None:
        pallas = CONV_PALLAS
    if pallas is None:
        from ..ops.pallas_stencil import use_blocked
        loc = _local_shape(mesh, S)
        ext = tuple(s + 4 for s in loc)
        pallas = ("compiled"
                  if D == 3 and jax.default_backend() == "tpu"
                  and use_blocked(ext, u.dtype, sharded=False)
                  else "off")

    def local(u_l):
        return conv_diff_local(mesh, S, u_l, nu, limiter, pallas, perdir)

    fn = get_shard_map()(local, mesh=mesh, in_specs=(vec,), out_specs=vec,
                   check_vma=False)
    return fn(u)


def conv_diff_local(mesh: Mesh, S, u_l, nu, limiter, pallas: str,
                    perdir: tuple = ()):
    """conv_diff tendency on a shard's local block (inside shard_map):
    width-2 ppermute halos (modular wrap on periodic axes) + per-shard
    blocked kernels with global-index boundary masks (``base`` offsets).
    ``u_l``'s ghost planes must be periodic-filled on entry (the step's BC
    maintains this — the same contract as the dense path)."""
    from ..ops.convect import conv_core
    D = u_l.shape[0]
    loc = u_l.shape[1:]
    ax = _axis_shards(mesh, D)
    uh = halo_exchange(u_l, mesh, D, width=2, perdir=perdir)
    base = tuple(
        (jax.lax.axis_index(name) * (S[d] // k) if k > 1 else 0)
        for d, (name, k) in enumerate(ax))
    if pallas != "off":
        from ..ops.pallas_stencil import conv_diff3d_pallas
        r_ext = conv_diff3d_pallas(
            uh, nu, limiter, uh.shape[1:], S_glob=S,
            base=jnp.stack([jnp.int32(b) - 2 for b in base]),
            perdir=perdir, modular=True,
            interpret=(pallas == "interpret"))
        return r_ext[(slice(None),) + (slice(2, -2),) * D]
    return conv_core(uh, loc, S, base, nu, perdir, limiter, modular=True)
