"""Spatial domain decomposition over a JAX device mesh (GSPMD path).

The reference is single-device only (multi-GPU is unmerged upstream work,
README.md:157) — this module is the TPU-native scaling path it lacks.
Fields are annotated with `with_sharding_constraint` along spatial mesh
axes *inside* the jitted step; XLA's SPMD partitioner then inserts the halo
exchanges for stencil shifts and the psum collectives for solver dot
products over ICI automatically.

Ghost-padded shapes (N+2) are never divisible by the mesh, so constraints
(which tolerate uneven shards via padding) are used instead of explicit
input shardings.  Coarse multigrid levels whose interiors are smaller than
the mesh are constrained to replicated — their work is negligible and this
keeps per-V-cycle collectives cheap.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..flow import FlowState, mom_step

__all__ = ["make_mesh", "state_specs", "constrain_state", "constrain_levels",
           "sharded_step_fn", "sharded_scan_fn"]


def make_mesh(n: int | None = None, devices=None, axes=("x",)) -> Mesh:
    """1D (or multi-D) device mesh over the first ``n`` devices."""
    if devices is None:
        devices = jax.devices()
        if n is not None:
            devices = devices[:n]
    devices = np.asarray(devices)
    if len(axes) > 1:
        n = devices.size
        dims = []
        for _ in axes[:-1]:
            f = 1
            for c in range(int(np.sqrt(n)), 0, -1):
                if n % c == 0:
                    f = c
                    break
            dims.append(f)
            n //= f
        dims.append(n)
        devices = devices.reshape(dims)
    return Mesh(devices, axes)


def _spatial_spec(mesh: Mesh, D: int, lead: int) -> P:
    names = list(mesh.axis_names)
    return P(*([None] * lead + [names[k] if k < len(names) else None
                                for k in range(D)]))


def state_specs(mesh: Mesh, D: int) -> FlowState:
    sc = NamedSharding(mesh, _spatial_spec(mesh, D, 0))
    vec = NamedSharding(mesh, _spatial_spec(mesh, D, 1))
    ten = NamedSharding(mesh, _spatial_spec(mesh, D, 2))
    rep = NamedSharding(mesh, P())
    return FlowState(u=vec, p=sc, V=vec, mu0=vec, mu1=ten, dt=rep, t=rep,
                     bbox=rep)


def constrain_state(state: FlowState, mesh: Mesh) -> FlowState:
    """Pin every state leaf to its spatial sharding (inside jit)."""
    D = state.u.shape[0]
    return jax.lax.with_sharding_constraint(state, state_specs(mesh, D))


def constrain_levels(levels: tuple, mesh: Mesh, min_per_shard: int = 2) -> tuple:
    """Pin multigrid levels: sharded while every sharded spatial dim keeps at
    least ``min_per_shard`` interior cells per device, replicated below.

    Every returned level is marked ``sharded`` (and un-``blocked``): Pallas
    Mosaic calls cannot be partitioned by GSPMD, so all Pallas dispatch must
    stay off in a spatially-decomposed program — even for levels the caller
    built without the flag."""
    out = []
    names = list(mesh.axis_names)
    for lev in levels:
        S = lev.D.shape
        lev = lev.replace(sharded=True, blocked=False, banded=False,
                          box_shape=None, box_start=None)
        ok = all((S[k] - 2) >= min_per_shard * mesh.shape[names[k]]
                 for k in range(min(len(names), len(S))))
        if ok:
            sh_sc = NamedSharding(mesh, _spatial_spec(mesh, len(S), 0))
            sh_vec = NamedSharding(mesh, _spatial_spec(mesh, len(S), 1))
            out.append(lev.replace(
                L=jax.lax.with_sharding_constraint(lev.L, sh_vec),
                D=jax.lax.with_sharding_constraint(lev.D, sh_sc),
                iD=jax.lax.with_sharding_constraint(lev.iD, sh_sc)))
        else:
            rep = NamedSharding(mesh, P())
            out.append(jax.lax.with_sharding_constraint(lev, rep))
    return tuple(out)


def sharded_step_fn(cfg, mesh: Mesh):
    """Jitted momentum step with spatial-decomposition constraints."""
    cfg = cfg._replace(sharded=True)

    def step(state, levels):
        state = constrain_state(state, mesh)
        levels = constrain_levels(levels, mesh)
        new, aux = mom_step(cfg, levels, state)
        return constrain_state(new, mesh), aux

    return jax.jit(step)


def sharded_scan_fn(cfg, mesh: Mesh):
    """Jitted n-step scan under spatial decomposition (no host sync)."""
    cfg = cfg._replace(sharded=True)

    def steps(state, levels, n):
        state = constrain_state(state, mesh)
        levels = constrain_levels(levels, mesh)

        def body(s, _):
            s, aux = mom_step(cfg, levels, s)
            return constrain_state(s, mesh), aux["pois_n"]

        state, pois = jax.lax.scan(body, state, None, length=n)
        return state, pois

    return jax.jit(steps, static_argnums=(2,))
