"""Spatial domain decomposition over a JAX device mesh.

The reference is single-device only (multi-GPU is unmerged upstream work,
README.md:157) — this module is the TPU-native scaling path it lacks:
fields are sharded along spatial axes of a `jax.sharding.Mesh`, the jitted
step runs under GSPMD, and XLA inserts the halo exchanges for the stencil
shifts and the collectives for the solver dot products automatically over
ICI.  Coarse multigrid levels whose interiors are smaller than the mesh are
replicated (their work is negligible; this keeps the per-level collectives
cheap).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..flow import FlowState

__all__ = ["make_mesh", "state_shardings", "shard_state", "shard_levels",
           "sharded_step_fn"]


def make_mesh(n: int | None = None, devices=None, axes=("x",)) -> Mesh:
    """1D (or multi-D) device mesh over the first ``n`` devices."""
    if devices is None:
        devices = jax.devices()
        if n is not None:
            devices = devices[:n]
    devices = np.asarray(devices)
    if len(axes) > 1:
        # factor the device count as evenly as possible across axes
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
    """PartitionSpec sharding spatial axis k over mesh axis k (as available)."""
    names = list(mesh.axis_names)
    spec = [None] * lead + [names[k] if k < len(names) else None for k in range(D)]
    return P(*spec)


def state_shardings(mesh: Mesh, D: int) -> FlowState:
    """Shardings for every FlowState leaf: spatial axes over the mesh,
    scalars replicated."""
    sc = NamedSharding(mesh, _spatial_spec(mesh, D, 0))
    vec = NamedSharding(mesh, _spatial_spec(mesh, D, 1))
    ten = NamedSharding(mesh, _spatial_spec(mesh, D, 2))
    rep = NamedSharding(mesh, P())
    return FlowState(u=vec, p=sc, V=vec, mu0=vec, mu1=ten, dt=rep, t=rep)


def shard_state(state: FlowState, mesh: Mesh) -> FlowState:
    D = state.u.shape[0]
    return jax.device_put(state, state_shardings(mesh, D))


def shard_levels(levels: tuple, mesh: Mesh, min_per_shard: int = 2) -> tuple:
    """Place multigrid levels: sharded while every sharded spatial dim has at
    least ``min_per_shard`` interior cells per device, replicated below."""
    out = []
    names = list(mesh.axis_names)
    for lev in levels:
        S = lev.D.shape
        ok = all((S[k] - 2) >= min_per_shard * mesh.shape[names[k]]
                 for k in range(min(len(names), len(S))))
        if ok:
            D = lev.L.shape[0]
            sh_sc = NamedSharding(mesh, _spatial_spec(mesh, len(S), 0))
            sh_vec = NamedSharding(mesh, _spatial_spec(mesh, len(S), 1))
            out.append(lev.replace(L=jax.device_put(lev.L, sh_vec),
                                   D=jax.device_put(lev.D, sh_sc),
                                   iD=jax.device_put(lev.iD, sh_sc)))
        else:
            rep = NamedSharding(mesh, P())
            out.append(jax.device_put(lev, rep))
    return tuple(out)


def sharded_step_fn(cfg, mesh: Mesh):
    """Jitted momentum step with explicit input/output shardings.

    GSPMD partitions the stencils (halo exchange via collective-permute on
    ICI) and the reductions (psum) automatically from these annotations.
    """
    from ..flow import mom_step

    sh = state_shardings(mesh, cfg.D)

    def step(state, levels):
        new, aux = mom_step(cfg, levels, state)
        return new, aux

    return jax.jit(step, out_shardings=(sh, None))
