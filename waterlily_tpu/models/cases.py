"""Canonical simulation cases (the reference README + benchmark configs).

These are the "model family" entry points of the framework: each returns a
ready-to-run `Simulation` for a standard flow, mirroring the reference's
example/benchmark setups (README.md:41-51,118-125; BASELINE.md configs).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..body import AutoBody
from ..simulation import Simulation

__all__ = ["circle_2d", "tgv_2d", "tgv_3d", "sphere_3d", "donut_3d",
           "oscillating_plate_2d", "heaving_sphere_3d"]


def _norm2(x):
    return jnp.sqrt(jnp.sum(x * x))


def circle_2d(n=96, m=64, Re=100, U=1, dtype=jnp.float32, **kw):
    """Flow past a 2D circle (reference README.md:41-51)."""
    radius, center = m / 8, m / 2 - 1
    body = AutoBody(lambda x, t: _norm2(x - center) - radius)
    return Simulation((n, m), (U, 0), 2 * radius, nu=U * 2 * radius / Re,
                      body=body, dtype=dtype, **kw)


def tgv_2d(L=64, Re=1e5, dtype=jnp.float32, **kw):
    """2D Taylor-Green vortex, fully periodic (reference maintests.jl:232-243)."""
    kappa = 2 * np.pi / L
    nu = 1 / (kappa * Re)

    def ulam(i, x):
        xs, ys = x[0] * kappa, x[1] * kappa
        if i == 0:
            return -jnp.sin(xs) * jnp.cos(ys)
        return jnp.cos(xs) * jnp.sin(ys)

    return Simulation((L, L), (0, 0), L, U=1, nu=nu, perdir=(0, 1),
                      ulam=ulam, dtype=dtype, **kw)


def tgv_3d(L=32, Re=1600, dtype=jnp.float32, **kw):
    """3D Taylor-Green vortex, fully periodic — the classic transition-to-
    turbulence benchmark (structural extension of the reference's 2D TGV)."""
    kappa = 2 * np.pi / L
    nu = 1 / (kappa * Re)

    def ulam(i, x):
        xs, ys, zs = x[0] * kappa, x[1] * kappa, x[2] * kappa
        if i == 0:
            return jnp.sin(xs) * jnp.cos(ys) * jnp.cos(zs)
        if i == 1:
            return -jnp.cos(xs) * jnp.sin(ys) * jnp.cos(zs)
        return jnp.zeros_like(xs)

    return Simulation((L, L, L), (0, 0, 0), L, U=1, nu=nu, perdir=(0, 1, 2),
                      ulam=ulam, dtype=dtype, **kw)


def heaving_sphere_3d(radius=8, amp=None, St=0.3, Re=250, U=1,
                      dtype=jnp.float32, **kw):
    """Heaving sphere — the 3D moving-body BDIM path (per-step remeasure
    with a time-dependent map, 3D analog of the oscillating plate)."""
    amp = radius if amp is None else amp
    f = St * U / (2 * amp)
    center = 2 * radius

    def sdf(x, t):
        return _norm2(x) - radius

    def map(x, t):
        y = amp * jnp.sin(2 * jnp.pi * f * t)
        return x - jnp.array([center, center + y, center], x.dtype)

    body = AutoBody(sdf, map)
    return Simulation((4 * radius, 4 * radius, 4 * radius), (U, 0, 0),
                      2 * radius, nu=U * 2 * radius / Re, body=body,
                      dtype=dtype, **kw)


def sphere_3d(n=96, m=64, Re=100, U=1, dtype=jnp.float32, **kw):
    """Flow past a 3D sphere (reference README.md:118-125).

    ``sphere_3d(3*2**5, 2**6)`` reproduces the reference's 1.3M-DOF GPU
    benchmark config; 256³ is the BASELINE north-star config."""
    radius, center = m / 8, m / 2 - 1
    body = AutoBody(lambda x, t: _norm2(x - center) - radius)
    return Simulation((n, m, m), (U, 0, 0), 2 * radius,
                      nu=U * 2 * radius / Re, body=body, dtype=dtype, **kw)


def donut_3d(n=64, Re=1e3, U=1, dtype=jnp.float32, **kw):
    """Flow through a 3D torus (BASELINE config; WaterLily-Examples donut)."""
    center, R, r = n / 2 - 1, n / 4, n / 16
    def sdf(x, t):
        y = x - center
        q = jnp.sqrt(y[1] ** 2 + y[2] ** 2) - R
        return jnp.sqrt(q ** 2 + y[0] ** 2) - r
    body = AutoBody(sdf)
    return Simulation((2 * n, n, n), (U, 0, 0), R, nu=U * R / Re, body=body,
                      dtype=dtype, **kw)


def oscillating_plate_2d(L=32, amp=None, St=0.3, Re=250, U=1,
                         dtype=jnp.float32, **kw):
    """Heaving flat plate — the moving-body BDIM benchmark (remeasure path)."""
    amp = L / 2 if amp is None else amp
    f = St * U / (2 * amp)

    def sdf(x, t):
        c = jnp.clip(x[0], -L / 2 + 2, L / 2 - 2)
        return _norm2(x - jnp.array([c, 0.0], x.dtype)) - 2

    def map(x, t):
        y = amp * jnp.sin(2 * jnp.pi * f * t)
        return x - jnp.array([2 * L, 2 * L + y], x.dtype)

    body = AutoBody(sdf, map)
    return Simulation((4 * L, 4 * L), (U, 0), L, nu=U * L / Re, body=body,
                      dtype=dtype, **kw)
