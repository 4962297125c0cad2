"""Geometry tests — oracles from reference maintests.jl:183-230,304-316."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waterlily_tpu as wl
from waterlily_tpu.body import (AutoBody, Bodies, measure, sdf, mu0, mu1,
                                curvature, measure_sdf, measure_fields, kern0, kern1)
from waterlily_tpu.grid import loc_grid
from waterlily_tpu.simulation import Simulation
from waterlily_tpu.metrics import pressure_force

f64 = jnp.float64


def norm2(x):
    return jnp.sqrt(jnp.sum(x * x))


def test_kernel_moments():
    # maintests.jl:184-186
    assert np.isclose(float(mu0(3.0, 6.0)), float(mu0(0.5, 1.0)))
    assert np.isclose(float(mu0(0.0, 1.0)), 0.5)
    assert np.isclose(float(mu1(0.0, 2.0)), 2 * (0.25 - 1 / np.pi ** 2))


def approx_all(got, want, atol=1e-6):
    d, n, V = got
    dw, nw, Vw = want
    assert np.isclose(float(d), dw, atol=atol), (d, dw)
    assert np.allclose(np.asarray(n), nw, atol=atol), (n, nw)
    assert np.allclose(np.asarray(V), Vw, atol=atol), (V, Vw)


def test_measure_autodiff():
    # maintests.jl:190-197
    body1 = AutoBody(lambda x, t: norm2(x) - 2 - t)
    s = np.sqrt(0.5)
    approx_all(measure(body1, jnp.array([np.sqrt(2), np.sqrt(2)], f64), 0.0),
               (0.0, [s, s], [0.0, 0.0]))
    approx_all(measure(body1, jnp.array([2.0, 0.0, 0.0], f64), 1.0),
               (-1.0, [1, 0, 0], [0, 0, 0]))
    body2 = AutoBody(lambda x, t: norm2(x) - 2, lambda x, t: x + t ** 2)
    approx_all(measure(body2, jnp.array([np.sqrt(2), np.sqrt(2)], f64), 0.0),
               (0.0, [s, s], [0.0, 0.0]))
    approx_all(measure(body2, jnp.array([1.0, -1.0, -1.0], f64), 1.0),
               (0.0, [1, 0, 0], [-2, -2, -2]))


def test_measure_csg():
    # maintests.jl:199-206
    body1 = AutoBody(lambda x, t: norm2(x) - 2 - t)
    body2 = AutoBody(lambda x, t: norm2(x) - 2, lambda x, t: x + t ** 2)
    x = jnp.array([-np.sqrt(2), -np.sqrt(2)], f64)
    s2, s = np.sqrt(2), np.sqrt(0.5)
    approx_all(measure(body1 + body2, x, 1.0), (-s2, [-s, -s], [-2, -2]))
    approx_all(measure(body1.union(body2), x, 1.0), (-s2, [-s, -s], [-2, -2]))
    approx_all(measure(body1 - body2, x, 1.0), (s2, [s, s], [-2, -2]))
    # Bodies vs operator-composed
    approx_all(measure(Bodies([body1, body2]), x, 1.0),
               tuple(np.asarray(v) for v in measure(body1 + body2, x, 1.0)))
    approx_all(measure(Bodies([body1, body2], "-"), x, 1.0),
               tuple(np.asarray(v) for v in measure(body1 - body2, x, 1.0)))


def test_bodies_chain():
    # maintests.jl:208-213: nested ops equal flat Bodies on random points
    radii = [1.0, 0.75, 0.5, 0.25]
    circles = [AutoBody(lambda x, t, r=r: norm2(x) - r) for r in radii]
    body = circles[0] - circles[1] + circles[2] - circles[3]
    bodies = Bodies(circles, ["-", "+", "-"])
    xy = jnp.array(np.random.default_rng(1).uniform(size=2), f64)
    a = measure(body, xy, 1.0)
    b = measure(bodies, xy, 1.0)
    for va, vb in zip(a, b):
        assert np.allclose(np.asarray(va), np.asarray(vb))


def test_curvature():
    # maintests.jl:217-218
    H, K = curvature(jnp.eye(2))
    assert np.isclose(float(H), 1.0) and np.isclose(float(K), 0.0)
    H, K = curvature(jnp.array([[2., 1, 0], [1, 2, 1], [0, 1, 2]]))
    assert np.isclose(float(H), 3.0) and np.isclose(float(K), 10.0)


def test_measure_sdf():
    # maintests.jl:221-225
    body1 = AutoBody(lambda x, t: norm2(x) - 2 - t)
    p = measure_sdf(body1, (4, 5), dtype=f64)
    I = (1, 2)  # reference CartesianIndex(2,3), 1-based
    x = loc_grid((4, 5), None, f64)[I]
    assert np.isclose(float(p[I]), float(body1.sdf(x, 0.0)))


def test_fast_measure():
    # maintests.jl:227-229
    body1 = AutoBody(lambda x, t: norm2(x) - 2 - t)
    x = jnp.array([3.0, 4.0], f64)
    full = measure(body1, x, 0.0)
    fast9 = measure(body1, x, 0.0, fastd2=9.0)
    for va, vb in zip(full, fast9):
        assert np.allclose(np.asarray(va), np.asarray(vb))
    fast8 = measure(body1, x, 0.0, fastd2=8.0)
    assert np.isclose(float(fast8[0]), float(body1.sdf(x, 0.0)))
    assert np.allclose(np.asarray(fast8[1]), 0) and np.allclose(np.asarray(fast8[2]), 0)


def test_accelerating_circle():
    # maintests.jl:304-316: added-mass force of a circle in accelerating flow
    # (same 32-radii blockage as the reference; radius halved to keep the
    # 1-core CI suite fast — the coefficient stays within 1% of -pi)
    radius, H = 16, 16
    dims = (2 * H * radius, 2 * H * radius)
    body = AutoBody(lambda x, t: norm2(x - H * radius) - radius)
    sim = Simulation(dims, lambda i, t: t if i == 0 else 0.0 * t, radius, U=1,
                     body=body)
    sim.sim_step()
    force = np.asarray(pressure_force(sim.flow.p, sim.body, sim.time))
    assert np.allclose(force / (np.pi * sim.L ** 2), [-1, 0], atol=0.04)
    u = np.asarray(sim.flow.u)
    assert np.max(u) / u[0, 1, 1] > 1.80  # ≈ 2U slip at the surface (r=16 res)
    for _ in range(3):
        sim.sim_step()
    pn = np.stack(sim.pois_n)
    assert np.all(pn <= 2)
    assert not np.any(np.isnan(pn))
