"""Metrics tests — oracles from reference maintests.jl:318-370."""
import jax.numpy as jnp
import numpy as np

import waterlily_tpu as wl
from waterlily_tpu.grid import apply_field, loc_grid, l2
from waterlily_tpu.body import AutoBody
from waterlily_tpu.metrics import (ke, curl, omega, omega_mag, omega_theta,
                                   lambda2, strain_rate, pressure_force,
                                   viscous_force, pressure_moment)

f64 = jnp.float64


def setup_u():
    """u[i] = loc_i + prod(loc) on a (3,4,5) grid (maintests.jl:322)."""
    u = apply_field(lambda i, x: x[i] + jnp.prod(x), (3, 3, 4, 5), f64, vector=True)
    J = (1, 2, 3)  # reference CartesianIndex(2,3,4), 1-based
    x = np.asarray(loc_grid((3, 4, 5), None, f64)[J])
    return u, J, x, np.prod(x)


def test_ke():
    u, J, x, px = setup_u()
    p = ke(u)
    assert np.isclose(float(p[J]), 0.5 * np.sum((x + px) ** 2))
    p = ke(u, x)
    assert np.isclose(float(p[J]), 1.5 * px ** 2)


def test_lambda2():
    u, J, x, px = setup_u()
    p = lambda2(u)
    assert np.isclose(float(p[J]), 1.0, atol=1e-6)


def test_curl_omega():
    u, J, x, px = setup_u()
    w = np.cross(1.0 / x, np.repeat(px, 3))
    c = curl(1, u)
    assert np.isclose(float(c[J]), w[1])
    om = omega(u)
    assert np.allclose(np.asarray(om)[(slice(None),) + J], w)
    m = omega_mag(u)
    assert np.isclose(float(m[J]), np.sqrt(np.sum(w ** 2)))
    th = omega_theta(u, (0, 0, 1), x + np.array([0, 1, 2]))
    assert np.isclose(float(th[J]), w[0])


def test_l2_ones():
    p = apply_field(lambda x: 1.0, (3, 4, 5), f64)
    assert np.isclose(float(l2(p)), 1 * 2 * 3)


def test_pressure_force_hydrostatic():
    # maintests.jl:341-346: hydrostatic p=y on a circle -> force = area*ŷ
    N = 32
    p = apply_field(lambda x: x[1], (N, N), f64)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N // 4)
    force = np.asarray(pressure_force(p, body))
    assert np.sum(np.abs(force / (np.pi * (N / 4) ** 2) - np.array([0, 1]))) < 2e-3


def test_strain_rate():
    # maintests.jl:348-359
    N = 32
    u2 = jnp.zeros((2, N, N), f64)
    u3 = jnp.zeros((3, N, N, N), f64)
    mid2 = (N // 2 - 1,) * 2
    mid3 = (N // 2 - 1,) * 3
    assert np.allclose(np.asarray(strain_rate(u2))[(slice(None),) * 2 + mid2], 0)
    assert np.allclose(np.asarray(strain_rate(u3))[(slice(None),) * 2 + mid3], 0)
    u2 = apply_field(lambda i, x: x[i], (2, N, N), f64, vector=True)
    u3 = apply_field(lambda i, x: x[i], (3, N, N, N), f64, vector=True)
    assert np.allclose(np.asarray(strain_rate(u2))[(slice(None),) * 2 + mid2],
                       2 * np.eye(2))
    assert np.allclose(np.asarray(strain_rate(u3))[(slice(None),) * 2 + mid3],
                       2 * np.eye(3))
    u2 = apply_field(lambda i, x: x[(i + 1) % 2], (2, N, N), f64, vector=True)
    u3 = apply_field(lambda i, x: x[(i + 1) % 3], (3, N, N, N), f64, vector=True)
    assert np.allclose(np.asarray(strain_rate(u2))[(slice(None),) * 2 + mid2],
                       np.array([[0, 2], [2, 0]]))
    assert np.allclose(np.asarray(strain_rate(u3))[(slice(None),) * 2 + mid3],
                       np.ones((3, 3)) - np.eye(3))


def test_viscous_force_zero():
    # maintests.jl:361-363: zero velocity -> zero viscous force
    N = 32
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N // 4)
    assert np.allclose(np.asarray(viscous_force(jnp.zeros((2, N, N), f64), 1.0, body)), 0)
    assert np.allclose(np.asarray(viscous_force(jnp.zeros((3, N, N, N), f64), 1.0, body)), 0)


def test_force_sampling_variants():
    # The surface/extrap estimators (no reference analog; see
    # scripts/cd_estimators.py) must agree with the center estimator on
    # fields where all samplings are exact: multilinear interp AND linear
    # extrapolation reproduce linear fields exactly, so the hydrostatic
    # buoyancy oracle holds for every sampling, and a linear-shear velocity
    # (uniform strain rate) gives an identical viscous integrand everywhere.
    import pytest
    N = 32
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N // 4)
    p = apply_field(lambda x: x[1], (N, N), f64)
    for sampling in ("center", "surface", "extrap"):
        force = np.asarray(pressure_force(p, body, sampling=sampling))
        assert np.sum(np.abs(force / (np.pi * (N / 4) ** 2)
                             - np.array([0, 1]))) < 2e-3, sampling
    u = apply_field(lambda i, x: x[(i + 1) % 2], (2, N, N), f64, vector=True)
    ref = np.asarray(viscous_force(u, 0.7, body))
    for sampling in ("surface", "extrap"):
        v = np.asarray(viscous_force(u, 0.7, body, sampling=sampling))
        assert np.allclose(v, ref, atol=1e-8), sampling
    from waterlily_tpu.metrics import total_force
    tf = np.asarray(total_force(u, p, 0.7, body, sampling="extrap"))
    assert tf.shape == (2,) and np.all(np.isfinite(tf))
    with pytest.raises(ValueError):
        pressure_force(p, body, sampling="bogus")


def test_pressure_moment():
    # maintests.jl:365-368: hydrostatic pressure has no moment about center
    N = 32
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - N / 2) ** 2)) - N // 4)
    p2 = apply_field(lambda x: x[1], (N, N), f64)
    m2 = pressure_moment((N / 2, N / 2), p2, body)
    assert np.isclose(float(m2), 0.0, atol=1e-8)
    p3 = apply_field(lambda x: x[1], (N, N, N), f64)
    m3 = np.asarray(pressure_moment((N / 2, N / 2, N / 2), p3, body))
    assert np.allclose(m3, 0, atol=1e-7)
