"""Flow integrator tests — oracles from reference maintests.jl:119-181,232-302."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waterlily_tpu as wl
from waterlily_tpu.grid import l2, apply_field
from waterlily_tpu.flow import FlowConfig, flow_init, mom_step
from waterlily_tpu.ops.convect import quick, vanleer, median3, accelerate
from waterlily_tpu.ops.multigrid import build_levels
from waterlily_tpu.simulation import Simulation

f32 = jnp.float32


def test_vanleer():
    # maintests.jl:121-123
    assert float(vanleer(1.0, 0.0, 1.0)) == 0.0
    assert float(vanleer(1.0, 2.0, 1.0)) == 2.0
    assert float(vanleer(1.0, 2.0, 3.0)) == 2.5
    assert float(vanleer(3.0, 2.0, 1.0)) == 1.5


def test_quick_boundary_scheme():
    """QUICK flux selection at walls (maintests.jl:126-138) checked through
    conv_diff on a 1D x-profile: wall faces use central difference (ϕuL/ϕuR),
    interior faces the QUICK limiter, tendency = gathered flux difference."""
    assert float(quick(0.0, 0.5, 2.0)) == float(median3((5 * 0.5 + 2 * 2 - 0) / 6, 0.5,
                                                        median3(10 * 0.5 - 0, 0.5, 2.0)))
    prof = np.array([0.0, 0.5, 2.0, 1.0])
    u = jnp.stack([jnp.tile(jnp.asarray(prof)[:, None], (1, 4)),
                   jnp.zeros((4, 4))]).astype(jnp.float64)
    r = wl.conv_diff(u, nu=0.0)
    w = 0.5 * (prof[1:] + prof[:-1])        # face velocities, all positive
    F1 = w[0] * 0.5 * (prof[0] + prof[1])                    # ϕuL -> CD
    F2 = w[1] * float(quick(prof[0], prof[1], prof[2]))      # interior QUICK
    F3 = w[2] * float(quick(prof[1], prof[2], prof[3]))      # ϕuR, w>0 -> QUICK
    assert np.isclose(float(r[0, 1, 2]), F1 - F2)
    assert np.isclose(float(r[0, 2, 2]), F2 - F3)


def test_conv_diff_uniform_flow():
    """A uniform velocity field must produce zero momentum tendency."""
    for D in (2, 3):
        S = (8,) * D
        u = jnp.ones((D,) + S, f32) * jnp.arange(1, D + 1, dtype=f32).reshape(
            (D,) + (1,) * D)
        r = wl.conv_diff(u, nu=0.1)
        assert np.allclose(np.asarray(r[(slice(None),) + (slice(1, -1),) * D]), 0,
                           atol=1e-5)


def test_accelerate():
    # maintests.jl:161-170
    a = jnp.zeros((2, 4, 4), f32)
    out = accelerate(a, 1.0, None, (0.0, 0.0), f32)
    assert np.all(np.asarray(out) == 0)
    out = accelerate(a, 1.0, lambda i, t: t if i == 0 else 2 * t, (0.0, 0.0), f32)
    assert np.all(np.asarray(out[0]) == 1) and np.all(np.asarray(out[1]) == 2)
    out = accelerate(a, 1.0, None, lambda i, t: -t if i == 0 else -2 * t, f32)
    assert np.allclose(np.asarray(out[0]), -1) and np.allclose(np.asarray(out[1]), -2)
    out = accelerate(a, 1.0, lambda i, t: t if i == 0 else 2 * t,
                     lambda i, t: -t if i == 0 else -2 * t, f32)
    assert np.allclose(np.asarray(out), 0)


def test_impulsive_flow():
    # maintests.jl:172-180: uniform impulsive flow stays uniform after a step
    U = (2 / 3, -1 / 3)
    N = (16, 16)
    cfg = FlowConfig(D=2, S=(18, 18), U=U, dtype=f32)
    state = flow_init(cfg)
    levels = build_levels(state.mu0)
    state, aux = jax.jit(lambda s, l: mom_step(cfg, l, s))(state, levels)
    u = np.asarray(state.u)
    assert float(l2(jnp.asarray(u[0] - U[0]))) < 2e-5
    assert float(l2(jnp.asarray(u[1] - U[1]))) < 1e-5


def tgv_sim(Re=1e8, T=f32, L=64):
    kappa = 2 * np.pi / L
    nu = 1 / (kappa * Re)

    def TGV(i, xy, t):
        x, y = xy[0] * kappa, xy[1] * kappa
        decay = jnp.exp(-2 * kappa ** 2 * nu * t)
        if i == 0:
            return -jnp.sin(x) * jnp.cos(y) * decay
        return jnp.cos(x) * jnp.sin(y) * decay

    sim = Simulation((L, L), (0, 0), L, U=1, nu=nu, dtype=T, perdir=(0, 1),
                     ulam=lambda i, x: TGV(i, x, 0.0))
    return sim, TGV


def test_tgv_decay():
    # maintests.jl:244-253: 2D Taylor-Green vortex vs analytic decay
    sim, TGV = tgv_sim()
    sim.sim_step(np.pi / 100)
    t = sim.time
    S = sim.cfg.S
    ue = apply_field(lambda i, x: TGV(i, x, t), (2,) + S, f32, vector=True)
    u = sim.flow.u
    assert float(l2(u[0] - ue[0])) < 1e-4
    assert float(l2(u[1] - ue[1])) < 1e-4


def test_accelerating_flow():
    # maintests.jl:280-302: constant jerk, exact u = u0 + 0.5*jerk*t^2
    N, jerk = 8, 4
    Uscale = np.sqrt(N)
    g = lambda i, t: t * jerk if i == 0 else 0.0
    sim = Simulation((N, N), (Uscale, 0.0), N, nu=0.001, g=g, dt=0.001,
                     perdir=(0,), dtype=jnp.float64)
    sim.sim_step(1.0)
    u = np.asarray(sim.flow.u)
    uFinal = Uscale + 0.5 * jerk * sim.time ** 2
    assert float(l2(jnp.asarray(u[0] - uFinal))) < 1e-4
    assert float(l2(jnp.asarray(u[1]))) < 1e-4
