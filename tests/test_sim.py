"""Simulation API + moving-body tests — oracles from maintests.jl:372-413
and the forward-differentiability tests (:254-278) via jax.jvp."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waterlily_tpu as wl
from waterlily_tpu.body import AutoBody
from waterlily_tpu.grid import l2
from waterlily_tpu.metrics import total_force, ke
from waterlily_tpu.simulation import Simulation

f32 = jnp.float32


def norm2(x):
    return jnp.sqrt(jnp.sum(x * x))


RADIUS = 8
NU = RADIUS / 250
NM = (4 * RADIUS, 4 * RADIUS)


def circle(x, t):
    return norm2(x - 2 * RADIUS) - RADIUS


def plate(x, t):
    c = jnp.clip(x[0], -RADIUS + 2, RADIUS - 2)
    return norm2(x - jnp.array([c, 0.0], x.dtype)) - 2


def test_sim_time_and_stop():
    # maintests.jl:387-390
    sim = Simulation(NM, (1, 0), RADIUS, body=AutoBody(circle), nu=NU, dtype=f32)
    assert sim.sim_time == 0
    sim.sim_step(0.1, remeasure=False)
    assert sim.sim_time >= 0.1
    assert 0.1 > sum(sim.dts[:-2]) * sim.U / sim.L


@pytest.mark.parametrize("exitBC", [True, False])
def test_moving_body_translating(exitBC):
    # translating circle with V = U = 1: the flow stays uniform (maintests.jl:392-395)
    move = lambda x, t: x - jnp.array([t, 0.0], x.dtype)
    sim = Simulation(NM, (1, 0), RADIUS, body=AutoBody(circle, move), nu=NU,
                     dtype=f32, exitBC=exitBC)
    sim.sim_step()
    u = np.asarray(sim.flow.u)
    assert np.allclose(u[0, :, RADIUS - 1], 1, atol=1e-4)

    # accelerating from U=0 to U=1 (maintests.jl:397-401)
    accel = lambda x, t: x - jnp.array([2 * t ** 2, 0.0], x.dtype)
    sim = Simulation(NM, (0, 0), RADIUS, U=1, body=AutoBody(circle, accel),
                     nu=NU, dtype=f32, exitBC=exitBC)
    sim.sim_step()
    assert list(sim.pois_n[0]) == [2, 1]
    assert float(jnp.max(sim.flow.u)) > float(jnp.max(sim.flow.V)) > 0


def test_moving_body_deforming():
    # rotating/bending plates exercise non-uniform and divergent body
    # velocity; exitBC interaction is covered by the translating cases
    # above (each distinct (body, exitBC) program costs ~3 s of
    # trace+lower+AOT-load on the 1-core CI box)

    # rotating plate: non-uniform body velocity (maintests.jl:403-406)
    def rotate(x, t):
        a = t / RADIUS + 1
        s, c = jnp.sin(a), jnp.cos(a)
        R = jnp.array([[c, s], [-s, c]], x.dtype)
        return R @ (x - 2 * RADIUS)

    sim = Simulation(NM, (0, 0), RADIUS, U=1, body=AutoBody(plate, rotate),
                     nu=NU, dtype=f32)
    sim.sim_step()
    assert list(sim.pois_n[0]) == [2, 1]
    assert 1 > sim.dts[-1] > 0.5

    # bending plate: divergent body velocity (maintests.jl:408-411)
    def bend(xy, t):
        x, y = xy[0] - 2 * RADIUS, xy[1] - 2 * RADIUS
        k = 2 * t / RADIUS ** 2 + 0.2 / RADIUS
        return jnp.stack([x + x ** 3 * k ** 2 / 6, y - x ** 2 * k / 2])

    sim = Simulation(NM, (0, 0), RADIUS, U=1, body=AutoBody(plate, bend),
                     nu=NU, dtype=f32)
    sim.sim_step()
    assert list(sim.pois_n[0]) == [2, 1]
    assert 1.2 > sim.dts[-1] > 0.8


def tgv_ke(Re):
    """Total KE of a short TGV run as a function of Re (maintests.jl:255-258)."""
    L = 64
    kappa = 2 * np.pi / L
    nu = 1 / (kappa * Re)

    def ulam(i, x):
        xs, ys = x[0] * kappa, x[1] * kappa
        return jnp.where(i == 0, -jnp.sin(xs) * jnp.cos(ys), jnp.cos(xs) * jnp.sin(ys))

    sim = Simulation((L, L), (0, 0), L, U=1, nu=nu, perdir=(0, 1),
                     ulam=ulam, dtype=jnp.float64)
    sim.sim_step(np.pi / 100)
    return float(jnp.sum(wl.ke(sim.flow.u)))


def test_grad_ke_wrt_re():
    """d(KE)/d(Re) via jax.jvp matches finite differences (maintests.jl:260-261).

    The reference uses ForwardDiff through the whole solver; here the jitted
    step (while_loop included) is forward-differentiated.  L=32 keeps the
    traced program small (the oracle is jvp==FD of the same program, not an
    accuracy target)."""
    L = 32
    kappa = 2 * np.pi / L

    def ke_of_re(Re):
        nu = 1 / (kappa * Re)

        def ulam(i, x):
            xs, ys = x[0] * kappa, x[1] * kappa
            return jnp.where(i == 0, -jnp.sin(xs) * jnp.cos(ys),
                             jnp.cos(xs) * jnp.sin(ys))

        from waterlily_tpu.flow import FlowConfig, flow_init, mom_step
        from waterlily_tpu.ops.multigrid import build_levels
        cfg = FlowConfig(D=2, S=(L + 2, L + 2), nu=0.0, U=(0, 0),
                         perdir=(0, 1), dtype=jnp.float64)
        state = flow_init(cfg, ulam)
        levels = build_levels(state.mu0, cfg.perdir)

        # nu enters through the traced closure: rebuild cfg-free step
        def step(state, nu):
            cfg_nu = cfg._replace(nu=nu)
            s, _ = mom_step(cfg_nu, levels, state)
            return s

        t_end = np.pi / 100
        def cond(c):
            s, k = c
            return (s.t < t_end) & (k < 50)
        def body(c):
            s, k = c
            return step(s, nu), k + 1
        state, _ = jax.lax.while_loop(cond, body, (state, 0))
        return jnp.sum(ke(state.u))

    re0 = 100.0
    # ONE jitted jvp program serves the derivative and (via its primal
    # output) both finite-difference probes — distinct programs dominate
    # suite wall time on the 1-core CI box
    jv = jax.jit(lambda Re: jax.jvp(ke_of_re, (Re,), (jnp.ones((), jnp.float64),)))
    _, dke = jv(re0)
    fd = (jv(re0 + 1.0)[0] - jv(re0 - 1.0)[0]) / 2
    assert np.isclose(float(dke), float(fd), rtol=1e-1)


def test_grad_lift_wrt_spin():
    """d(lift)/d(spin ratio) for a spinning cylinder via jax.jvp matches
    finite differences (maintests.jl:263-277) — differentiates through the
    BDIM body measurement (jax.grad sdf normals + map Jacobians) and the
    full predictor/corrector multigrid solver."""
    from waterlily_tpu.flow import FlowConfig, flow_init, mom_step
    from waterlily_tpu.body import AutoBody, measure_fields
    from waterlily_tpu.ops.multigrid import build_levels

    Dm, Re, U = 8, 500, 1.0
    C, R = float(2 * Dm) / 2, Dm // 2

    def lift(xi, t_end=0.5):
        xi = jnp.asarray(xi, jnp.float64)

        def sdf(x, t):
            return jnp.sqrt(jnp.sum(x * x)) - R

        def mp(x, t):
            a = xi * U * t / R
            s, c = jnp.sin(a), jnp.cos(a)
            Rm = jnp.array([[c, -s], [s, c]], x.dtype)
            return Rm @ (x - Dm)

        body = AutoBody(sdf, mp)
        S = (2 * Dm + 2, 2 * Dm + 2)
        cfg = FlowConfig(D=2, S=S, nu=U * Dm / Re, U=(U, 0.0),
                         dtype=jnp.float64)
        state = flow_init(cfg)
        V, m0, m1, _ = measure_fields(body, S, 0.0, 1.0, (), False, cfg.dtype)
        state = state._replace(V=V, mu0=m0, mu1=m1)
        levels = build_levels(m0)

        def cond(c):
            s, k = c
            return (s.t * U / Dm < t_end) & (k < 60)

        def body_fn(c):
            s, k = c
            s, _ = mom_step(cfg, levels, s)
            return s, k + 1

        state, _ = jax.lax.while_loop(cond, body_fn, (state, 0))
        # total force (pressure + viscous), y-component, normalized
        from waterlily_tpu.metrics import total_force
        f = total_force(state.u, state.p, cfg.nu, body, state.t)
        return f[1] / (xi ** 2 * U ** 2 * Dm)

    xi0 = 2.0
    # one jitted jvp program: derivative + primal for both FD probes
    jv = jax.jit(lambda xi: jax.jvp(lift, (xi,), (jnp.ones((), jnp.float64),)))
    _, dlift = jv(xi0)
    h = 1e-6
    fd = (jv(xi0 + h)[0] - jv(xi0 - h)[0]) / (2 * h)
    assert np.isclose(float(dlift), float(fd), rtol=np.sqrt(h) * 10)
