"""Batched ensemble simulation via jax.vmap.

Beyond-parity capability: the whole measurement + level build + momentum
step is a pure function of the body parameter, so `jax.vmap` runs an
ensemble of simulations (a design sweep) as ONE compiled program on one
chip — something the reference's mutate-in-place architecture cannot
express (its `sim_step!` writes into a single Flow; WaterLily.jl has no
batch axis anywhere).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.flow import FlowConfig, flow_init, mom_step
from waterlily_tpu.body import AutoBody, measure_fields
from waterlily_tpu.metrics import total_force
from waterlily_tpu.ops.multigrid import build_levels

f64 = jnp.float64


def _make_force_fn(n_steps=2):
    """Force on a spinning cylinder after n_steps, as a pure fn of the
    spin ratio (mirrors the reference's spinning-cylinder setup,
    maintests.jl:263-277, but parameter-in/force-out)."""
    Dm, Re, U = 8, 500, 1.0
    R = Dm // 2
    S = (2 * Dm + 2, 2 * Dm + 2)

    def force(xi):
        xi = jnp.asarray(xi, f64)

        def sdf(x, t):
            return jnp.sqrt(jnp.sum(x * x)) - R

        def mp(x, t):
            a = xi * U * t / R
            s, c = jnp.sin(a), jnp.cos(a)
            Rm = jnp.array([[c, -s], [s, c]], x.dtype)
            return Rm @ (x - Dm)

        body = AutoBody(sdf, mp)
        cfg = FlowConfig(D=2, S=S, nu=U * Dm / Re, U=(U, 0.0), dtype=f64,
                         fixed_iters=1)
        state = flow_init(cfg)
        V, m0, m1, _ = measure_fields(body, S, 0.0, 1.0, (), False, f64)
        state = state._replace(V=V, mu0=m0, mu1=m1)
        levels = build_levels(m0)

        def step(s, _):
            s, _aux = mom_step(cfg, levels, s)
            return s, None

        state, _ = jax.lax.scan(step, state, None, length=n_steps)
        return total_force(state.u, state.p, cfg.nu, body, state.t)

    return force


def test_vmap_ensemble_matches_individual():
    """vmap over the body parameter == stacked per-member runs (bit-level:
    the batched program applies identical algebra per member)."""
    force = _make_force_fn()
    xis = jnp.asarray([0.5, 1.5, 3.0], f64)
    batched = jax.jit(jax.vmap(force))(xis)
    single = jax.jit(force)  # ONE program reused for every member
    singles = jnp.stack([single(x) for x in xis])
    assert batched.shape == (3, 2)
    assert np.allclose(np.asarray(batched), np.asarray(singles),
                       rtol=1e-12, atol=1e-12)
    # the sweep is physically meaningful: lift magnitude grows with spin
    lift = np.abs(np.asarray(batched)[:, 1])
    assert lift[0] < lift[-1]


@pytest.mark.skipif(os.environ.get("WATERLILY_NIGHTLY") != "1",
                    reason="trace-bound ~2 min on the 1-core CI box; "
                           "runs in the nightly tier")
def test_vmap_composes_with_grad():
    """A batched gradient sweep d(force_y)/d(xi) over the ensemble in one
    program — the optimize-everywhere composition (vmap ∘ grad ∘ solver)."""
    force = _make_force_fn(n_steps=1)
    gfn = jax.jit(jax.vmap(jax.grad(lambda x: force(x)[1])))
    xis = jnp.asarray([1.0, 2.0], f64)
    g = np.asarray(gfn(xis))
    assert g.shape == (2,)
    assert np.isfinite(g).all()


def test_vmap_grad_composes_with_implicit_diff():
    """Batched sensitivities with the implicit adjoint: vmap(grad) over nu
    through a step with the adaptive solve (custom_vjp) equals the per-
    member gradients — ensembles of ADJOINT solves in one program."""
    from waterlily_tpu.metrics import ke

    L = 8
    kappa = 2 * np.pi / L

    def ulam(i, x):
        return jnp.where(i == 0,
                         -jnp.sin(kappa * x[0]) * jnp.cos(kappa * x[1]),
                         jnp.cos(kappa * x[0]) * jnp.sin(kappa * x[1]))

    def ke_after(nu):
        cfg = FlowConfig(D=2, S=(L + 2, L + 2), nu=nu, U=(0.0, 0.0),
                         perdir=(0, 1), dtype=f64, tol=1e-12, itmx=64,
                         implicit_diff=True)
        state = flow_init(cfg, ulam)
        levels = build_levels(state.mu0, cfg.perdir)
        state, _ = mom_step(cfg, levels, state)
        return jnp.sum(ke(state.u))

    nus = jnp.asarray([0.005, 0.01, 0.02], f64)
    gb = np.asarray(jax.jit(jax.vmap(jax.grad(ke_after)))(nus))
    gs = np.asarray([jax.grad(ke_after)(n) for n in nus])
    assert np.isfinite(gb).all()
    assert np.allclose(gb, gs, rtol=1e-12), (gb, gs)
