"""Reverse-mode differentiability through the whole solver.

The reference is forward-mode only (ForwardDiff duals, maintests.jl:254-278);
`FlowConfig(fixed_iters=k)` statically unrolls the pressure solve so
`jax.grad` flows through the full predictor/corrector step — the TPU build's
beyond-parity differentiator (adjoint optimization, flow control, shape
gradients).

All differentiated parameters enter as *traced* jit arguments so the
value/grad programs compile once each (re-used across the finite-difference
probes) — compile time dominates on the 1-core CI box.
"""
import jax
import jax.numpy as jnp
import numpy as np

from waterlily_tpu.flow import FlowConfig, flow_init, mom_step
from waterlily_tpu.ops.multigrid import build_levels, ml_solve

f64 = jnp.float64
# one TGV period on the smallest 2-MG-level grid: the grad==FD==jvp oracle
# is grid-size-invariant.  Measured: these tests are trace/transpose-bound
# (~30 s each on the 1-core CI box) and nearly size-INDEPENDENT — 16^2 with
# 3 MG levels costs within 2 s of 8^2 with 2 — so this is their floor.
L = 8
KAPPA = 2 * np.pi / L


def _tgv_ulam(i, x):
    xs, ys = x[0] * KAPPA, x[1] * KAPPA
    return jnp.where(i == 0, -jnp.sin(xs) * jnp.cos(ys),
                     jnp.cos(xs) * jnp.sin(ys))


def _ke_after(nu, n_steps=2, fixed=1):
    # fixed_iters=1: the oracle (grad == FD == jvp of the SAME program) is
    # invariant to solver depth, while the traced/transposed program — the
    # dominant wall time on the 1-core CI box — halves vs fixed=2.
    cfg = FlowConfig(D=2, S=(L + 2, L + 2), nu=nu, U=(0.0, 0.0),
                     perdir=(0, 1), dtype=f64, fixed_iters=fixed)
    state = flow_init(cfg, _tgv_ulam)
    levels = build_levels(state.mu0, cfg.perdir)

    def body(s, _):
        s, _aux = mom_step(cfg, levels, s)
        return s, None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    from waterlily_tpu.metrics import ke
    return jnp.sum(ke(state.u))


def test_fixed_iters_matches_adaptive():
    """The statically-unrolled solve reaches the same answer as the
    while_loop solve when given the iterations the adaptive path used."""
    cfg = FlowConfig(D=2, S=(L + 2, L + 2), nu=0.01, U=(0.0, 0.0),
                     perdir=(0, 1), dtype=f64)
    state = flow_init(cfg, _tgv_ulam)
    levels = build_levels(state.mu0, cfg.perdir)
    from waterlily_tpu.flow import div
    z = div(state.u)
    x0 = jnp.zeros_like(state.p)
    xa, ra, na = jax.jit(lambda: ml_solve(levels, x0, z))()
    n = int(na)
    xf, rf, nf = jax.jit(lambda: ml_solve(levels, x0, z, fixed=n))()
    assert int(nf) == n
    assert np.allclose(np.asarray(xa), np.asarray(xf), atol=1e-12)


def test_reverse_grad_ke_wrt_nu():
    """d(KE)/d(nu) by jax.grad through 2 full steps (scan + unrolled
    multigrid) matches central finite differences, and equals the
    forward-mode (jvp) directional derivative."""
    nu0 = 1.0 / (KAPPA * 100.0)
    # ONE compiled program serves both the gradient and the FD value probes
    # (value_and_grad; the probes discard the grad output) — each distinct
    # program costs seconds of trace+lower+AOT-load on the 1-core CI box.
    vg = jax.jit(jax.value_and_grad(_ke_after))
    g = float(vg(jnp.asarray(nu0, f64))[1])
    h = nu0 * 1e-3
    fd = float((vg(jnp.asarray(nu0 + h, f64))[0] -
                vg(jnp.asarray(nu0 - h, f64))[0]) / (2 * h))
    assert np.isfinite(g)
    assert np.isclose(g, fd, rtol=1e-4), (g, fd)
    # reverse == forward on the identical fixed-trip program (jitted: an
    # eager jvp would execute thousands of ops one-by-one on the CI box)
    jv_fn = jax.jit(lambda nu: jax.jvp(_ke_after, (nu,),
                                       (jnp.ones((), f64),))[1])
    assert np.isclose(g, float(jv_fn(jnp.asarray(nu0, f64))), rtol=1e-9)


def test_reverse_grad_through_body_measurement():
    """jax.grad w.r.t. a body-map parameter (cylinder spin ratio) flows
    through measure_fields (vmapped sdf gradients + map Jacobians),
    build_levels re-restriction, and the fixed-trip momentum step —
    the reverse-mode analog of the reference's spinning-cylinder
    ForwardDiff test (maintests.jl:263-277)."""
    from waterlily_tpu.body import AutoBody, measure_fields
    from waterlily_tpu.metrics import total_force

    # Dm=8 -> S=18^2 (4 MG levels) and fixed_iters=1: the oracle (reverse
    # grad == FD of the SAME program) is invariant to solver depth, while
    # the traced/AD'd program — the dominant wall-time on the 1-core CI
    # box — shrinks ~2x (70 -> ~35 s warm)
    Dm, Re, U = 8, 500, 1.0
    R = Dm // 2
    S = (2 * Dm + 2, 2 * Dm + 2)

    def lift(xi):
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

        state, _ = jax.lax.scan(step, state, None, length=3)
        f = total_force(state.u, state.p, cfg.nu, body, state.t)
        return f[1] / (xi ** 2 * U ** 2 * Dm)

    xi0 = 2.0
    # one value_and_grad program serves the gradient and both FD probes
    vg = jax.jit(jax.value_and_grad(lift))
    g = float(vg(jnp.asarray(xi0, f64))[1])
    h = 1e-5
    fd = float((vg(jnp.asarray(xi0 + h, f64))[0] -
                vg(jnp.asarray(xi0 - h, f64))[0]) / (2 * h))
    assert np.isfinite(g)
    assert np.isclose(g, fd, rtol=1e-3), (g, fd)
