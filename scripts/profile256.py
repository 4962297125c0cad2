"""Per-op profile of the 256^3 sphere step on the real TPU.

Times each hot component over EVOLVING state via donated jitted programs
driven from an async host loop (identical-input micro-benchmarks get
deduped by the remote runtime — see docs/PERF.md).  All numbers are
same-session and only comparable to each other.

Usage: python scripts/profile256.py [n]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def timeit(name, fn_d, state, iters=20, warm=5):
    """fn_d: donated jit (state)->state.  Returns ms/iter."""
    # fresh buffers: the caller's arrays survive the donation
    state = jax.tree.map(lambda a: a + 0, state)
    for _ in range(warm):
        state = fn_d(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn_d(state)
    jax.block_until_ready(state)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {ms:8.2f} ms")
    return ms, state


def main():
    from waterlily_tpu.models.cases import sphere_3d
    from waterlily_tpu.ops.poisson import mult, pcg, residual, jacobi
    from waterlily_tpu.ops.multigrid import ml_solve, vcycle, build_levels
    from waterlily_tpu.ops.convect import conv_diff
    from waterlily_tpu.flow import div, cfl, bdim_banded, bc_tuple
    from waterlily_tpu.ops.bc import bc_vector

    sim = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32)
    cfg = sim.cfg
    sim.steps(10, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    state = sim.flow
    levels = sim.levels
    fine = levels[0]
    print(f"grid {cfg.S}  bbox_shape={cfg.bbox_shape}  "
          f"fine blocked={fine.blocked}")

    # whole step
    ms_step, state = timeit("full step (static)", lambda s: sim._step_static_d(
        s, levels)[0], state, iters=20)

    # conv_diff on evolving u
    u0 = state.u

    @jax.jit
    def cd_loop(u):
        r = conv_diff(u, cfg.nu, cfg.perdir, cfg.limiter, cfg.sharded)
        return u + 1e-6 * r

    cd_d = jax.jit(cd_loop, donate_argnums=0)
    _, _st = timeit("conv_diff (one call)", cd_d, u0)

    # fine-level mult on evolving x
    x0 = state.p

    def mult_loop(c):
        lev, x = c
        z = mult(lev, x)
        return (lev, x + 1e-6 * z)

    mult_d = jax.jit(mult_loop, donate_argnums=0)
    _, _st = timeit("fine mult (blocked kernel)", mult_d, (fine, x0))

    # fine-level XLA pcg (the real smoother for the fine level)
    z_rhs = div(state.u)

    def pcg_loop(c):
        lev, x, r = c
        x, r = pcg(lev, x, r, it=6)
        return (lev, x, 0.5 * r + 1e-7)

    pcg_d = jax.jit(pcg_loop, donate_argnums=0)
    r0 = jax.jit(residual)(fine, state.p, z_rhs)
    _, _st = timeit("fine pcg(6) smooth", pcg_d, (fine, state.p, r0), iters=10)

    # fine jacobi (pre-smooth = increment)
    def jac_loop(c):
        lev, x, r = c
        x, r = jacobi(lev, x, r)
        return (lev, x, 0.5 * r + 1e-7)

    jac_d = jax.jit(jac_loop, donate_argnums=0)
    _, _st = timeit("fine jacobi(1)", jac_d, (fine, state.p, r0), iters=10)

    # residual
    def res_loop(c):
        lev, x, z = c
        r = residual(lev, x, z)
        return (lev, x + 1e-6 * r, z)

    res_d = jax.jit(res_loop, donate_argnums=0)
    _, _st = timeit("fine residual", res_d, (fine, state.p, z_rhs), iters=10)

    # whole V-cycle
    def vc_loop(c):
        levs, x, r = c
        x, r = vcycle(levs, 0, x, r)
        return (levs, x, 0.5 * r + 1e-7)

    vc_d = jax.jit(vc_loop, donate_argnums=0)
    _, _st = timeit("vcycle (all levels)", vc_d, (levels, state.p, r0), iters=10)

    # full ml_solve
    def ml_loop(c):
        levs, x, z = c
        x, r, n = ml_solve(levs, x, z, tol=cfg.tol, itmx=cfg.itmx)
        return (levs, x, z * 0.999)

    ml_d = jax.jit(ml_loop, donate_argnums=0)
    _, _st = timeit("ml_solve (one pressure solve)", ml_d, (levels, state.p, z_rhs), iters=10)

    # bdim (banded if on)
    U = bc_tuple(cfg.U, state.t, cfg.D, cfg.dtype)
    if cfg.bbox_shape is not None:
        def bdim_loop(c):
            st, u, u0f, r = c
            un = bdim_banded(cfg, st.bbox, u, u0f, r, st.V,
                             st.mu0, st.mu1, st.dt, scale=0.5)
            return (st, un, u0f, r * 0.999)

        bdim_d = jax.jit(bdim_loop, donate_argnums=0)
        rr = jax.jit(lambda u: conv_diff(u, cfg.nu, cfg.perdir, cfg.limiter,
                                         False))(state.u)
        timeit("bdim_banded (corrector form)", bdim_d,
               (state, state.u, state.u, rr), iters=10)

    # bc_vector + cfl + div
    def bc_loop(u):
        return bc_vector(u, U, cfg.exitBC, cfg.perdir) * 0.9999

    bc_d = jax.jit(bc_loop, donate_argnums=0)
    _, _st = timeit("bc_vector", bc_d, state.u, iters=10)

    def cfl_loop(u):
        return u * (0.9999 + 1e-9 * cfl(u, cfg.nu))

    cfl_d = jax.jit(cfl_loop, donate_argnums=0)
    _, _st = timeit("cfl", cfl_d, state.u, iters=10)

    def div_loop(c):
        u, p = c
        return (u, p + 1e-6 * div(u))

    div_d = jax.jit(div_loop, donate_argnums=0)
    _, _st = timeit("div", div_d, (state.u, state.p), iters=10)

    # remeasure path pieces
    from waterlily_tpu.models.cases import heaving_sphere_3d
    del state, levels
    sim2 = heaving_sphere_3d(radius=N // 4, amp=N // 8, Re=500,
                             dtype=jnp.float32)
    sim2.steps(5, remeasure=True)
    jax.block_until_ready(sim2.flow.u)
    ms_rm, st2 = timeit("full step (remeasure)", lambda s: sim2._step_remeasure_d(
        s, sim2.levels)[0], sim2.flow, iters=10)
    ms_st2, st2 = timeit("full step (heaving, frozen)",
                    lambda s: sim2._step_static_d(s, sim2.levels)[0],
                    st2, iters=10)
    sim2.flow = st2

    cfg2 = sim2.cfg

    def meas_loop(t):
        V, m0, m1, dc = sim2._measure_all(t)
        return t + 1e-4 * jnp.mean(m0)  # body closures are small (no arrays)

    meas_d = jax.jit(meas_loop, donate_argnums=0)
    _, _st = timeit("measure_fields_banded", meas_d, sim2.flow.t, iters=10)

    def lev_loop(c):
        m0, bb = c
        levs = build_levels(m0, cfg2.perdir, cfg2.sharded, None, bb)
        return (m0 * 0.9999 + 1e-5 * levs[0].iD, bb)

    lev_d = jax.jit(lev_loop, donate_argnums=0)
    _, _st = timeit("build_levels (re-restrict)", lev_d,
           (sim2.flow.mu0, sim2.flow.bbox), iters=10)

    print(f"\nstep={ms_step:.2f} ms  remeasure_step={ms_rm:.2f} ms  "
          f"frozen_step={ms_st2:.2f} ms")


if __name__ == "__main__":
    main()
