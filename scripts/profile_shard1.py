"""Phase profile of the 1-device-mesh sharded 256^3 step vs dense forms.

Locates where the sharded step's overhead lives (same-session numbers,
evolving-state donated loops — docs/PERF.md microbenchmark rules).

Usage: python scripts/profile_shard1.py [n]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def timeit(name, fn_d, state, iters=15, warm=5):
    state = jax.tree.map(lambda a: a + 0, state)
    for _ in range(warm):
        state = fn_d(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn_d(state)
    jax.block_until_ready(state)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {ms:8.2f} ms", flush=True)
    return ms, state


def main():
    from waterlily_tpu.models.cases import sphere_3d
    from waterlily_tpu.parallel.mesh import mesh_for
    from waterlily_tpu.parallel.shard_smooth import (
        shardmap_pcg, shardmap_increment, shardmap_residual,
        shardmap_conv_diff)
    from waterlily_tpu.ops.poisson import pcg, residual, increment
    from waterlily_tpu.ops.convect import conv_diff, quick
    from waterlily_tpu.flow import div

    S = (N + 2,) * 3
    mesh = mesh_for(S, 1)
    sim_s = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32, mesh=mesh)
    sim_d = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32)
    sim_s.steps(8, remeasure=False)
    sim_d.steps(8, remeasure=False)
    jax.block_until_ready(sim_s.flow.u)
    jax.block_until_ready(sim_d.flow.u)

    timeit("full step sharded(1dev)",
           lambda s: sim_s._step_static_d(s, sim_s.levels)[0], sim_s.flow)
    timeit("full step dense",
           lambda s: sim_d._step_static_d(s, sim_d.levels)[0], sim_d.flow)

    fine_s = sim_s.levels[0]
    fine_d = sim_d.levels[0]
    state = sim_d.flow
    z_rhs = jax.jit(div)(state.u)
    r0 = jax.jit(residual)(fine_d, state.p, z_rhs)

    # NOTE: levels are passed as (non-donated) jit ARGS, never closures —
    # closing over big concrete arrays uploads them with the program
    # (HTTP 413 at 256^3; CLAUDE.md).
    def mk_pcg(fn):
        def loop(lev, c):
            x, r = c
            x, r = fn(lev, x, r, 6)
            return (x, 0.5 * r + 1e-7)
        return jax.jit(loop, donate_argnums=1)

    timeit("dense pcg(6)", partial(mk_pcg(pcg), fine_d),
           (state.p, r0), iters=10)
    timeit("shardmap pcg(6) compiled",
           partial(mk_pcg(lambda l, x, r, it: shardmap_pcg(l, x, r, it)),
                   fine_s),
           (state.p, r0), iters=10)

    def mk_inc(fn):
        def loop(lev, c):
            x, r, e = c
            x, r = fn(lev, x, r, e)
            return (x, 0.5 * r + 1e-7, 0.999 * e)
        return jax.jit(loop, donate_argnums=1)

    eps0 = jax.jit(lambda r, iD: r * iD)(r0, fine_d.iD)
    timeit("dense increment", partial(mk_inc(increment), fine_d),
           (state.p, r0, eps0), iters=10)
    timeit("shardmap increment", partial(mk_inc(shardmap_increment), fine_s),
           (state.p, r0, eps0), iters=10)

    def mk_res(fn):
        def loop(lev, c):
            x, z = c
            r = fn(lev, x, z)
            return (x + 1e-6 * r, z)
        return jax.jit(loop, donate_argnums=1)

    timeit("dense residual", partial(mk_res(residual), fine_d),
           (state.p, z_rhs), iters=10)
    timeit("shardmap residual", partial(mk_res(shardmap_residual), fine_s),
           (state.p, z_rhs), iters=10)

    def cd_dense(u):
        return u + 1e-6 * conv_diff(u, 0.0002, (), quick, False)

    def cd_shard(u):
        return u + 1e-6 * shardmap_conv_diff(mesh, u, 0.0002, quick)

    timeit("dense conv_diff", jax.jit(cd_dense, donate_argnums=0),
           state.u, iters=10)
    timeit("shardmap conv_diff compiled",
           jax.jit(cd_shard, donate_argnums=0), state.u, iters=10)

    # the dense-vs-banded BDIM delta the sharded config pays (bbox off)
    from waterlily_tpu.flow import bdim, bdim_banded
    rr = jax.jit(lambda u: conv_diff(u, 0.0002, (), quick, False))(state.u)

    def bdim_dense_loop(c):
        st, u, u0f, r = c
        un = bdim(u, u0f, r, st.V, st.mu0, st.mu1, st.dt)
        return (st, un * 0.9999, u0f, r)

    timeit("bdim dense (corrector form)",
           jax.jit(bdim_dense_loop, donate_argnums=0),
           (state, state.u, state.u, rr), iters=10)

    cfg_d = sim_d.cfg
    if cfg_d.bbox_shape is not None:
        def bdim_band_loop(c):
            st, u, u0f, r = c
            un = bdim_banded(cfg_d, st.bbox, u, u0f, r, st.V, st.mu0, st.mu1,
                             st.dt, scale=0.5)
            return (st, un * 0.9999, u0f, r)

        timeit("bdim banded (corrector form)",
               jax.jit(bdim_band_loop, donate_argnums=0),
               (state, state.u, state.u, rr), iters=10)


if __name__ == "__main__":
    main()
