"""Decompose the 1-dev-mesh sharded step: solve vs everything-else.

profile_shard1 showed per-phase shardmap deltas (~+9 ms pcg, +2 inc/res,
+1 conv, +7.6 bdim-dense) explain only ~90 of the 455 ms full-step gap —
this script brackets where the rest lives using fixed_iters=0 steps (no
pressure iterations: residual only) and direct ml_solve timings.

Usage: python scripts/profile_shard2.py [n]
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


def timeit(name, fn_d, state, iters=10, warm=4):
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
    from waterlily_tpu.ops.multigrid import ml_solve, vcycle
    from waterlily_tpu.ops.poisson import residual
    from waterlily_tpu.flow import div

    S = (N + 2,) * 3
    mesh = mesh_for(S, 1)

    for tag, kw in (("sharded", dict(mesh=mesh)), ("dense", dict())):
        sim = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32, **kw)
        sim.steps(6, remeasure=False)
        jax.block_until_ready(sim.flow.u)
        timeit(f"full step {tag}",
               lambda s: sim._step_static_d(s, sim.levels)[0], sim.flow)

        state = sim.flow
        z_rhs = jax.jit(div)(state.u)

        # whole pressure solve, 2 fixed outer iterations (matches pois_n)
        def solve2(levels, c):
            x, z = c
            x2, r, _n = ml_solve(levels, x, z, fixed=2)
            return (x2, 0.5 * z + 1e-7 * r)
        timeit(f"ml_solve fixed=2 {tag}",
               partial(jax.jit(solve2, donate_argnums=1), sim.levels),
               (state.p, z_rhs))

        # one V-cycle (all-level ladder, no fine smooth)
        def vc(levels, c):
            x, r = c
            x2, r2 = vcycle(levels, 0, x, r)
            return (x2, 0.5 * r2 + 1e-7)
        r0 = jax.jit(partial(residual), donate_argnums=())(sim.levels[0],
                                                           state.p, z_rhs)
        timeit(f"vcycle {tag}",
               partial(jax.jit(vc, donate_argnums=1), sim.levels),
               (state.p, r0))
        del sim

    # step with zero pressure iterations (residual-only solves): brackets
    # the non-solver phases (conv/bdim/bc/project pre+post) under sharding
    for tag, kw in (("sharded", dict(mesh=mesh)), ("dense", dict())):
        sim0 = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32,
                         fixed_iters=0, **kw)
        sim0.steps(6, remeasure=False)
        jax.block_until_ready(sim0.flow.u)
        timeit(f"step fixed_iters=0 {tag}",
               lambda s: sim0._step_static_d(s, sim0.levels)[0], sim0.flow)
        del sim0


if __name__ == "__main__":
    main()
