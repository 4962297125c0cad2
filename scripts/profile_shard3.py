"""Time the V-cycle's pieces under sharding at 256^3 (1-dev mesh).

profile_shard2 localized the sharded-step catastrophe to the V-cycle
(215.66 ms vs 7.71 dense).  This times each transfer primitive and the
coarse-level shardmap calls to find the ~200 ms.

Usage: python scripts/profile_shard3.py [n]
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
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms, state


def main():
    from waterlily_tpu.ops.multigrid import restrict, prolongate
    from waterlily_tpu.parallel.mesh import mesh_for
    from waterlily_tpu.parallel.shard_smooth import (shardmap_pcg,
                                                     shardmap_increment)
    from waterlily_tpu.models.cases import sphere_3d

    S = (N + 2,) * 3
    Sc = tuple(1 + s // 2 for s in S)
    key = jax.random.PRNGKey(0)
    r = jax.random.normal(key, S, jnp.float32)
    xc = jax.random.normal(key, Sc, jnp.float32)

    # transfer primitives: sharded (reduce_window / conv_transpose) vs the
    # dense forms (reshape-sum / repeat) — the `sharded` flag only selects
    # the primitive, no mesh involvement
    # route each output back through a scalar tap (dedupe/elision rules,
    # CLAUDE.md microbenchmark notes)
    def mk_rst2(sh):
        def f(c):
            rr, acc = c
            rc = restrict(rr, sh)
            return (rr * 0.9999 + 1e-12 * acc, acc + jnp.sum(rc))
        return jax.jit(f, donate_argnums=0)

    timeit("restrict dense (reshape-sum)", mk_rst2(False),
           (r, jnp.float32(0)))
    timeit("restrict sharded (reduce_window)", mk_rst2(True),
           (r, jnp.float32(0)))

    def mk_pro(sh):
        def f(c):
            xx, acc = c
            ef = prolongate(xx, S, sh)
            return (xx * 0.9999 + 1e-12 * acc, acc + jnp.sum(ef))
        return jax.jit(f, donate_argnums=0)

    timeit("prolongate dense (repeat)", mk_pro(False),
           (xc, jnp.float32(0)))
    timeit("prolongate sharded (conv_transpose)", mk_pro(True),
           (xc, jnp.float32(0)))

    # coarse-level shardmap calls (1-dev mesh), levels 1 and 2
    mesh = mesh_for(S, 1)
    sim = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32, mesh=mesh)
    sim.steps(4, remeasure=False)
    jax.block_until_ready(sim.flow.u)

    for li in (1, 2, 3):
        lev = sim.levels[li]
        Sl = lev.D.shape
        rl = jax.random.normal(key, Sl, jnp.float32)
        rl = rl.at[0].set(0).at[-1].set(0)

        def pf(lv, c):
            x, rr = c
            x2, r2 = shardmap_pcg(lv, x, rr, 6)
            return (x2, 0.5 * r2 + 1e-7)
        timeit(f"shardmap pcg L{li} {Sl}",
               partial(jax.jit(pf, donate_argnums=1), lev),
               (jnp.zeros(Sl), rl))

        def jf(lv, c):
            x, rr = c
            x2, r2 = shardmap_increment(lv, x, rr, rr * lv.iD)
            return (x2 * 0.5, 0.5 * r2 + 1e-7)
        timeit(f"shardmap increment L{li} {Sl}",
               partial(jax.jit(jf, donate_argnums=1), lev),
               (jnp.zeros(Sl), rl))


if __name__ == "__main__":
    main()
