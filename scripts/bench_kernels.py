"""Same-session kernel bandwidth experiments at 258^3 (one v5e).

Every candidate evolves its state MULTIPLICATIVELY (a *= 0.9999) so bits
change every call for ~10k iterations — additive eps updates reach a bitwise
fixpoint within ~25 calls and the remote runtime dedupes the executions
(docs/PERF.md).  L/D are passed as (donated) arguments, never closed over.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

S = (258, 258, 258)
NB = 4 * 258 * 258 * 258 / 1e9  # GB per field


def timeit(name, fn, state, passes, iters=30, warm=5):
    fn_d = jax.jit(fn, donate_argnums=0)
    state = jax.tree.map(lambda a: a + 0, state)
    try:
        for _ in range(warm):
            state = fn_d(state)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(iters):
            state = fn_d(state)
        jax.block_until_ready(state)
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}")
        return None
    ms = (time.perf_counter() - t0) / iters * 1e3
    gbs = passes * NB / (ms / 1e3)
    print(f"{name:46s} {ms:8.3f} ms   {gbs:7.0f} GB/s eff ({passes} passes)", flush=True)
    return ms


def main():
    from waterlily_tpu.ops import pallas_stencil as ps
    from waterlily_tpu.ops.poisson import _mult_interior_arrays
    from waterlily_tpu.grid import pad_interior
    from jax.experimental import pallas as pl

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, S, jnp.float32)
    L = jnp.abs(jax.random.normal(key, (3,) + S, jnp.float32)) * 0.1 + 0.5
    Dd = -6.0 * jnp.ones(S, jnp.float32)
    C = jnp.float32(0.99995)

    # 1. XLA elementwise triad (3 passes)
    def triad(c):
        a, b = c
        return (C * a + 1e-9 * b, C * b)

    timeit("XLA triad (2r+1w)", triad, (x, x), 3)

    # 2. XLA 7-read stencil-shaped elementwise (no shifts): 6 passes
    def seven(c):
        a, Lx, Dx = c
        s = a * Dx + a * Lx[0] + a * Lx[1] + a * Lx[2]
        return (C * a + 1e-30 * s, Lx, Dx)

    timeit("XLA 5-read elementwise", seven, (x, L, Dd), 6)

    # 3. XLA slice-form mult (the '31-pass' lowering), 7 algo passes
    def xla_mult(c):
        a, Lx, Dx = c
        z = pad_interior(_mult_interior_arrays(Lx, Dx, a))
        return (C * a + 1e-30 * z, Lx, Dx)

    timeit("XLA slice-form mult", xla_mult, (x, L, Dd), 7)

    # 4. blocked Pallas mult (current prod kernel), 7 algo passes
    def pal_mult(block):
        def f(c):
            a, Lx, Dx = c
            z = ps.mult3d_pallas(Lx, Dx, a, S, block=block)
            return (C * a + 1e-30 * z, Lx, Dx)
        return f

    for B in (2, 3):
        timeit(f"pallas mult B={B}", pal_mult(B), (x, L, Dd), 7)

    def pal_mult_dot(c):
        a, Lx, Dx = c
        z, d = ps.mult3d_pallas(Lx, Dx, a, S, with_dot=True)
        return (C * a + 1e-30 * z + 0 * d, Lx, Dx)

    timeit("pallas mult B=2 with_dot", pal_mult_dot, (x, L, Dd), 7)

    # 5. analytic kernel (2 read + 1 write)
    def ana(block):
        def f(c):
            a, = c
            z = ps.ana_mult3d_pallas(a, 1.0, (), block=block)
            return (C * a + 1e-30 * z,)
        return f

    for B in (4, 6):
        timeit(f"pallas ana mult B={B}", ana(B), (x,), 3)

    # 6. pure pallas copy (2 passes) — pipeline overhead probe
    def copy_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * C

    def pal_copy(block):
        slab = pl.BlockSpec((block, S[1], S[2]), lambda i: (i, 0, 0))

        def f(c):
            a, = c
            z = pl.pallas_call(
                copy_kernel, grid=(pl.cdiv(S[0], block),),
                in_specs=[slab], out_specs=slab,
                out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
            )(a)
            return (z,)
        return f

    for B in (2, 4, 8):
        timeit(f"pallas copy B={B}", pal_copy(B), (x,), 2)

    # 7. roll cost probe: 2 sublane + 2 lane rolls on top of copy
    def roll_kernel(x_ref, o_ref):
        a = x_ref[...]
        o_ref[...] = C * (a + 1e-30 * (
            jnp.roll(a, 1, axis=-2) + jnp.roll(a, -1, axis=-2)
            + jnp.roll(a, 1, axis=-1) + jnp.roll(a, -1, axis=-1)))

    def pal_roll(block):
        slab = pl.BlockSpec((block, S[1], S[2]), lambda i: (i, 0, 0))

        def f(c):
            a, = c
            z = pl.pallas_call(
                roll_kernel, grid=(pl.cdiv(S[0], block),),
                in_specs=[slab], out_specs=slab,
                out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
            )(a)
            return (z,)
        return f

    for B in (2, 4):
        timeit(f"pallas 4-roll B={B}", pal_roll(B), (x,), 2)


if __name__ == "__main__":
    main()
