import sys
sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
from waterlily_tpu.ops.poisson import _mult_interior_arrays, _diag
from waterlily_tpu.ops.pallas_stencil import mult3d_pallas, increment3d_pallas
from waterlily_tpu.ops.bc import bc_vector
from waterlily_tpu.grid import pad_interior

for S in [(130, 130, 130), (258, 258, 258)]:
    key = jax.random.PRNGKey(0)
    # band-like: mostly exact 1.0 with a fractional shell (like mu0)
    L = jnp.ones((3,) + S, jnp.float32)
    frac = jax.random.uniform(key, (3,) + S) < 0.1
    L = jnp.where(frac, jax.random.uniform(jax.random.PRNGKey(9), (3,) + S), L)
    L = bc_vector(L, (0.0,) * 3)
    L16 = L.astype(jnp.bfloat16)
    Dc = _diag(L16.astype(jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1), S, jnp.float32)
    e16 = (0.1 * x).astype(jnp.bfloat16)
    r = jnp.zeros(S).at[1:-1, 1:-1, 1:-1].set(
        jax.random.normal(jax.random.PRNGKey(2),
                          tuple(s - 2 for s in S)))

    @jax.jit
    def dense(Lq, Dq, v):
        return pad_interior(_mult_interior_arrays(
            Lq.astype(jnp.float32), Dq.astype(jnp.float32),
            v.astype(jnp.float32)))

    for B in (1, 2):
        # f32 x stream
        zk = mult3d_pallas(L16, Dc, x, S, block=B)
        zd = dense(L16, Dc, x)
        d1 = float(jnp.max(jnp.abs(zk - zd)))
        # bf16 eps stream + fused dot (the production smoother call)
        zk2, dot = mult3d_pallas(L16, Dc, e16, S, block=B, with_dot=True)
        zd2 = dense(L16, Dc, e16)
        d2 = float(jnp.max(jnp.abs(zk2 - zd2)))
        dotd = float(jnp.sum(zd2 * e16.astype(jnp.float32)))
        # increment
        x2, r2 = increment3d_pallas(L16, Dc, e16, x, r, S, block=B)
        rd = r - zd2
        d3 = float(jnp.max(jnp.abs(r2 - rd)))
        nn = int(jnp.isnan(zk).sum() + jnp.isnan(zk2).sum()
                 + jnp.isnan(r2).sum())
        print(f"S={S[0]} B={B}: mult={d1:.3e} mult16={d2:.3e} "
              f"dot_rel={(abs(float(dot)-dotd)/abs(dotd)):.2e} "
              f"incr={d3:.3e} nans={nn}", flush=True)
