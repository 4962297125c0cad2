"""Replay step 1's first pressure solve with per-stage instrumentation."""
import sys
sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
import waterlily_tpu.ops.poisson as pois
pois.BF16_OP = True
from waterlily_tpu.models.cases import sphere_3d
from waterlily_tpu import flow as F
from waterlily_tpu.ops.poisson import residual, jacobi, smooth, increment
from waterlily_tpu.ops.multigrid import restrict, prolongate
from waterlily_tpu.grid import field_dot
from waterlily_tpu.ops.pallas_stencil import div3d_pallas

sim = sphere_3d(n=256, m=256, Re=3700, dtype=jnp.float32)
cfg = sim.cfg
state0 = sim.flow
state1, aux = sim._step_static_d(jax.tree.map(lambda a: a + 0, state0),
                                 sim.levels)
print("step0 pois_n:", [int(v) for v in aux["pois_n"]], flush=True)

# replay step-1 predictor up to the solve
u0, p, dt, t = state1.u, state1.p, state1.dt, state1.t
U = F.bc_tuple(cfg.U, t + dt, cfg.D, cfg.dtype)

@jax.jit
def predictor(state):
    u0, p, dt, t = state.u, state.p, state.dt, state.t
    r = F.conv_diff(u0, cfg.nu, cfg.perdir, cfg.limiter, cfg.sharded, cfg.mesh)
    r = F.accelerate(r, t, cfg.g, cfg.U, cfg.dtype)
    u = F.bdim_banded(cfg, state.bbox, None, u0, r,
                      state.V, state.mu0, state.mu1, dt)
    u = F.bc_vector(u, U, cfg.exitBC, cfg.perdir, fuse_ok=True)
    z, x = div3d_pallas(u, p, dt)
    return u, x, z

u, x, z = predictor(state1)
print("pre-solve: |x|max=%.3e |z|max=%.3e z_nan=%d" %
      (float(jnp.max(jnp.abs(x))), float(jnp.max(jnp.abs(z))),
       int(jnp.isnan(z).sum())), flush=True)


def stats(tag, arr, lev=None):
    a = np.asarray(arr)
    extra = ""
    if lev is not None:
        live = np.asarray(lev.iD)[tuple(slice(1, -1) for _ in a.shape)] != 0
        ai = a[tuple(slice(1, -1) for _ in a.shape)]
        extra = (f" sum={ai.sum():+.3e} live_sum={ai[live].sum():+.3e}"
                 f" dead_r2={np.square(ai[~live]).sum():.3e}")
    print(f"  {tag}: r2={np.square(a).sum():.4e} max={np.nanmax(np.abs(a)):.3e} "
          f"nan={np.isnan(a).sum()}{extra}", flush=True)


def run_solve(levels, x, z, iters=6):
    nlev = len(levels)
    resid = jax.jit(residual)
    jac = jax.jit(jacobi)
    smo = jax.jit(smooth, static_argnames=("it",))
    inc = jax.jit(increment)
    rst = jax.jit(restrict, static_argnames=("sharded",))
    pro = jax.jit(prolongate, static_argnames=("S_fine", "sharded"))
    r = resid(levels[0], x, z)
    stats("init r", r)
    for it in range(iters):
        # one unrolled V-cycle with prints
        xs, rs = [x], [r]
        for l in range(nlev - 1):
            xl, rl = jac(levels[l], xs[l], rs[l])
            xs[l], rs[l] = xl, rl
            rc = rst(rl, False)
            xs.append(jnp.zeros_like(levels[l + 1].D))
            rs.append(rc)
            if it <= 1:
                stats(f"it{it} restricted r L{l+1}", rc, levels[l + 1])
        # coarse-to-fine
        for l in range(nlev - 2, -1, -1):
            xc, rc = smo(levels[l + 1], xs[l + 1], rs[l + 1])
            stats(f"it{it} post-smooth L{l+1}", rc,
                  levels[l + 1] if l + 1 == nlev - 1 else None)
            eps = pro(xc, xs[l].shape, False)
            xs[l], rs[l] = inc(levels[l], xs[l], rs[l], eps)
            stats(f"it{it} post-increment L{l}", rs[l])
        x, r = smo(levels[0], xs[0], rs[0])
        stats(f"it{it} post fine-smooth", r)
        if bool(jnp.isnan(field_dot(r, r))):
            print("  NaN -- stopping", flush=True)
            break
    return x, r


which = sys.argv[1] if len(sys.argv) > 1 else "shadow"
levels = sim.levels if which == "shadow" else tuple(
    l.replace(L16=None, D16=None, iD16=None) for l in sim.levels)
print(f"=== {which} levels ===", flush=True)
run_solve(levels, x, z)
