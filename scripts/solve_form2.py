"""Per-iteration residual histories inside the failing while_loop.

solve_form.py showed: shadows NaN in the while_loop (n=27) but are clean in
a fixed=3 unroll of the SAME program (r2=1.7e-3, notably above f32's
1.25e-5).  Two readings: (a) the while_loop body miscompiles, or (b) the
shadow solve stalls above tol, runs deep, and late PCG iterations diverge
numerically.  Here we fetch the trace rows (r_inf, r2 per outer iteration)
from all three forms and compare row-by-row: identical early rows that
stall then blow up late = numerics; rows diverging from iteration 1 =
while_loop-context miscompile.
"""
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
from waterlily_tpu.flow import mom_step
from waterlily_tpu.ops.multigrid import ml_solve, vcycle
from waterlily_tpu.ops.poisson import residual, smooth
from waterlily_tpu.grid import field_dot
from waterlily_tpu.ops.pallas_stencil import div3d_pallas

sim = sphere_3d(n=256, m=256, Re=3700, dtype=jnp.float32)
cfg = sim.cfg


def strip(l):
    return l.replace(L16=None, D16=None, iD16=None, bf16_eps=False)


lev16 = sim.levels
lev32 = tuple(strip(l) for l in lev16)
_step = jax.jit(lambda s, lv: mom_step(cfg, lv, s))
state1, aux = _step(jax.tree.map(lambda a: a + 0, sim.flow), lev32)
print("step0 (f32) pois_n:", [int(v) for v in aux["pois_n"]], flush=True)


@jax.jit
def pre(state):
    u0, p, dt, t = state.u, state.p, state.dt, state.t
    U = F.bc_tuple(cfg.U, t + dt, cfg.D, cfg.dtype)
    r = F.conv_diff(u0, cfg.nu, cfg.perdir, cfg.limiter, cfg.sharded,
                    cfg.mesh)
    r = F.accelerate(r, t, cfg.g, cfg.U, cfg.dtype)
    u = F.bdim_banded(cfg, state.bbox, None, u0, r,
                      state.V, state.mu0, state.mu1, dt)
    u = F.bc_vector(u, U, cfg.exitBC, cfg.perdir, fuse_ok=True)
    z, x = div3d_pallas(u, p, dt)
    return x, z


x, z = pre(state1)


def rows(tag, tr, n):
    t = np.asarray(tr)
    print(f"{tag} (n={n}):", flush=True)
    for k, (ri, r2) in enumerate(t):
        if k > n:
            break
        print(f"  it{k}: r_inf={ri:.6e} r2={r2:.6e}", flush=True)


# (1) while_loop with trace, shadows
wl = jax.jit(lambda lv, x, z: ml_solve(lv, x, z, tol=cfg.tol, itmx=cfg.itmx,
                                       trace=True))
xs, r, n, tr = wl(lev16, x, z)
rows("while shadows", tr, int(n))

# (2) fixed=8 unrolled with trace, shadows
fx = jax.jit(lambda lv, x, z: ml_solve(lv, x, z, tol=cfg.tol, itmx=cfg.itmx,
                                       trace=True, fixed=8))
xs, r, n, tr = fx(lev16, x, z)
rows("fixed8 shadows", tr, int(n))

# (3) python-driven loop of the same body, per-iteration jits, shadows
res = jax.jit(residual)
body = jax.jit(lambda lv, x, r: smooth(lv[0], *vcycle(lv, 0, x, r)))
xp, rp = x, res(lev16, x, z)
print("python shadows:", flush=True)
print(f"  it0: r_inf={float(jnp.max(jnp.abs(rp))):.6e} "
      f"r2={float(field_dot(rp, rp)):.6e}", flush=True)
for k in range(8):
    xp, rp = body(lev16, xp, rp)
    print(f"  it{k+1}: r_inf={float(jnp.max(jnp.abs(rp))):.6e} "
          f"r2={float(field_dot(rp, rp)):.6e}", flush=True)
