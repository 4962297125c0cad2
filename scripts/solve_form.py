"""Discriminate while_loop vs unrolled-program composition for the bf16-op NaN.

bisect_bf16 (hardware) shows: isolated smoother loops, chained kernels, and
the per-stage-jit unrolled V-cycle (solve_trace) are ALL clean with the full
shadows, yet the full step NaNs at its first solve even with every other
Mosaic kernel removed (trial k).  The remaining structural difference is the
production `lax.while_loop` around the V-cycle.  This script replays step-1's
first pressure solve state and runs the PRODUCTION `ml_solve` as one jit in
four forms: {while_loop, fixed=3 unrolled} x {f32 levels, shadow levels}.
"""
import sys
sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp
import waterlily_tpu.ops.poisson as pois
pois.BF16_OP = True
from waterlily_tpu.models.cases import sphere_3d
from waterlily_tpu import flow as F
from waterlily_tpu.flow import mom_step
from waterlily_tpu.ops.multigrid import ml_solve
from waterlily_tpu.grid import field_dot
from waterlily_tpu.ops.pallas_stencil import div3d_pallas

sim = sphere_3d(n=256, m=256, Re=3700, dtype=jnp.float32)
cfg = sim.cfg


def strip(l):
    return l.replace(L16=None, D16=None, iD16=None, bf16_eps=False)


lev16 = sim.levels
lev32 = tuple(strip(l) for l in lev16)

# step 0 on f32 levels so the trial state cannot be poisoned
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
print("pre-solve: |x|max=%.3e |z|max=%.3e" %
      (float(jnp.max(jnp.abs(x))), float(jnp.max(jnp.abs(z)))), flush=True)

wl = jax.jit(lambda lv, x, z: ml_solve(lv, x, z, tol=cfg.tol, itmx=cfg.itmx))
fx = jax.jit(lambda lv, x, z: ml_solve(lv, x, z, tol=cfg.tol, itmx=cfg.itmx,
                                       fixed=3))

for tag, f, lv in [("while  f32    ", wl, lev32),
                   ("while  shadows", wl, lev16),
                   ("fixed3 f32    ", fx, lev32),
                   ("fixed3 shadows", fx, lev16)]:
    xs, r, n = f(lv, x, z)
    print(f"{tag}: n={int(n)} r2={float(field_dot(r, r)):.4e} "
          f"x_nan={int(jnp.isnan(xs).sum())} r_nan={int(jnp.isnan(r).sum())}",
          flush=True)
