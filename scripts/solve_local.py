"""Localize the bf16-op hardware divergence to one op.

solve_form2 (hardware) pinned the failure shape: the shadow solve converges
to r2~1.5e-3 by outer-iteration 3, stalls above tol, then EXPLODES (it5
upticks, it6 is 4e3) — identically in while_loop and fixed-unroll forms, so
program form is exonerated.  The CPU emulation of the same algebra reaches
tol in 3 iterations, so something the hardware path computes differs from
the emulated algebra.  The emulation never exercised three hardware-only
pieces: the in-kernel fused dot (pcg's alpha denominator), the blocked
increment kernel, and the bf16 iD16 preconditioner read.

This script replays the same pre-solve state and python-drives 9 outer
iterations (jacobi+vcycle+smooth bodies as separate jits), swapping ONE
piece at a time:

  kern-full   production shadows (expect: reproduce the divergence)
  kern-nodot  in-kernel fused dot replaced by XLA field_dot over kernel z
  xla-inc     increment via XLA mult (kernels elsewhere)
  f32-iD      iD16=None (f32 preconditioner; kernels + L16/D16 + bf16 eps)
  f32-eps     bf16_eps=False (f32 directions; kernels + L16/D16 + iD16)
  xla-all     blocked=False + emulation patches (CPU-emulation algebra on
              the TPU backend) — if THIS diverges too, XLA:TPU itself
              computes differently from XLA:CPU on this algebra
"""
import sys

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import waterlily_tpu.ops.poisson as P  # noqa: E402
import waterlily_tpu.ops.multigrid as MG  # noqa: E402
import waterlily_tpu.ops.pallas_stencil as PS  # noqa: E402

P.BF16_OP = True
from waterlily_tpu.models.cases import sphere_3d  # noqa: E402
from waterlily_tpu import flow as F  # noqa: E402
from waterlily_tpu.flow import mom_step  # noqa: E402
from waterlily_tpu.grid import field_dot  # noqa: E402
from waterlily_tpu.ops.pallas_stencil import div3d_pallas  # noqa: E402

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


x0, z0 = pre(state1)
x0, z0 = jax.block_until_ready(x0), jax.block_until_ready(z0)

# --- patches -----------------------------------------------------------------
_orig_mult3d = PS.mult3d_pallas


def _mult3d_nodot(L, Dd, x, S, interpret=False, block=None, with_dot=False):
    z = _orig_mult3d(L, Dd, x, S, interpret=interpret, block=block)
    if with_dot:
        return z, field_dot(z, x.astype(z.dtype))
    return z


_orig_increment = P.increment


def _increment_xla(lev, x, r, eps):
    if lev.bf16_eps and lev.L16 is not None:
        eps = eps.astype(jnp.bfloat16)
    ae = P.mult(lev, eps)
    return x + eps, r - ae


_orig_mult_interior = P._mult_interior


def _mult_interior_shadow(lev, xv):
    if lev.L16 is not None:
        return P._mult_interior_arrays(lev.L16.astype(jnp.float32),
                                       lev.D16, xv)
    return _orig_mult_interior(lev, xv)


def set_patches(nodot=False, xla_inc=False, xla_mult=False):
    PS.mult3d_pallas = _mult3d_nodot if nodot else _orig_mult3d
    inc = _increment_xla if xla_inc else _orig_increment
    P.increment = inc
    MG.increment = inc
    P._mult_interior = _mult_interior_shadow if xla_mult else \
        _orig_mult_interior


def run(tag, levels, its=9, **patches):
    set_patches(**patches)
    res = jax.jit(P.residual)
    body = jax.jit(lambda lv, x, r: P.smooth(lv[0], *MG.vcycle(lv, 0, x, r)))
    xp = x0
    rp = res(levels[0], x0, z0)
    print(f"{tag}:", flush=True)
    print(f"  it0: r2={float(field_dot(rp, rp)):.6e}", flush=True)
    for k in range(its):
        xp, rp = body(levels, xp, rp)
        r2 = float(field_dot(rp, rp))
        print(f"  it{k + 1}: r2={r2:.6e} "
              f"nan={int(jnp.isnan(rp).sum())}", flush=True)
        if r2 != r2:
            break
    set_patches()


lev_noid = tuple(l.replace(iD16=None) if l.iD16 is not None else l
                 for l in lev16)
lev_f32eps = tuple(l.replace(bf16_eps=False) if l.bf16_eps else l
                   for l in lev16)
lev_xla = tuple(l.replace(blocked=False) if l.blocked else l for l in lev16)
# controls without the operator shadows: the shipped default (f32 operator
# + bf16 directions) and the pure-f32 reference trajectory
lev_beps = tuple(l.replace(bf16_eps=True) if l.blocked else l
                 for l in lev32)

TRIALS = {
    "kern-full": lambda: run("kern-full ", lev16),
    "kern-nodot": lambda: run("kern-nodot", lev16, nodot=True),
    "xla-inc": lambda: run("xla-inc   ", lev16, xla_inc=True),
    "f32-iD": lambda: run("f32-iD    ", lev_noid),
    "f32-eps": lambda: run("f32-eps   ", lev_f32eps),
    "xla-all": lambda: run("xla-all   ", lev_xla, xla_inc=True,
                           xla_mult=True),
    "ctrl-beps": lambda: run("ctrl-beps ", lev_beps),
    "ctrl-f32": lambda: run("ctrl-f32  ", lev32),
}

names = sys.argv[1:] or list(TRIALS)
for nm in names:
    TRIALS[nm]()
