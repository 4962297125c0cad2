"""Hardware bisect battery for the bf16-operator NaN.

Runs the fine-level smoother machinery on a realistic 256^3 state in
several configurations to localize the real-TPU divergence.  Each trial
prints r2 evolution; garbage/NaN identifies the guilty ingredient.
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
from waterlily_tpu.ops.poisson import (pcg, jacobi, residual, increment,
                                       _rid, _opLD)
from waterlily_tpu.ops.pallas_stencil import mult3d_pallas, increment3d_pallas
from waterlily_tpu.grid import field_dot, pad_interior
from waterlily_tpu.flow import div

sim = sphere_3d(n=256, m=256, Re=3700, dtype=jnp.float32)


def strip(lev):
    return lev.replace(L16=None, D16=None, iD16=None, bf16_eps=False)


from waterlily_tpu.flow import mom_step  # noqa: E402

# the trial state comes from a SHADOW-FREE step so a step-0 NaN under the
# shadows cannot poison every later trial
# NB: big concrete arrays (levels, L16/D16) must be jit ARGUMENTS, not
# closures — the remote-compile tunnel rejects closure-embedded payloads
# with HTTP 413 (CLAUDE.md gotcha).
_step = jax.jit(lambda s, lv: mom_step(sim.cfg, lv, s))
lev_f32 = tuple(strip(l) for l in sim.levels)
state, aux = _step(jax.tree.map(lambda a: a + 0, sim.flow), lev_f32)
print("step0 (f32 levels) pois_n:", [int(v) for v in aux["pois_n"]],
      flush=True)
fine = sim.levels[0]
fine_f32 = strip(fine)
assert fine.L16 is not None
S = state.p.shape

z_rhs = jax.jit(div)(state.u)
r0 = jax.jit(residual)(fine, state.p, z_rhs)
print("r0: r2=%.4e nan=%d" % (float(field_dot(r0, r0)),
                              int(jnp.isnan(r0).sum())), flush=True)


def r2(r):
    return float(field_dot(r, r))


def trial_pcg(tag, lev, sweeps=5):
    x, r = state.p, r0
    f = jax.jit(pcg, static_argnames=("it",))
    vals = []
    for _ in range(sweeps):
        x, r = f(lev, x, r, it=6)
        vals.append(r2(r))
    print(f"{tag}: r2 per sweep: " + " ".join(f"{v:.3e}" for v in vals),
          flush=True)


# (a) full shadow pcg -- expect the failure
trial_pcg("a. pcg shadows (full)   ", fine)
# (b) f32 reference
trial_pcg("b. pcg f32 operator     ", fine_f32)
# (c) shadows but f32 eps
trial_pcg("c. shadows, f32 eps     ", fine.replace(bf16_eps=False))
# (d) shadows but f32 iD (no iD16)
trial_pcg("d. shadows, f32 iD      ", fine.replace(iD16=None))
# (d2) L16/D16 only: f32 eps AND f32 iD — isolates the bf16 tap stream
trial_pcg("d2. L16 only (f32 eps+iD)", fine.replace(iD16=None,
                                                    bf16_eps=False))
# (e) jacobi-only loop (increment kernel without the fused dot)
def trial_jac(tag, lev, sweeps=8):
    x, r = state.p, r0
    f = jax.jit(jacobi)
    vals = []
    for _ in range(sweeps):
        x, r = f(lev, x, r)
        vals.append(r2(r))
    print(f"{tag}: r2 per sweep: " + " ".join(f"{v:.3e}" for v in vals),
          flush=True)

trial_jac("e. jacobi shadows       ", fine)

# (f) repeated-execution kernel integrity: chain 40 mult calls, compare a
# checksum against the dense-emulated value recomputed every 10 calls
L16, D16 = _opLD(fine)
from waterlily_tpu.ops.poisson import _mult_interior_arrays

@jax.jit
def dense16(Lq, Dq, x):
    return pad_interior(_mult_interior_arrays(
        Lq.astype(jnp.float32), Dq, x))

@jax.jit
def kstep(Lq, Dq, x):
    z = mult3d_pallas(Lq, Dq, x, S)
    return x * jnp.float32(0.97) + jnp.float32(1e-3) * z

_mult = jax.jit(lambda Lq, Dq, v: mult3d_pallas(Lq, Dq, v, S))
x = state.p
for k in range(40):
    x = kstep(L16, D16, x)
    if k % 10 == 9:
        zk = _mult(L16, D16, x)
        zd = dense16(L16, D16, x)
        d = float(jnp.max(jnp.abs(zk - zd)))
        print(f"f. chained call {k}: |kern-dense|max={d:.3e} "
              f"xnan={int(jnp.isnan(x).sum())}", flush=True)

# (h) full step WITHOUT donation: the production failure ran the donated
# step (_step_static_d); if the non-donated program is clean, the
# differentiator is buffer donation/aliasing, not the kernels
st = jax.tree.map(lambda a: a + 0, state)
first_nan = None
for k in range(40):
    st, aux = sim._step_static(st, sim.levels)
    d = float(aux["dt"])
    if d != d:
        first_nan = k
        break
print(f"h. non-donated step: first dt NaN at "
      f"{'step %d' % first_nan if first_nan is not None else 'none in 40'}",
      flush=True)

# (h2) donated step for contrast (fresh state copy)
st = jax.tree.map(lambda a: a + 0, state)
first_nan = None
for k in range(40):
    st, aux = sim._step_static_d(st, sim.levels)
    d = float(aux["dt"])
    if d != d:
        first_nan = k
        break
print(f"h2. donated step: first dt NaN at "
      f"{'step %d' % first_nan if first_nan is not None else 'none in 40'}",
      flush=True)

# (i)/(j)/(k) full-step localization: which level's shadows, and do the
# OTHER Mosaic kernels in the program matter?  (The CPU dense emulation,
# scripts/emulate_bf16op_cpu.py, proved the shadow ALGEBRA is stable at
# 256^3 with pois_n parity — so whatever fails below is compilation.)
def trial_step(tag, levels, cfg=None, steps=40):
    c = cfg if cfg is not None else sim.cfg
    f = jax.jit(lambda s, lv: mom_step(c, lv, s))
    st = jax.tree.map(lambda a: a + 0, state)
    first = None
    for k in range(steps):
        st, aux_ = f(st, levels)
        d = float(aux_["dt"])
        if d != d:
            first = k
            break
    print(f"{tag}: first dt NaN at "
          f"{'step %d' % first if first is not None else 'none in %d' % steps}",
          flush=True)


trial_step("i. shadows on fine (258^3) level only",
           (sim.levels[0],) + tuple(strip(l) for l in sim.levels[1:]))
trial_step("j. shadows on second (130^3) level only",
           (strip(sim.levels[0]),) + sim.levels[1:2]
           + tuple(strip(l) for l in sim.levels[2:]))
# implicit_diff=True keeps the solve's Pallas dispatch but moves conv_diff/
# BC/projection/div to their XLA forms (identical primal trajectory):
# clean here + NaN in (h) => a composition/layout interaction between the
# f32 sweep kernels and the bf16 smoother kernels in one program.
trial_step("k. shadows + XLA sweeps (no other Mosaic in program)",
           sim.levels, cfg=sim.cfg._replace(implicit_diff=True))

# (g) with_dot repeated: does the fused-dot variant corrupt under repetition?
@jax.jit
def kstep_dot(Lq, Dq, x):
    z, dot = mult3d_pallas(Lq, Dq, x.astype(jnp.bfloat16), S, with_dot=True)
    return x * jnp.float32(0.97) + jnp.float32(1e-3) * z, dot

x = state.p
for k in range(40):
    x, dot = kstep_dot(L16, D16, x)
    if k % 10 == 9:
        e16 = x.astype(jnp.bfloat16)
        zd = dense16(L16, D16, e16.astype(jnp.float32))
        dd = float(field_dot(zd, e16.astype(jnp.float32)))
        print(f"g. chained dot call {k}: dot={float(dot):.6e} dense={dd:.6e} "
              f"xnan={int(jnp.isnan(x).sum())}", flush=True)
