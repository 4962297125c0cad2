"""Same-session A/B: bf16 operator-coefficient shadows (L16/D16/iD16) on the
256^3 sphere step.

Variant A is the shipped round-3 default (no shadows, bf16 search
directions); variant B is the shadow form (bf16 operator, f32 directions —
make_level enforces the exclusion: compounding both roundings lifts the MG
convergence floor above tol, scripts/solve_local.py).  Reports ms/step for
each and the pois_n sequence over NSTEP steps — the parity gate: the
sequences must be identical and the solve residuals of equal quality.

Usage: python scripts/ab_bf16op.py [N] [NSTEP]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import waterlily_tpu.ops.poisson as pois  # noqa: E402

pois.BF16_OP = True

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NSTEP = int(sys.argv[2]) if len(sys.argv) > 2 else 55


def strip(levels):
    """The shipped default: no shadows, bf16 directions on blocked levels."""
    return tuple(l.replace(L16=None, D16=None, iD16=None,
                           bf16_eps=l.blocked and l.L.dtype == jnp.float32)
                 for l in levels)


def run(sim, levels, state, nstep, tag=""):
    pois, dts = [], []
    first_nan = None
    for k in range(nstep):
        state, aux = sim._step_static_d(state, levels)
        pois.append(tuple(int(v) for v in jnp.atleast_1d(aux["pois_n"])))
        dts.append(float(aux["dt"]))
        if first_nan is None and dts[-1] != dts[-1]:  # NaN dt = cheapest probe
            first_nan = k
            print(f"  [{tag}] dt first NaN at step {k}", flush=True)
    jax.block_until_ready(state.u)
    return state, pois, dts


def timeloop(sim, levels, state, iters=25, warm=8):
    for _ in range(warm):
        state, _ = sim._step_static_d(state, levels)
    jax.block_until_ready(state.u)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = sim._step_static_d(state, levels)
    jax.block_until_ready(state.u)
    return (time.perf_counter() - t0) / iters * 1e3, state


def main():
    from waterlily_tpu.models.cases import sphere_3d

    sim = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32)
    sim.steps(6, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    fine = sim.levels[0]
    print(f"grid {sim.cfg.S} blocked={fine.blocked} "
          f"shadows={'yes' if fine.L16 is not None else 'no'}")
    # the harness owns the state copies from here; drop the sim's ~3 GB
    # reference — with the +0.5 GB shadow levels the 4th live state copy
    # OOMs the 16 GB v5e (RESOURCE_EXHAUSTED observed at variant-B timing)
    base = sim.flow
    sim.flow = None

    levA = strip(sim.levels)
    levB = sim.levels

    if "--parity-only" not in sys.argv:
        # interleave timing A/B twice to average out terminal phase drift
        msA1, stA = timeloop(sim, levA, jax.tree.map(lambda a: a + 0, base))
        msB1, stB = timeloop(sim, levB, jax.tree.map(lambda a: a + 0, base))
        msA2, stA = timeloop(sim, levA, stA)
        msB2, stB = timeloop(sim, levB, stB)
        msA, msB = (msA1 + msA2) / 2, (msB1 + msB2) / 2
        dof = 3 * (N - 2) ** 3  # velocity DOF, bench.py convention
        print(f"A (no shadows): {msA1:.2f}/{msA2:.2f} -> {msA:.2f} ms/step "
              f"({msA * 1e6 / dof:.3f} ns/DOF)")
        print(f"B (bf16 L/D/iD): {msB1:.2f}/{msB2:.2f} -> {msB:.2f} ms/step "
              f"({msB * 1e6 / dof:.3f} ns/DOF)")
        print(f"speedup: {msA / msB:.3f}x")

    # parity: pois_n sequence + dt trajectory from the same initial state
    stA2, pA, dA = run(sim, levA, jax.tree.map(lambda a: a + 0, base), NSTEP,
                       tag="A")
    stB2, pB, dB = run(sim, levB, jax.tree.map(lambda a: a + 0, base), NSTEP,
                       tag="B")
    same = pA == pB
    print(f"pois_n A: {pA}")
    print(f"pois_n B: {pB}")
    print(f"pois_n identical: {same}")
    import numpy as np
    for tag, st in (("A", stA2), ("B", stB2)):
        uu = np.asarray(st.u)
        print(f"{tag} final umax={np.abs(uu).max():.4f} "
              f"u_nan={np.isnan(uu).sum()}")
    ddt = max(abs(a - b) / abs(a) for a, b in zip(dA, dB))
    print(f"max rel dt diff over {NSTEP} steps: {ddt:.3e}")

    # residual quality of one fresh solve: each variant solves on ITS OWN
    # evolved state (a shared-B z poisons the A probe once B has NaNs)
    from waterlily_tpu.ops.multigrid import ml_solve
    from waterlily_tpu.flow import div
    for tag, lv, st in (("A", levA, stA2), ("B", levB, stB2)):
        z = jax.jit(div)(st.u)
        x, r, n = jax.jit(ml_solve, static_argnames=())(lv, jnp.zeros_like(z), z)
        r2 = float(jnp.vdot(r, r))
        print(f"solve[{tag}]: n={int(n)} r2={r2:.3e}")


if __name__ == "__main__":
    main()
