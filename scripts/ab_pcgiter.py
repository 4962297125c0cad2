"""Same-session A/B: the fused-iteration PCG sweeps on the dense 256^3 step.

A = per-pass blocked smoother (mult+dot kernel + XLA remainder — the
round-3 path, forced via a monkeypatched dispatch); B = pcg_blocked
(two fused sweeps per iteration, zero full-array XLA passes).  Checks
pois_n parity (CLAUDE.md smoother-algebra invariant) and step time.

Run on the real TPU: python scripts/ab_pcgiter.py [n]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from waterlily_tpu.models.cases import sphere_3d  # noqa: E402
from waterlily_tpu.ops import poisson  # noqa: E402


def steady(sim, warm=12, steps=30, windows=3):
    sim.steps(warm, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        sim.steps(steps, remeasure=False)
        jax.block_until_ready(sim.flow.u)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def run(n, label):
    sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
    t = steady(sim)
    pois_n = [list(map(int, r)) for r in sim.pois_n[:16]]
    nan = bool(jnp.any(jnp.isnan(sim.flow.u)))
    print(f"{label}: {t*1e3:.2f} ms/step  nan={nan}")
    print(f"  pois_n: {pois_n}")
    del sim
    return t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    print(f"== {n}^3 sphere: A=per-pass smoother, B=fused-iteration ==",
          flush=True)

    # A: force the round-3 per-pass path by disabling the new dispatch
    real_pcg = poisson.pcg

    def pcg_old(lev, x, r, it=6):
        if lev.blocked and not lev.perdir and not lev.banded:
            lev = lev  # keep the blocked per-pass branch below
        dt = x.dtype
        import jax.numpy as jnp
        from waterlily_tpu.grid import field_dot, mask_interior
        from waterlily_tpu.ops.poisson import _rid, _opLD, mult
        from waterlily_tpu.ops.pallas_stencil import mult3d_pallas
        from waterlily_tpu.ops.bc import bc_scalar_periodic
        teneps = 10 * jnp.finfo(dt).eps
        z = _rid(lev, r)
        eps = z.astype(jnp.bfloat16) if lev.bf16_eps else z
        rho = field_dot(r, z)
        dead = jnp.abs(rho) < teneps
        for i in range(it):
            eps = bc_scalar_periodic(eps, lev.perdir)
            if lev.blocked:
                z, denom = mult3d_pallas(*_opLD(lev), eps, eps.shape,
                                         with_dot=True)
            else:
                z = mult(lev, eps)
                denom = field_dot(z, eps)
            alpha = jnp.where(dead | (denom == 0), 0.0,
                              rho / jnp.where(denom == 0, 1.0, denom)).astype(dt)
            dead = dead | (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)
            upd = jnp.where(dead, 0.0, alpha).astype(dt)
            x = x + upd * eps
            r = r - upd * z
            if i == it - 1:
                break
            z2 = _rid(lev, r)
            rho2 = field_dot(r, z2)
            dead = dead | (jnp.abs(rho2) < teneps)
            beta = jnp.where(dead, 0.0,
                             rho2 / jnp.where(rho == 0, 1.0, rho)).astype(dt)
            eps = mask_interior(beta * eps + z2)
            if lev.bf16_eps:
                eps = eps.astype(jnp.bfloat16)
            rho = jnp.where(dead, rho, rho2)
        return x, r

    poisson.pcg = pcg_old
    ta = run(n, "A per-pass      ")
    poisson.pcg = real_pcg
    tb = run(n, "B fused-iteration")
    ta2 = None
    if len(sys.argv) <= 2 or sys.argv[2] != "--no-rerun":
        poisson.pcg = pcg_old
        ta2 = run(n, "A rerun         ")
        poisson.pcg = real_pcg
    base = min(ta, ta2) if ta2 else ta
    print(f"speedup B vs A: {base / tb:.3f}x")


if __name__ == "__main__":
    main()
