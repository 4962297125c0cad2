"""Step-level A/B for the round-5 reduction kernels at 256^3.

The device profile (docs/PERF.md round 5) attributes ~11 ms of the 62 ms
step to XLA reductions: PCG rho/rho2 multiply_reduce fusions (~200-340
GB/s) and the CFL pad+max (~150 GB/s).  dot3d_pallas / cfl3d_pallas
stream tall slabs and emit per-slab partials.

  A  both kernels          (KDOT + CFL_PALLAS — proposed ship)
  B  dots only
  C  cfl only
  D  both off              (round-4 ship, the anchor)
  A' rerun of A            (session drift check)

Whole-sim.steps timing only.  Run: python scripts/ab_reduce.py [n]
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
from waterlily_tpu.ops import pallas_stencil as ps  # noqa: E402
from waterlily_tpu import flow  # noqa: E402


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


def run(label, n, kdot, kcfl, kconv=True, kaxpy=True):
    poisson.KDOT, flow.CFL_PALLAS, ps.CONV_MERGED = kdot, kcfl, kconv
    poisson.KAXPY = kaxpy
    try:
        sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
        t = steady(sim)
        pois = [list(map(int, r)) for r in sim.pois_n[:6]]
        nan = bool(jnp.any(jnp.isnan(sim.flow.u)))
        print(f"{label:24s} {t*1e3:8.2f} ms/step nan={nan} pois={pois}",
              flush=True)
        del sim
    finally:
        poisson.KDOT, flow.CFL_PALLAS, ps.CONV_MERGED = False, True, True
        poisson.KAXPY = True


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    run("A  cfl+conv+axpy", n, False, True, True, True)
    run("B  cfl+conv (no axpy)", n, False, True, True, False)
    run("D  all off (r4 ship)", n, False, False, False, False)
    run("A' cfl+conv+axpy", n, False, True, True, True)


if __name__ == "__main__":
    main()
