"""Roofline closure for the dense 256^3 step (round-5 verdict item 3).

Establishes whether the ~64 ms/step plateau is a bandwidth floor:

1. AOT-compile the production single-step executable (the exact program
   `Simulation.steps` host-drives at this size: `_step_static_d`) and read
   the PJRT cost analysis — bytes accessed per execution is the compiler's
   own materialization accounting, control flow included,
2. time the same program with the whole-`sim.steps()` protocol (the only
   trustworthy timing on this runtime, CLAUDE.md),
3. report achieved GB/s vs the measured kernel ceiling (~900 GB/s padded
   traffic on this v5e — docs/PERF.md round 3: the B=2 mult kernel at
   HBM speed-of-light), and the bytes ratio vs the algorithmic-minimum
   estimate (~23 GB/step, see docs/PERF.md round 5).

Run on the real TPU: python scripts/roofline256.py [n]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from waterlily_tpu.models.cases import sphere_3d
    sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)

    comp = sim._step_static.lower(sim.flow, sim.levels).compile()
    ca = comp.cost_analysis() or {}
    print("== PJRT cost analysis (single-step program) ==")
    for k in sorted(ca):
        if "bytes" in k or k == "flops":
            print(f"  {k}: {float(ca[k]):.4e}")

    # warm well past the per-executable warm phase, then time whole runs
    sim.steps(15, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    spp = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim.steps(30, remeasure=False)
        jax.block_until_ready(sim.flow.u)
        spp = min(spp, (time.perf_counter() - t0) / 30)
    print(f"step time: {spp*1e3:.2f} ms/step")

    b = ca.get("bytes accessed")
    if b:
        gbs = float(b) / spp / 1e9
        print(f"bytes accessed/step: {float(b)/1e9:.2f} GB "
              f"-> achieved {gbs:.0f} GB/s "
              f"({gbs/900:.0%} of the 900 GB/s kernel ceiling)")
        f = 4 * (n + 2) ** 3 / 1e9
        print(f"field passes (67-MB units): {float(b)/1e9/f:.0f}; "
              f"algorithmic-min estimate ~333")


if __name__ == "__main__":
    main()
