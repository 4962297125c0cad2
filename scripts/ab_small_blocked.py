"""Same-session A/B: the blocked/fused Pallas kernel tier below the 2M-cell
gate (MIN_CELLS) on the mid-size 3D configs — (96,64,64) sphere (427k cells,
the headline config) and the (128,64,64) donut (566k).

Variant A: shipped gate (XLA forms below 2M cells).  Variant B: gate lowered
to 300k so the fine Poisson level + conv_diff/BC/projection sweeps use the
kernel tier.  A is re-run last to bound terminal drift.  The parity gate:
pois_n sequences must be identical (the kernels are bit-faithful).

Usage: python scripts/ab_small_blocked.py [warm_launches] [timed_steps]
"""
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import waterlily_tpu.ops.pallas_stencil as ps  # noqa: E402

WARM = int(sys.argv[1]) if len(sys.argv) > 1 else 600
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2400


def run(make, name):
    sim = make()
    u = getattr(sim, "_unroll", 1)
    fine_blocked = sim.levels[0].blocked
    sim.steps(WARM * u, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim.steps(STEPS, remeasure=False)
        jax.block_until_ready(sim.flow.u)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    pois = [tuple(int(v) for v in p) for p in sim.pois_n[:40]]
    print(f"{name}: {best * 1e3:.3f} ms/step (fine blocked={fine_blocked})",
          flush=True)
    return best, pois


def main():
    from waterlily_tpu.models.cases import sphere_3d, donut_3d
    configs = [("sphere (96,64,64)", lambda: sphere_3d()),
               ("donut (128,64,64)", lambda: donut_3d())]
    for name, make in configs:
        ps.MIN_CELLS = 2_000_000
        a1, pois_a = run(make, f"{name} A(gate 2M)")
        ps.MIN_CELLS = 300_000
        b, pois_b = run(make, f"{name} B(gate 300k)")
        ps.MIN_CELLS = 2_000_000
        a2, _ = run(make, f"{name} A again")
        a = min(a1, a2)
        print(f"{name}: B/A = {b / a:.3f}  "
              f"pois_n match: {pois_a == pois_b}", flush=True)


if __name__ == "__main__":
    main()
