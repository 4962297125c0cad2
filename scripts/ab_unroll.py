"""Same-session A/B: unrolled k-step megastep vs the single-step host loop
on the launch-bound configs (TGV 64^2, oscillating plate 130^2 remeasure,
(96,64,64) sphere).

The per-executable warm phase on the remote runtime spans hundreds of
EXECUTIONS (docs/PERF.md), so each variant is warmed by launch count, not
step count — the k=8 megastep needs the same ~600 launches as the single
step even though that is 8x the steps.

Usage: python scripts/ab_unroll.py [warm_launches] [timed_steps]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

WARM = int(sys.argv[1]) if len(sys.argv) > 1 else 600
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def time_config(make, unroll, remeasure, warm_launches=WARM, steps=STEPS,
                windows=3):
    sim = make(unroll)
    sim.steps(warm_launches * unroll, remeasure=remeasure)
    jax.block_until_ready(sim.flow.u)
    n = max(steps // unroll * unroll, unroll)  # whole megasteps only
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        sim.steps(n, remeasure=remeasure)
        jax.block_until_ready(sim.flow.u)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from waterlily_tpu.models.cases import (tgv_2d, oscillating_plate_2d,
                                            sphere_3d)
    configs = [
        ("TGV 64^2", lambda u: tgv_2d(unroll=u), False),
        ("plate 130^2 remeasure", lambda u: oscillating_plate_2d(unroll=u),
         True),
        ("sphere (96,64,64)", lambda u: sphere_3d(unroll=u), False),
    ]
    for name, make, rem in configs:
        line = [name]
        for u in (1, 4, 8, 16):
            try:
                ms = time_config(make, u, rem)
                line.append(f"u={u}: {ms:.3f} ms/step")
            except Exception as e:
                line.append(f"u={u}: ERR {type(e).__name__}")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
