"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: the reference's own GPU benchmark (README.md:118-131) — flow past
a 3D sphere, grid (96,64,64), 1.3M velocity DOF, Float32, static body,
integrated to tU/L = 50.  The reference reports ~40 s on one NVIDIA GPU.

``value`` is MLUPS (million cell-updates per second) over the run;
``vs_baseline`` is reference_wall / our_wall on that exact config
(>1 means faster than the reference's GPU).
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_WALL_S = 40.0   # README.md:128-131, 1x NVIDIA GPU, CuArray+Float32


def main():
    quick = "--quick" in sys.argv
    from waterlily_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from waterlily_tpu.models.cases import sphere_3d

    n, m = 96, 64
    t_end = 5.0 if quick else 50.0
    sim = sphere_3d(n=n, m=m, dtype=jnp.float32)

    # warm both compile paths (scan chunk) outside the timed region
    sim.steps(50, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    n_warm = len(sim.pois_n)

    t0 = time.perf_counter()
    sim.run_until(t_end, chunk=50, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    wall = time.perf_counter() - t0

    steps = len(sim.pois_n) - n_warm
    cells = n * m * m  # interior cells, matching utils.perf.mlups
    mlups = steps * cells / wall / 1e6
    scale = t_end / 50.0  # pro-rate the reference baseline for --quick
    out = {
        "metric": f"3D sphere (96,64,64) f32 to tU/L={t_end:g}: MLUPS"
                  + (" [quick]" if quick else ""),
        "value": round(mlups, 2),
        "unit": "MLUPS",
        "vs_baseline": round(REFERENCE_WALL_S * scale / wall, 3),
        "wall_s": round(wall, 2),
        "steps": steps,
        "sec_per_step": round(wall / max(steps, 1), 5),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
