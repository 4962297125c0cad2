"""Benchmark harness: prints ONE JSON line with the headline metric.

Metric: MLUPS (million cell-updates per second) on the reference's 3D GPU
benchmark config — flow past a sphere on a (96,64,64) grid, Float32, static
body (README.md:118-131: ~40 s to tU/L=50 on an NVIDIA GPU).

Baseline: the 2024 WaterLily paper headline of 1.44 ns per DOF per step on
GPU (README.md:111) ≈ 694 MLUPS.  ``vs_baseline`` is ours/theirs.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MLUPS = 1.0 / 1.44e-9 / 1e6  # 1.44 ns per cell-update (README.md:111)


def main():
    quick = "--quick" in sys.argv
    from waterlily_tpu.models.cases import sphere_3d
    from waterlily_tpu.utils.perf import time_steps

    n, m = (48, 32) if quick else (96, 64)
    steps = 20 if quick else 100
    sim = sphere_3d(n=n, m=m, dtype=jnp.float32)
    res = time_steps(sim, steps, warmup=5, remeasure=False)

    out = {
        "metric": f"MLUPS 3D sphere ({n},{m},{m}) f32 static-body",
        "value": round(res["mlups"], 2),
        "unit": "MLUPS",
        "vs_baseline": round(res["mlups"] / BASELINE_MLUPS, 4),
        "sec_per_step": round(res["sec_per_step"], 5),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
