"""Single-chip grid-ceiling probe (run on the real TPU).

Round 4 pinned 352^3 (43.6M cells) as the verified single-chip ceiling and
showed 384^3 fails both ways (remote-compile HTTP 500 with the kernel tier,
HBM RESOURCE_EXHAUSTED pure-XLA).  This probe walks the gap: interior
368 = 2^4*23 (padded 370) gives ~49.8M cells, 1.14x the 352^3 footprint.

Usage: python scripts/ceiling_probe.py [n]   (default 368)
Prints steady ms/step + ns/DOF on success; the failure mode otherwise.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 368
    from waterlily_tpu.models.cases import sphere_3d
    from waterlily_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
    t0 = time.perf_counter()
    sim.steps(15)
    jax.block_until_ready(sim.flow.u)
    print(f"{n}^3 compiled+warm in {time.perf_counter() - t0:.1f} s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sim.steps(40)
        jax.block_until_ready(sim.flow.u)
        best = min(best, (time.perf_counter() - t0) / 40)
    cells = n ** 3  # dims ARE the interior (S = dims+2) — matches bench.py
    print(f"{n}^3: {best * 1e3:.2f} ms/step, "
          f"{best / (3 * cells) * 1e9:.3f} ns/DOF, "
          f"{cells / best / 1e6:.1f} MLUPS, pois_n={sim.pois_n[-1]}")
    assert not bool(jnp.any(jnp.isnan(sim.flow.u)))


if __name__ == "__main__":
    main()
