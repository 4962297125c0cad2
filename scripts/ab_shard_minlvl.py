"""Step-level A/B of the shard_map region budget at 256^3 (1-dev mesh).

Variants of SHARDMAP_MIN_CELLS (which levels carry lev.mesh → shard_map
regions): 0 = every level (the round-3 behavior), 2^21 = big levels only,
inf = pure GSPMD (no shard_map anywhere).  Micro-bench region timings are
elided by the runtime (docs/PERF.md), so this measures whole sim.steps.

Run on the real TPU: python scripts/ab_shard_minlvl.py [n]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from waterlily_tpu.models.cases import sphere_3d  # noqa: E402
from waterlily_tpu.parallel import mesh as pmesh  # noqa: E402


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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = (n + 2,) * 3
    mesh = pmesh.mesh_for(S, 1)
    results = {}
    for label, cells in (("min=2^21 (big levels)", 2 ** 21),
                         ("min=0 (all levels)", 0),
                         ("min=inf (pure GSPMD)", 1 << 60)):
        pmesh.SHARDMAP_MIN_CELLS = cells
        sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32, mesh=mesh)
        t = steady(sim)
        pois = [list(map(int, r)) for r in sim.pois_n[:10]]
        nan = bool(jnp.any(jnp.isnan(sim.flow.u)))
        print(f"{label:24s} {t*1e3:8.2f} ms/step nan={nan} pois={pois[:6]}",
              flush=True)
        results[label] = t
        del sim
    pmesh.SHARDMAP_MIN_CELLS = 2 ** 21

    sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
    t = steady(sim)
    pois = [list(map(int, r)) for r in sim.pois_n[:10]]
    print(f"{'dense (no mesh)':24s} {t*1e3:8.2f} ms/step pois={pois[:6]}")


if __name__ == "__main__":
    main()
