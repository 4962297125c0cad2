"""Step-level A/B of the ONE-region shard_map solve at 256^3 (1-dev mesh).

Variants:
  V1 shard_solve (default)     — whole ml_solve in one region, Mosaic inside
  V2 shard_solve XLA-in-region — same region, per-shard XLA slice forms
  V3 per-phase shard_map       — the round-3 path (can_shard_solve gated off)
  V4 pure GSPMD                — no shard_map anywhere (conv included)
  V5 dense                     — no mesh (drift check)

Whole-sim.steps timing only (micro-harnesses are elided on this runtime).
Run on the real TPU: python scripts/ab_shard_solve.py [n]
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
from waterlily_tpu.parallel import shard_smooth as ss  # noqa: E402
from waterlily_tpu.parallel import shard_solve as sv  # noqa: E402


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


def run(label, n, mesh, patches=()):
    saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
    try:
        for mod, name, val in patches:
            setattr(mod, name, val)
        sim = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32,
                        **(dict(mesh=mesh) if mesh is not None else {}))
        t = steady(sim)
        pois = [list(map(int, r)) for r in sim.pois_n[:6]]
        nan = bool(jnp.any(jnp.isnan(sim.flow.u)))
        print(f"{label:28s} {t*1e3:8.2f} ms/step nan={nan} pois={pois}",
              flush=True)
        del sim
    finally:
        for mod, name, val in saved:
            setattr(mod, name, val)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = (n + 2,) * 3
    mesh = pmesh.mesh_for(S, 1)

    run("V1 shard_solve (mosaic)", n, mesh)
    run("V4 pure GSPMD", n, mesh, patches=[
        (pmesh, "SHARDMAP_MIN_CELLS", 1 << 60),
        (ss, "can_shardmap", lambda *a, **k: False)])
    run("V2 shard_solve (XLA local)", n, mesh, patches=[
        (sv, "_auto_pallas", lambda *a, **k: "off"),
        (ss, "_auto_pallas", lambda *a, **k: "off")])
    run("V3 per-phase shard_map", n, mesh, patches=[
        (sv, "can_shard_solve", lambda *a, **k: False)])
    run("V5 dense", n, None)


if __name__ == "__main__":
    main()
