"""Step-level A/B: cost of the two Mosaic-bearing conv regions at 256^3
(1-device mesh) — round-5 verdict item 2.

Round-4 decomposition: sharded step 108.7 ms = dense ~65 + four Mosaic-
bearing shard_map regions (2 conv + 2 solve) at ~10 ms each + GSPMD forms.
Candidates to reclaim the conv regions' tax:

  A  default               — conv kernel inside its region (round-4 ship)
  B  conv region XLA       — CONV_PALLAS='off': same region, gather-form
                             core per shard -> the region carries NO Mosaic
                             call and should be free (round-4 rule)
  C  conv pure GSPMD       — no shard_map region for conv at all
  A' rerun of A            — session drift check
  D  dense (no mesh)       — the 1x anchor

Whole-sim.steps timing only (micro-harnesses are elided on this runtime).
Run on the real TPU: python scripts/ab_conv_region.py [n]
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

    run("A  conv kernel region", n, mesh)
    run("B  conv region XLA (free)", n, mesh, patches=[
        (ss, "CONV_PALLAS", "off")])
    run("C  conv pure GSPMD", n, mesh, patches=[
        (ss, "can_shardmap", lambda *a, **k: False)])
    run("A' conv kernel region", n, mesh)
    run("D  dense", n, None)


if __name__ == "__main__":
    main()
