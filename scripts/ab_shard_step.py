"""Step-level A/B of the ONE-region whole step at 256^3 (1-dev mesh).

W1 whole-step region (shard_step)    — 1 region/step, everything local
W2 solve-region only (shard_solve)   — 4 regions/step (2 conv + 2 solve)
W3 dense                             — no mesh (drift check)

Run on the real TPU: python scripts/ab_shard_step.py [n]
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
from waterlily_tpu.parallel import shard_step as sstep  # noqa: E402


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
        print(f"{label:30s} {t*1e3:8.2f} ms/step nan={nan} pois={pois}",
              flush=True)
        del sim
    finally:
        for mod, name, val in saved:
            setattr(mod, name, val)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    S = (n + 2,) * 3
    mesh = pmesh.mesh_for(S, 1)
    run("W1 whole-step region", n, mesh)
    run("W2 solve-region only", n, mesh, patches=[
        (sstep, "can_shard_step", lambda *a, **k: False)])
    run("W3 dense", n, None)


if __name__ == "__main__":
    main()
