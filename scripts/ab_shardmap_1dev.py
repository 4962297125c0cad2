"""Same-session A/B: 256^3 sphere step, unsharded vs 1-device-mesh shard_map.

Verdict-r3 item 1a: the compiled Mosaic-under-shard_map composition had
never executed on real silicon.  A 1-device mesh (`mesh_for(S, 1)`) makes
`can_shardmap` true on the one available chip, so the sharded step
dispatches `shardmap_pcg` / `shardmap_conv_diff` / `shardmap_increment` /
`shardmap_residual` with ``pallas='compiled'`` — proving the lowering, the
SMEM base offsets and the halo'd-block kernels on hardware.  The ppermutes
are trivial on 1 device, so the remaining delta vs the unsharded step is
the cost of the halo-extended geometry + the phases still on XLA forms
under sharding (BC DUS chain, projection, BDIM, transfers).

Run on the real TPU: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/ab_shardmap_1dev.py [n]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from waterlily_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from waterlily_tpu.models.cases import sphere_3d  # noqa: E402
from waterlily_tpu.parallel.mesh import mesh_for  # noqa: E402


def steady(sim, warm=15, steps=40, windows=3):
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
    print(f"== {n}^3 sphere, A=unsharded B=1-dev-mesh shard_map ==", flush=True)
    sim_a = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
    ta = steady(sim_a)
    pois_a = [list(map(int, r)) for r in sim_a.pois_n[:12]]
    del sim_a

    mesh = mesh_for(S, 1)
    sim_b = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32, mesh=mesh)
    tb = steady(sim_b)
    pois_b = [list(map(int, r)) for r in sim_b.pois_n[:12]]
    nan_b = bool(jnp.any(jnp.isnan(sim_b.flow.u)))
    del sim_b

    # A re-run to bound drift
    sim_a2 = sphere_3d(n=n, m=n, Re=3700, dtype=jnp.float32)
    ta2 = steady(sim_a2)

    print(f"A unsharded      : {ta*1e3:.2f} ms/step (rerun {ta2*1e3:.2f})")
    print(f"B 1-dev shard_map: {tb*1e3:.2f} ms/step  "
          f"ratio B/A = {tb/min(ta, ta2):.3f}")
    print(f"pois_n A: {pois_a}")
    print(f"pois_n B: {pois_b}  nan={nan_b}")


if __name__ == "__main__":
    main()
