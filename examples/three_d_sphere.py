"""3D sphere benchmark — the reference's GPU demo (README.md:118-131):
1.3M velocity DOF on a (96,64,64) grid, Float32, one chip.

Run:  python examples/three_d_sphere.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from waterlily_tpu.models.cases import sphere_3d


def main():
    sim = sphere_3d(3 * 2 ** 5, 2 ** 6, dtype=jnp.float32)
    dof = sim.flow.u.size
    print(f"{dof/1e6:.1f}M velocity degrees of freedom")
    sim.steps(10, remeasure=False)  # compile + warm
    jax.block_until_ready(sim.flow.u)
    t0 = time.perf_counter()
    sim.run_until(10.0, chunk=50, remeasure=False)
    jax.block_until_ready(sim.flow.u)
    print(f"tU/L={sim.sim_time:.1f} in {time.perf_counter()-t0:.1f}s "
          f"({len(sim.pois_n)} steps)")


if __name__ == "__main__":
    main()
