"""Flow past a 2D circle at Re=100 — the reference README example
(README.md:41-51), with a drag/lift force trace and an optional gif.

Run:  python examples/two_d_circle.py [--gif] [--quick]

``--quick`` runs a reduced config (48x32, 2 samples) — executed by the CI
nightly job so a stale example fails loudly instead of shipping silently.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from waterlily_tpu.models.cases import circle_2d
from waterlily_tpu.metrics import total_force


def main():
    quick = "--quick" in sys.argv
    sim = (circle_2d(n=48, m=32, Re=100) if quick
           else circle_2d(n=96, m=64, Re=100))
    force_fn = jax.jit(lambda u, p, t: total_force(u, p, sim.cfg.nu, sim.body, t))

    print("tU/L   Cd      Cl")
    for k in range(2 if quick else 20):
        sim.sim_step(sim.sim_time + 0.5, remeasure=False)
        f = np.asarray(force_fn(sim.flow.u, sim.flow.p, sim.time))
        coeff = 2 * f / (sim.U ** 2 * sim.L)  # force -> coefficient
        print(f"{sim.sim_time:5.1f}  {-coeff[0]:6.3f}  {coeff[1]:6.3f}")

    if "--gif" in sys.argv:
        from waterlily_tpu.io.plots import sim_gif
        sim_gif(sim, "circle.gif", duration=5, step=0.25, clims=(-8, 8),
                plotbody=True)
        print("wrote circle.gif")


if __name__ == "__main__":
    main()
