"""Heaving plate with per-step body re-measurement — the moving-body BDIM
path (remeasure=True), exercising the autodiff body velocity.

Run:  python examples/oscillating_plate.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from waterlily_tpu.models.cases import oscillating_plate_2d
from waterlily_tpu.metrics import pressure_force


def main():
    sim = oscillating_plate_2d(L=32)
    for k in range(10):
        sim.sim_step(sim.sim_time + 0.2, remeasure=True)
        f = np.asarray(pressure_force(sim.flow.p, sim.body, sim.time))
        print(f"tU/L={sim.sim_time:5.2f}  Fy={f[1]:8.3f}  "
              f"MG iters={np.stack(sim.pois_n)[-1].tolist()}")


if __name__ == "__main__":
    main()
