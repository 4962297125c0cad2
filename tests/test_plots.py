"""Smoke tests for visualization + residual-log plotting (reference PlotsExt)."""
import os

import jax.numpy as jnp
import numpy as np

from waterlily_tpu.simulation import Simulation
from waterlily_tpu.body import AutoBody
from waterlily_tpu.io.plots import flood, body_plot, plot_logger
from waterlily_tpu.metrics import curl


def test_flood_and_body_plot(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 16.0) ** 2)) - 4)
    sim = Simulation((32, 32), (1, 0), 8, nu=0.03, body=body, dtype=jnp.float32)
    sim.sim_step()
    w = np.asarray(curl(2, sim.flow.u))
    fig, ax = plt.subplots()
    flood(w, ax=ax)
    body_plot(sim, ax=ax)
    out = str(tmp_path / "flood.png")
    fig.savefig(out)
    plt.close(fig)
    assert os.path.getsize(out) > 0


def test_residual_log_roundtrip(tmp_path):
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 16.0) ** 2)) - 4)
    sim = Simulation((32, 32), (1, 0), 8, nu=0.03, body=body,
                     dtype=jnp.float32, log=True)
    sim.step(remeasure=False)
    sim.step(remeasure=False)
    logf = str(tmp_path / "WaterLily.log")
    sim.write_log(logf)
    txt = open(logf).read()
    assert txt.startswith("p/c, iter")
    assert "\np\n" in txt and "\nc\n" in txt
    png = plot_logger(logf, out=str(tmp_path / "res.png"))
    assert os.path.getsize(png) > 0
