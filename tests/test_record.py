"""run_record diagnostics driver test."""
import jax
import jax.numpy as jnp
import numpy as np

from waterlily_tpu.body import AutoBody
from waterlily_tpu.metrics import pressure_force
from waterlily_tpu.simulation import Simulation


def test_run_record_forces():
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 16.0) ** 2)) - 4)
    sim = Simulation((32, 32), (1, 0), 8, nu=0.03, body=body, dtype=jnp.float32)
    force = jax.jit(lambda u, p, t: pressure_force(p, body, t))
    rec = sim.run_record(1.0, every=0.25, remeasure=False,
                         fields={"f": lambda s: force(s.flow.u, s.flow.p, s.time)})
    assert len(rec["t"]) == len(rec["f"]) >= 2
    assert rec["t"][-1] >= 1.0
    assert np.all(np.isfinite(np.stack(rec["f"])))
