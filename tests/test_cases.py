"""Every canonical case constructs and steps without NaNs (small sizes)."""
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.models.cases import (circle_2d, tgv_2d, tgv_3d, sphere_3d,
                                        donut_3d, oscillating_plate_2d,
                                        heaving_sphere_3d)


@pytest.mark.parametrize("make,kw,remeasure", [
    (circle_2d, dict(n=48, m=32), False),
    (tgv_2d, dict(L=32), False),
    (sphere_3d, dict(n=24, m=16), False),
    (donut_3d, dict(n=16), False),
    (oscillating_plate_2d, dict(L=16), True),
    (tgv_3d, dict(L=16), False),
    (heaving_sphere_3d, dict(radius=4), True),
])
def test_case_steps(make, kw, remeasure):
    sim = make(dtype=jnp.float32, **kw)
    sim.step(remeasure=remeasure)
    sim.step(remeasure=remeasure)
    u = np.asarray(sim.flow.u)
    assert np.all(np.isfinite(u))
    assert sim.sim_time > 0
