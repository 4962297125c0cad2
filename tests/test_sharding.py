"""Spatial domain decomposition tests on the virtual 8-device CPU mesh.

The sharded step must (a) compile and execute under GSPMD and (b) produce
bitwise/close results to the single-device step.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.flow import FlowConfig, flow_init, mom_step
from waterlily_tpu.ops.multigrid import build_levels
from waterlily_tpu.parallel.mesh import make_mesh, sharded_step_fn

f32 = jnp.float32


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    mesh2 = make_mesh(8, axes=("x", "y"))
    assert mesh2.devices.size == 8 and len(mesh2.axis_names) == 2


@pytest.mark.parametrize("axes,perdir", [(("x",), ()), (("x", "y"), ()),
                                         (("x",), (0, 1))])
def test_sharded_step_matches_single(axes, perdir):
    cfg = FlowConfig(D=2, S=(66, 66), U=(1.0, 0.0), nu=0.01, dtype=f32,
                     perdir=perdir)

    def ulam(i, x):
        return jnp.where(i == 0, 1.0 + 0.05 * jnp.sin(x[1] / 4), 0.0)

    state = flow_init(cfg, ulam)
    levels = build_levels(state.mu0, perdir)

    ref, aux_ref = jax.jit(lambda s, l: mom_step(cfg, l, s))(state, levels)

    mesh = make_mesh(8, axes=axes)
    step = sharded_step_fn(cfg, mesh)
    out, aux = step(state, levels)

    assert np.allclose(np.asarray(ref.u), np.asarray(out.u), atol=1e-5)
    assert np.allclose(np.asarray(ref.p), np.asarray(out.p), atol=1e-4)
    assert int(aux["pois_n"][0]) == int(aux_ref["pois_n"][0])
