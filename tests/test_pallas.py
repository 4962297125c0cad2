"""Pallas kernel correctness: the fused PCG must match the XLA reference
path.  Runs in interpreter mode on CPU (real-TPU execution is exercised by
bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.ops.bc import bc_vector
from waterlily_tpu.ops.poisson import make_level, pcg, residual
from waterlily_tpu.ops.pallas_kernels import pcg_pallas, HAS_PALLAS

f32 = jnp.float32

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")


@pytest.mark.parametrize("shape,perdir", [((18, 18), ()), ((10, 14), (1,)),
                                          ((10, 10, 10), ())])
def test_pcg_pallas_matches_xla(shape, perdir):
    D = len(shape)
    key = jax.random.PRNGKey(0)
    L = bc_vector(jnp.ones((D,) + shape, f32), (0.0,) * D, perdir=perdir)
    lev = make_level(L, perdir)
    z = jax.random.normal(key, shape, f32) * 0.1
    x0 = jnp.zeros(shape, f32)
    r = residual(lev, x0, z)
    x_ref, r_ref = pcg(lev, x0, r)
    x_pl, r_pl = pcg_pallas(lev, x0, r, interpret=True)
    assert np.allclose(np.asarray(x_ref), np.asarray(x_pl), atol=1e-5)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)
