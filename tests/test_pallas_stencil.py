"""Blocked (streaming) Pallas stencil kernels vs the XLA reference path.

Interpreter mode on CPU; real-TPU execution is exercised by bench runs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.ops.bc import bc_vector
from waterlily_tpu.ops.poisson import make_level, mult, increment
from waterlily_tpu.ops.pallas_stencil import (mult3d_pallas, increment3d_pallas,
                                              HAS_PALLAS)

pytestmark = pytest.mark.skipif(not HAS_PALLAS, reason="pallas unavailable")

f32 = jnp.float32


@pytest.fixture
def level_and_fields():
    S = (34, 34, 34)
    key = jax.random.PRNGKey(0)
    L = bc_vector(jax.random.uniform(key, (3,) + S, f32) + 0.5, (0.0,) * 3)
    lev = make_level(L)
    x = jax.random.normal(key, S, f32)
    interior = jnp.zeros(S, bool).at[1:-1, 1:-1, 1:-1].set(True)
    r = jnp.where(interior, jax.random.normal(jax.random.PRNGKey(1), S, f32), 0)
    eps = jnp.where(interior,
                    0.1 * jax.random.normal(jax.random.PRNGKey(2), S, f32), 0)
    return S, lev, x, r, eps


@pytest.mark.parametrize("block", [2, 4, 5])  # 5 exercises the ragged path
def test_blocked_mult(level_and_fields, block):
    S, lev, x, r, eps = level_and_fields
    z_ref = mult(lev, x)
    z_pl = mult3d_pallas(lev.L, lev.D, x, S, interpret=True, block=block)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)


@pytest.mark.parametrize("block", [2, 4])
def test_blocked_increment(level_and_fields, block):
    S, lev, x, r, eps = level_and_fields
    x_ref, r_ref = increment(lev, x, r, eps)
    x_pl, r_pl = increment3d_pallas(lev.L, lev.D, eps, x, r, S,
                                    interpret=True, block=block)
    assert np.allclose(np.asarray(x_ref), np.asarray(x_pl), atol=1e-6)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)


def test_blocked_conv_diff():
    from waterlily_tpu.ops.convect import conv_diff, quick
    from waterlily_tpu.ops.pallas_stencil import conv_diff3d_pallas
    S = (18, 14, 18)
    u = jax.random.normal(jax.random.PRNGKey(0), (3,) + S, f32)
    r_ref = conv_diff(u, 0.05)
    r_pl = conv_diff3d_pallas(u, 0.05, quick, S, interpret=True)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)
