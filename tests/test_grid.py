"""Grid/index-algebra and BC tests — oracles from reference test/maintests.jl:5-65."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import waterlily_tpu as wl
from waterlily_tpu.grid import loc_grid, apply_field, interp, l2
from waterlily_tpu.ops.bc import bc_vector, bc_scalar_periodic, exit_bc

f32 = jnp.float32


def test_loc():
    # reference: loc(3,CI(3,4,5)) == SVector(3,4,4.5)-1.5  (1-based)
    # 0-based cell I=(2,3,4): center at I-0.5, face-2 shifts z by -0.5
    g = loc_grid((6, 6, 6), 2, f32)
    assert np.allclose(np.asarray(g[2, 3, 4]), [1.5, 2.5, 3.0])
    g0 = loc_grid((6, 6, 6), None, f32)
    assert np.allclose(np.asarray(g0[2, 3, 4]), [1.5, 2.5, 3.5])


def test_apply_and_l2():
    # maintests.jl:22-26: p = x+y+3 at centers of a 4x5 grid -> L2(interior)=187
    p = apply_field(lambda x: x[0] + x[1] + 3, (4, 5), f32)
    assert float(l2(p)) == 187

    # maintests.jl:28-30: u[i] = loc_i
    u = apply_field(lambda i, x: x[i], (2, 5, 5), f32, vector=True)
    for i in range(3):
        for j in range(3):
            # reference u[i,j,1] == i-2 (1-based) -> 0-based u[0][i,j] == i-0.5-0.5...
            assert np.isclose(float(u[0, i, j]), i - 1.0)


def test_bc_vector():
    # maintests.jl:32-39
    key = jax.random.PRNGKey(0)
    Ng, D, U = (6, 6), 2, (1.0, 0.5)
    u = jax.random.uniform(key, (D,) + Ng, f32)
    u = bc_vector(u, U)
    un = np.asarray(u)
    # x-component: Dirichlet on x-walls (ghost + first interior + top ghost)
    assert np.all(un[0, 0, :] == U[0]) and np.all(un[0, 1, :] == U[0]) and np.all(un[0, -1, :] == U[0])
    # x-component: Neumann copy on y-walls (interior x rows 2..-2)
    assert np.all(un[0, 2:-1, 0] == un[0, 2:-1, 1])
    assert np.all(un[0, 2:-1, -1] == un[0, 2:-1, -2])
    # y-component
    assert np.all(un[1, :, 0] == U[1]) and np.all(un[1, :, 1] == U[1]) and np.all(un[1, :, -1] == U[1])
    assert np.all(un[1, 0, 2:-1] == un[1, 1, 2:-1])
    assert np.all(un[1, -1, 2:-1] == un[1, -2, 2:-1])

    # save_exit preserves the x-exit plane (maintests.jl:41-43)
    u = u.at[0, -1, :].set(3.0)
    u = bc_vector(u, U, save_exit=True)
    assert np.all(np.asarray(u)[0, -1, :] == 3.0)

    # conservative exit correction (maintests.jl:45-46)
    u = exit_bc(u, u, U, 0.0)
    assert np.allclose(np.asarray(u)[0, -1, 1:-1], U[0])

    # periodic in y with save_exit (maintests.jl:48-49)
    u = bc_vector(u, U, save_exit=True, perdir=(1,))
    un = np.asarray(u)
    assert np.all(un[0, :, 0] == un[0, :, -2]) and np.all(un[0, :, -1] == un[0, :, 1])

    # periodic scalar in both directions (maintests.jl:50-51)
    sig = jax.random.uniform(key, Ng, f32)
    sig = bc_scalar_periodic(sig, (0, 1))
    sn = np.asarray(sig)
    assert np.all(sn[0, 1:-1] == sn[-2, 1:-1]) and np.all(sn[1:-1, 0] == sn[1:-1, -2])

    # x-periodic: save_exit has no effect (maintests.jl:53-56)
    u = jax.random.uniform(key, (D,) + Ng, f32)
    u = bc_vector(u, U, save_exit=True, perdir=(0,))
    un = np.asarray(u)
    assert np.all(un[0, 0, :] == un[0, -2, :]) and np.all(un[0, -1, :] == un[0, 1, :])
    assert np.all(un[1, 0, :] == un[1, -2, :]) and np.all(un[1, -1, :] == un[1, 1, :])
    assert np.all(un[1, :, 0] == U[1]) and np.all(un[1, :, 1] == U[1]) and np.all(un[1, :, -1] == U[1])


def test_interp():
    # maintests.jl:58-64 (coordinates shifted to the physical `loc` frame:
    # reference 1-based index coordinate x_ref = x_phys + 1.5)
    a = apply_field(lambda i, x: x[i] + 1.5, (2, 5, 5), f32, vector=True)
    b = apply_field(lambda x: x[0] + 1.5, (5, 5), f32)
    assert np.allclose(np.asarray(interp(jnp.array([1.0, -0.5]), a, vector=True)), [2.5, 1.0])
    assert np.allclose(np.asarray(interp(jnp.array([2.0, 1.5]), a, vector=True)), [3.5, 3.0])
    assert np.isclose(float(interp(jnp.array([1.0, -0.5]), b)), 2.5)
    assert np.isclose(float(interp(jnp.array([2.0, 1.5]), b)), 3.5)
