"""Banded (sparse immersed-boundary) path: equivalence to the dense path.

Outside the kernel band the measured fields equal their far-field constants
*exactly* (mu1=0, V=0, mu0=1 and restricted multiples — reference
Body.jl:31-53 writes exactly these), so every banded operator is
bitwise-equal to its dense counterpart per call (asserted below).  Whole
trajectories agree to fp-fusion noise only: the banded program's different
fusion structure lets XLA contract different FMAs inside the pressure-solve
loop, which amplifies ulps over solver iterations — so trajectory checks use
a tight tolerance plus exact solver-iteration-count equality.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.grid import band_box_start
from waterlily_tpu.body import band_box_shape, AutoBody
from waterlily_tpu.models.cases import circle_2d, sphere_3d, tgv_2d


def _max_diff(a, b):
    return max(float(jnp.max(jnp.abs(a.flow.u - b.flow.u))),
               float(jnp.max(jnp.abs(a.flow.p - b.flow.p))))


@pytest.fixture(scope="module")
def sphere_pair():
    """One banded/dense sphere sim pair shared by the operator-bitwise and
    trajectory tests (each Simulation build compiles a measure+levels
    program — seconds of trace+load on the 1-core CI box)."""
    a = sphere_3d(n=32, m=32, bbox="force", banded_levels=True)
    b = sphere_3d(n=32, m=32, bbox=False)
    return a, b


def test_banded_ops_bitwise_equal(sphere_pair):
    """Each banded operator matches dense exactly on a real sphere level."""
    from waterlily_tpu.ops import poisson as P
    from waterlily_tpu.ops.multigrid import vcycle
    a, b = sphere_pair
    la, lb = a.levels[0], b.levels[0]
    assert la.banded and not lb.banded
    S = la.D.shape
    x = jax.random.normal(jax.random.PRNGKey(1), S, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(2), S, jnp.float32)
    assert float(jnp.max(jnp.abs(P.mult(la, x) - P.mult(lb, x)))) == 0.0
    ra, rb = P.residual(la, x, z), P.residual(lb, x, z)
    assert float(jnp.max(jnp.abs(ra - rb))) == 0.0
    assert float(jnp.max(jnp.abs(P._rid(la, x) - x * lb.iD))) == 0.0
    ga = P.pressure_grad_interior(la, x)
    gb = P.pressure_grad_interior(lb, x)
    assert float(jnp.max(jnp.abs(ga - gb))) == 0.0
    xa, rra = P.pcg(la, x, ra)
    xb, rrb = P.pcg(lb, x, rb)
    assert float(jnp.max(jnp.abs(xa - xb))) == 0.0
    assert float(jnp.max(jnp.abs(rra - rrb))) == 0.0
    va = vcycle(a.levels, 0, x, ra)
    vb = vcycle(b.levels, 0, x, rb)
    assert float(jnp.max(jnp.abs(va[0] - vb[0]))) == 0.0


def test_banded_measure_fields_matches_dense():
    """Narrow-band remeasure (window-only autodiff measurement) is bitwise
    equal to the dense full-grid path — 2D moving body and 3D sphere."""
    from waterlily_tpu.body import measure_fields, measure_fields_banded

    def sdf2(x, t):
        return jnp.sqrt(jnp.sum(x * x)) - 4.0

    def mp2(x, t):
        return x - jnp.array([20.0 + 2 * t, 16.0], x.dtype)

    body2 = AutoBody(sdf2, mp2)
    S2 = (50, 42)
    shp2 = band_box_shape(body2, S2)
    assert shp2 is not None
    for t in [0.0, 1.3]:
        dense = measure_fields(body2, S2, t, 1.0, (), True, jnp.float32)
        band = measure_fields_banded(body2, S2, t, 1.0, (), True,
                                     jnp.float32, shp2)
        for a, b in zip(dense, band):
            assert float(jnp.max(jnp.abs(a - b))) == 0.0

    body3 = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 14.0) ** 2)) - 4.0)
    S3 = (34, 30, 30)
    shp3 = band_box_shape(body3, S3)
    assert shp3 is not None
    dense = measure_fields(body3, S3, 0.0, 1.0, (1,), False, jnp.float32)
    band = measure_fields_banded(body3, S3, 0.0, 1.0, (1,), False,
                                 jnp.float32, shp3)
    for a, b in zip(dense, band):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_band_box_start_covers_band():
    mask = np.zeros((32, 24), bool)
    mask[10:15, 7:12] = True
    start = np.asarray(band_box_start(jnp.asarray(mask), (8, 8)))
    # box cells are [start+1, start+1+shape); band must be inside
    assert start[0] + 1 <= 10 and 15 <= start[0] + 1 + 8
    assert start[1] + 1 <= 7 and 12 <= start[1] + 1 + 8
    # clamped when the band hugs the upper wall
    mask2 = np.zeros((32, 24), bool)
    mask2[25:31, 0:5] = True
    s2 = np.asarray(band_box_start(jnp.asarray(mask2), (8, 8)))
    assert 0 <= s2[0] <= 32 - 8 - 2 and s2[1] == 0


def test_band_box_shape_gating():
    S = (34, 34)
    big = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 16.0) ** 2)) - 14.0)
    assert band_box_shape(big, S) is None          # box covers most of grid
    assert band_box_shape(None, S) is None         # no body
    small = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 16.0) ** 2)) - 4.0)
    shp = band_box_shape(small, S)
    assert shp is not None and all(s <= 32 for s in shp)


@pytest.mark.parametrize("exit_bc", [False, True])
def test_banded_matches_dense_circle(exit_bc):
    a = circle_2d(n=48, m=32, exitBC=exit_bc, bbox="force",
                  banded_levels=True)
    b = circle_2d(n=48, m=32, exitBC=exit_bc, bbox=False)
    assert a.cfg.bbox_shape is not None and b.cfg.bbox_shape is None
    # exit_bc=False alternates remeasure (covers both step programs on the
    # banded path); exit_bc=True remeasures every step — one program per sim
    for s in range(4):
        rm = (s % 2 == 0) if not exit_bc else True
        a.step(remeasure=rm)
        b.step(remeasure=rm)
    assert _max_diff(a, b) < 2e-3
    assert all((x == y).all() for x, y in zip(a.pois_n, b.pois_n))


def test_banded_matches_dense_sphere_3d(sphere_pair):
    a, b = sphere_pair
    for _ in range(3):
        a.step(remeasure=False)
        b.step(remeasure=False)
    assert _max_diff(a, b) < 1e-3


def test_banded_matches_dense_heaving_3d():
    """3D moving body under the full banded stack (windowed BDIM + narrow-
    band remeasure, dense levels — the 256^3 benchmark configuration)."""
    from waterlily_tpu.models.cases import heaving_sphere_3d
    a = heaving_sphere_3d(radius=12, amp=4, Re=100, bbox="force")
    b = heaving_sphere_3d(radius=12, amp=4, Re=100, bbox=False)
    assert a.cfg.bbox_shape is not None
    for _ in range(3):
        a.step(remeasure=True)
        b.step(remeasure=True)
    assert float(jnp.max(jnp.abs(a.flow.u - b.flow.u))) < 1e-3
    assert float(jnp.max(jnp.abs(a.flow.mu0 - b.flow.mu0))) == 0.0
    assert all((x == y).all() for x, y in zip(a.pois_n, b.pois_n))


def test_banded_box_tracks_moving_body():
    """The window corner must follow the body under remeasure."""
    L = 24
    amp = 6.0

    def sdf(x, t):
        return jnp.sqrt(jnp.sum(x * x)) - 3.0

    def mp(x, t):
        return x - jnp.array([L, L + amp * jnp.sin(0.8 * t)], x.dtype)

    from waterlily_tpu.simulation import Simulation
    a = Simulation((2 * L, 2 * L), (1, 0), 6.0, nu=0.1,
                   body=AutoBody(sdf, mp), bbox="force", banded_levels=True)
    b = Simulation((2 * L, 2 * L), (1, 0), 6.0, nu=0.1,
                   body=AutoBody(sdf, mp), bbox=False)
    starts = [np.asarray(a.flow.bbox).copy()]
    for _ in range(8):
        a.step(remeasure=True)
        b.step(remeasure=True)
        starts.append(np.asarray(a.flow.bbox).copy())
    # velocity only: pressure inside the body (dead cells) is unconstrained
    # in both paths, and near-tolerance solver-iteration flips reshuffle it
    assert float(jnp.max(jnp.abs(a.flow.u - b.flow.u))) < 5e-3
    assert max(s[1] for s in starts) > min(s[1] for s in starts)  # it moved


def test_nobody_disables_banding():
    sim = tgv_2d(L=32)
    assert sim.cfg.bbox_shape is None


def test_band_outgrowing_window_raises():
    """A band that grows past the t=0-sized static window must be a hard
    error, not silently-truncated physics."""
    from waterlily_tpu.simulation import Simulation

    def grow(x, t):  # radius 4 -> band outgrows the margin-3 window fast
        return jnp.sqrt(jnp.sum((x - 24.0) ** 2)) - (4.0 + 4.0 * t)

    sim = Simulation((48, 48), (1, 0), 8.0, nu=0.1, body=AutoBody(grow),
                     bbox="force")
    with pytest.raises(RuntimeError, match="band outgrew"):
        for _ in range(12):
            sim.step(remeasure=True)

    # and a direct measure() past the window must be all-or-nothing: the
    # caught error leaves the operator/state pair (levels, flow) untouched
    lev0, mu0_0 = sim.levels, sim.flow.mu0
    with pytest.raises(RuntimeError, match="band outgrew"):
        sim.measure(t=10.0)
    assert sim.levels is lev0
    assert sim.flow.mu0 is mu0_0


def test_band_outgrowing_window_raises_unrolled():
    """The megastep batching path (Simulation(unroll=k)) surfaces the same
    hard error and flushes the completed steps' dt history first."""
    from waterlily_tpu.simulation import Simulation

    def grow(x, t):
        return jnp.sqrt(jnp.sum((x - 24.0) ** 2)) - (4.0 + 4.0 * t)

    sim = Simulation((48, 48), (1, 0), 8.0, nu=0.1, body=AutoBody(grow),
                     bbox="force", unroll=4)
    with pytest.raises(RuntimeError, match="band outgrew"):
        sim.steps(48, remeasure=True)
    # every completed step's dt is recorded (initial dt + k per megastep)
    assert (len(sim.dts) - 1) % 4 == 0 and len(sim.dts) > 1


def test_set_body_swaps_geometry():
    """set_body rebuilds the jitted programs for the new geometry (plain
    attribute assignment would keep simulating the traced-in body)."""
    from waterlily_tpu.simulation import Simulation
    from waterlily_tpu.body import measure_sdf

    b1 = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 16.0) ** 2)) - 4.0)
    b2 = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 24.0) ** 2)) - 4.0)
    sim = Simulation((32, 32), (1, 0), 8.0, nu=0.1, body=b1)
    sim.step(remeasure=True)
    mu0_before = np.asarray(sim.flow.mu0).copy()
    sim.set_body(b2)
    sim.step(remeasure=True)
    mu0_after = np.asarray(sim.flow.mu0)
    # the solid (mu0 == 0) region must have moved to the new center
    assert (mu0_before[0, 14:19, 14:19] < 0.5).any()
    assert (mu0_after[0, 22:27, 22:27] < 0.5).any()
    assert not (mu0_after[0, 12:16, 12:16] < 0.5).any()
