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


@pytest.mark.parametrize("block", [1, 2, 4, 5])  # 5 = ragged, 1 = 320^3-class dispatch
def test_blocked_mult(level_and_fields, block):
    S, lev, x, r, eps = level_and_fields
    z_ref = mult(lev, x)
    z_pl = mult3d_pallas(lev.L, lev.D, x, S, interpret=True, block=block)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)


def test_blocked_mult_bf16_coeffs(level_and_fields):
    """bf16 L/D shadows (the level's reduced-precision operator stream):
    the kernel equals the f32 slice-form operator applied to the SAME
    bf16-rounded coefficients — the rounding is the only difference."""
    from waterlily_tpu.ops.poisson import _mult_interior_arrays, _diag
    from waterlily_tpu.grid import pad_interior
    S, lev, x, r, eps = level_and_fields
    L16 = lev.L.astype(jnp.bfloat16)
    D16 = _diag(L16.astype(f32))  # production mix: bf16 taps, f32 diagonal
    z_ref = pad_interior(_mult_interior_arrays(L16.astype(f32), D16, x))
    z_pl, dot = mult3d_pallas(L16, D16, x, S, interpret=True, block=2,
                              with_dot=True)
    assert z_pl.dtype == f32
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)
    assert np.isclose(float(dot), float(jnp.sum(z_ref * x)), rtol=1e-5)
    # increment with the bf16 coefficient stream keeps x/r in f32
    x2, r2 = increment3d_pallas(L16, D16, eps, x, r, S, interpret=True,
                                block=2)
    assert x2.dtype == f32 and r2.dtype == f32
    assert np.allclose(np.asarray(r2), np.asarray(
        r - pad_interior(_mult_interior_arrays(L16.astype(f32), D16, eps))),
        atol=1e-5)


def test_level_bf16_shadows(level_and_fields, monkeypatch):
    """make_level builds L16/D16/iD16 exactly when the level is blocked +
    bf16; _opLD and _rid pick the shadows; constrain-style replace clears
    them."""
    from waterlily_tpu.ops import poisson as pois
    from waterlily_tpu.ops import pallas_stencil as ps
    S, lev, x, r, eps = level_and_fields
    assert lev.L16 is None  # CPU levels are never blocked
    monkeypatch.setattr(ps, "use_blocked", lambda *a, **k: True)
    monkeypatch.setattr(pois, "BF16_OP", True)
    lev16 = pois.make_level(lev.L)
    assert lev16.L16 is not None
    # a shadowed level forces f32 search directions: bf16 eps COMPOUNDED
    # with the bf16 operator lifts the MG convergence floor above tol
    # (scripts/solve_local.py hardware trace)
    assert not lev16.bf16_eps
    assert lev16.L16.dtype == jnp.bfloat16
    # the explicit kwarg overrides the module default in both directions
    lev_off = pois.make_level(lev.L, op_bf16=False)
    assert lev_off.L16 is None and lev_off.bf16_eps
    monkeypatch.setattr(pois, "BF16_OP", False)
    lev_on = pois.make_level(lev.L, op_bf16=True)
    assert lev_on.L16 is not None and not lev_on.bf16_eps
    monkeypatch.setattr(pois, "BF16_OP", True)
    assert lev16.iD16.dtype == jnp.bfloat16
    # D16 must be the f32 diagonal DERIVED from the rounded taps (exact
    # zero row sums -> weak diagonal dominance; bf16(D) diverges)
    assert lev16.D16.dtype == f32
    assert np.array_equal(np.asarray(lev16.D16),
                          np.asarray(pois._diag(lev16.L16.astype(f32))))
    La, Da = pois._opLD(lev16)
    assert La is lev16.L16 and Da is lev16.D16
    # the dead-cell guard (iD == 0) survives the rounding exactly
    assert np.array_equal(np.asarray(lev16.iD16 == 0),
                          np.asarray(lev16.iD == 0))
    z = pois._rid(lev16, r)
    assert z.dtype == f32
    assert np.allclose(np.asarray(z),
                       np.asarray(r * lev16.iD16.astype(f32)))
    off = lev16.replace(L16=None, D16=None, iD16=None, bf16_eps=False)
    La, Da = pois._opLD(off)
    assert La is off.L and np.allclose(np.asarray(pois._rid(off, r)),
                                       np.asarray(r * off.iD))


@pytest.mark.parametrize("block", [1, 2, 5])
def test_blocked_mult_with_dot(level_and_fields, block):
    """In-kernel ⟨A·x, x⟩ partial sums (the PCG alpha denominator) match the
    separate vdot to fp accumulation-order noise."""
    S, lev, x, r, eps = level_and_fields
    z_ref = mult(lev, x)
    z_pl, dot = mult3d_pallas(lev.L, lev.D, x, S, interpret=True,
                              block=block, with_dot=True)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)
    assert np.isclose(float(dot), float(jnp.sum(z_ref * x)), rtol=1e-5)


# carried-rows streaming kernels: retired to ops/attic.py (measured 40-70%
# slower than the halo-row kernels; docs/PERF.md round 3) — one interpret
# parity test each lives in tests/test_attic.py


@pytest.mark.parametrize("block", [2, 4, 5])  # 4,5 exercise ragged tails
def test_ana_mult_matches_banded_far_field(level_and_fields, block):
    """The analytic (no-coefficient-reads) kernel equals the XLA banded
    far-field operator, including the fused dot on ragged grids."""
    from waterlily_tpu.ops.pallas_stencil import ana_mult3d_pallas
    from waterlily_tpu.ops.poisson import make_level, mult
    from waterlily_tpu.ops.bc import bc_vector
    S, lev, x, r, eps = level_and_fields
    # body-free far field: L = 1 with wall-normal faces zeroed (exactly
    # flow_init's mu0) — the analytic kernel reproduces this from indices
    Lw = bc_vector(jnp.ones((3,) + S, f32), (0.0,) * 3, False, ())
    z_ref = mult(make_level(Lw), x)
    z_pl = ana_mult3d_pallas(x, 1.0, interpret=True, block=block)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)
    z2, dot = ana_mult3d_pallas(x, 1.0, interpret=True, block=block,
                                with_dot=True)
    assert np.allclose(np.asarray(z_pl), np.asarray(z2), atol=0)
    assert np.isfinite(float(dot))
    assert np.isclose(float(dot), float(jnp.sum(z_ref * x)), rtol=1e-5)


@pytest.mark.parametrize("block", [1, 2, 4])
def test_blocked_increment(level_and_fields, block):
    S, lev, x, r, eps = level_and_fields
    x_ref, r_ref = increment(lev, x, r, eps)
    x_pl, r_pl = increment3d_pallas(lev.L, lev.D, eps, x, r, S,
                                    interpret=True, block=block)
    assert np.allclose(np.asarray(x_ref), np.asarray(x_pl), atol=1e-6)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)


def test_bf16_shadow_solve_matches_f32(monkeypatch):
    """Integration pin for the reduced-precision operator path: a full
    multigrid solve on blocked levels with L16/D16/iD16 shadows (interpret
    mode) converges with the SAME iteration count as the f32 operator and
    comparable residual quality.  This is the oracle that catches the
    independently-rounded-diagonal failure class (docs/PERF.md round 3:
    bf16(D) breaks the zero row sums and the smoother diverges)."""
    from waterlily_tpu.ops import poisson as pois
    from waterlily_tpu.ops import pallas_stencil as ps
    from waterlily_tpu.ops.multigrid import build_levels, ml_solve
    from waterlily_tpu.grid import field_dot

    S = (18, 18, 18)
    key = jax.random.PRNGKey(3)
    # band-like coefficients: mostly exact 1.0 (bf16-exact far field) with
    # a fractional shell, like a body's mu0
    L = jnp.ones((3,) + S, f32)
    frac = jax.random.uniform(key, (3,) + S) < 0.15
    L = jnp.where(frac, jax.random.uniform(jax.random.PRNGKey(4), (3,) + S,
                                           dtype=f32), L)
    L = bc_vector(L, (0.0,) * 3).astype(f32)
    z = jnp.zeros(S, f32).at[1:-1, 1:-1, 1:-1].set(
        jax.random.normal(jax.random.PRNGKey(5), (16, 16, 16), dtype=f32))
    z = z - jnp.mean(z)

    # only the finest level runs blocked: the shadow algebra is identical
    # per level, and every interpret-mode pallas call costs ~100 ms of
    # Python on the 1-core CI box (coarse pcg smoothers dominate the count)
    monkeypatch.setattr(ps, "use_blocked",
                        lambda S_, dt_, sharded=False: (not sharded)
                        and min(S_) >= 18)
    for name in ("mult3d_pallas", "increment3d_pallas"):
        orig = getattr(ps, name)
        monkeypatch.setattr(ps, name,
                            lambda *a, _o=orig, **k: _o(*a, **{**k,
                                                       "interpret": True}))
    levs_f32 = build_levels(L, bf16_eps=False)
    monkeypatch.setattr(pois, "BF16_OP", True)
    levs_16 = build_levels(L, bf16_eps=True)
    assert levs_16[0].blocked and levs_16[0].L16 is not None

    x0 = jnp.zeros(S, f32)
    xa, ra, na = ml_solve(levs_f32, x0, z, tol=1e-4, itmx=8)
    xb, rb, nb = ml_solve(levs_16, x0, z, tol=1e-4, itmx=8)
    r2a, r2b = float(field_dot(ra, ra)), float(field_dot(rb, rb))
    assert int(na) == int(nb), (int(na), int(nb))
    assert np.isfinite(r2b) and r2b < 1e-4
    assert r2b < 10 * max(r2a, 1e-12)
    # solutions agree to the bf16 operator-perturbation level
    scale = float(jnp.std(xa)) + 1e-12
    assert float(jnp.max(jnp.abs(xa - xb))) < 0.05 * scale


def test_blocked_conv_diff():
    from waterlily_tpu.ops.convect import conv_diff, quick
    from waterlily_tpu.ops.pallas_stencil import conv_diff3d_pallas
    S = (18, 14, 18)
    u = jax.random.normal(jax.random.PRNGKey(0), (3,) + S, f32)
    r_ref = conv_diff(u, 0.05)
    r_pl = conv_diff3d_pallas(u, 0.05, quick, S, interpret=True)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)


@pytest.mark.parametrize("perdir", [(0,), (1,), (2,), (0, 2), (0, 1, 2)])
def test_blocked_conv_diff_periodic(perdir):
    """Periodic flux variants in the blocked conv kernel (ϕuP wrap + the
    top-face flux copy, reference src/Flow.jl:7,60) equal the XLA
    gather-form core per direction and for the fully periodic 3D-TGV
    class (round-3 verdict item 4)."""
    from waterlily_tpu.ops.convect import conv_core, quick
    from waterlily_tpu.ops.bc import bc_vector
    from waterlily_tpu.ops.pallas_stencil import conv_diff3d_pallas
    S = (16, 14, 18)
    u = jax.random.normal(jax.random.PRNGKey(1), (3,) + S, f32)
    # conv_diff reads periodic-filled ghosts in production; fill them so the
    # test state matches the real contract (equality holds either way)
    u = bc_vector(u, (0.0, 0.0, 0.0), False, perdir)
    up = jnp.pad(u, [(0, 0)] + [(2, 2)] * 3)
    r_ref = conv_core(up, S, S, None, 0.05, perdir, quick, u_wrap=u)
    r_pl = conv_diff3d_pallas(u, 0.05, quick, S, interpret=True,
                              perdir=perdir)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)


@pytest.mark.parametrize("perdir", [(), (1,), (0, 2), (0, 1, 2)])
@pytest.mark.parametrize("save_exit", [False, True])
def test_bc3d_pallas_bitwise(perdir, save_exit):
    """The fused BC kernel is BITWISE equal to the sequential DUS chain —
    ghost corners included — across periodic/Dirichlet/exit variants and a
    ragged slab tail (10 % 4 != 0)."""
    from waterlily_tpu.ops.bc import bc_vector
    from waterlily_tpu.ops.pallas_stencil import bc3d_pallas
    S = (10, 9, 12)
    u = jax.random.normal(jax.random.PRNGKey(3), (3,) + S, f32)
    A = (1.0, 0.5, -0.25)
    ref = bc_vector(u, A, save_exit, perdir)          # DUS path (no fuse)
    out = bc3d_pallas(u, A, save_exit, perdir, interpret=True, block=4)
    assert (np.asarray(ref) == np.asarray(out)).all()


@pytest.mark.parametrize("block", [1, 2])
def test_project3d_pallas_bitwise(level_and_fields, block):
    """The fused projection tail equals the XLA chain (interior gradient +
    ghost-pad + subtract, p rescale) on a real coefficient level — up to
    FMA-contraction rounding (~1e-6); p and ghost rows of u are exact."""
    from waterlily_tpu.grid import pad_interior
    from waterlily_tpu.ops.poisson import pressure_grad_interior
    from waterlily_tpu.ops.pallas_stencil import project3d_pallas
    S, lev, x, r, eps = level_and_fields
    u = jax.random.normal(jax.random.PRNGKey(7), (3,) + S, f32)
    dt = jnp.float32(0.37)
    upd = pressure_grad_interior(lev, x)
    u_ref = u - pad_interior(upd, lead=1)
    p_ref = x / dt
    u_pl, p_pl = project3d_pallas(lev.L, x, u, dt, interpret=True,
                                  block=block)
    assert np.allclose(np.asarray(u_ref), np.asarray(u_pl), atol=1e-5)
    assert (np.asarray(p_ref) == np.asarray(p_pl)).all()
    # ghosts pass u through untouched (pad_interior semantics) — exact
    assert (np.asarray(u_ref)[:, 0] == np.asarray(u_pl)[:, 0]).all()
    assert (np.asarray(u_ref)[:, -1] == np.asarray(u_pl)[:, -1]).all()


@pytest.mark.parametrize("block", [1, 2])
def test_div3d_pallas(level_and_fields, block):
    """Fused divergence + warm start equals flow.div and p*dt (p exact)."""
    from waterlily_tpu.flow import div
    from waterlily_tpu.ops.pallas_stencil import div3d_pallas
    S, lev, x, r, eps = level_and_fields
    u = jax.random.normal(jax.random.PRNGKey(11), (3,) + S, f32)
    p = jax.random.normal(jax.random.PRNGKey(12), S, f32)
    dt = jnp.float32(0.42)
    z_ref = div(u)
    z_pl, x_pl = div3d_pallas(u, p, dt, interpret=True, block=block)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)
    assert (np.asarray(p * dt) == np.asarray(x_pl)).all()
    # ghost rows of z are exactly zero (pad_interior semantics)
    assert (np.asarray(z_pl)[0] == 0).all() and (np.asarray(z_pl)[-1] == 0).all()


def test_bc3d_gate(monkeypatch):
    """Fused BC dispatches only for big 3D f32 on TPU, and only when the
    caller passes fuse_ok (sharded programs must keep the DUS lowering)."""
    from waterlily_tpu.ops import pallas_stencil as ps
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert ps.use_bc3d((258, 258, 258), f32) is True
    assert ps.use_bc3d((18, 18, 18), f32) is False
    assert ps.use_bc3d((258, 258), f32) is False
    assert ps.use_bc3d((258, 258, 258), jnp.float64) is False


def test_use_blocked_gates_off_when_sharded(monkeypatch):
    """GSPMD cannot partition Mosaic custom calls: the dispatch gate must be
    off for sharded layouts even on TPU at qualifying sizes."""
    from waterlily_tpu.ops import pallas_stencil as ps
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    S = (258, 258, 258)
    assert ps.use_blocked(S, f32) is True
    assert ps.use_blocked(S, f32, sharded=True) is False
    # other gates unchanged
    assert ps.use_blocked((18, 18, 18), f32) is False      # too small
    assert ps.use_blocked(S, jnp.float64) is False          # dtype
    assert ps.use_blocked((258, 258), f32) is False         # 2D


def test_pcg_auto_falls_back_when_sharded(monkeypatch):
    """pcg_auto must take the XLA path for sharded levels even on TPU."""
    from waterlily_tpu.ops import pallas_kernels as pk
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    S = (10, 10)
    L = bc_vector(jnp.ones((2,) + S, f32), (0.0,) * 2)
    lev = make_level(L, sharded=True)
    assert lev.sharded and not lev.blocked
    x = jnp.zeros(S, f32)
    r = jnp.zeros(S, f32)
    called = {}

    def sentinel(lev, x, r, it):
        called["xla"] = True
        return x, r

    pk.pcg_auto(lev, x, r, 6, xla_pcg=sentinel)
    assert called.get("xla")


def test_build_levels_threads_sharded_flag(monkeypatch):
    from waterlily_tpu.ops.multigrid import build_levels, update_levels
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    mu0 = bc_vector(jnp.ones((3, 130, 130, 130), f32), (0.0,) * 3)
    levs = build_levels(mu0, sharded=True)
    assert all(l.sharded and not l.blocked for l in levs)
    levs2 = update_levels(levs, mu0)
    assert all(l.sharded and not l.blocked for l in levs2)


def test_constrain_levels_forces_sharded_flags():
    from waterlily_tpu.ops.multigrid import build_levels
    from waterlily_tpu.parallel.mesh import make_mesh, constrain_levels
    mu0 = bc_vector(jnp.ones((2, 34, 34), f32), (0.0,) * 2)
    levs = build_levels(mu0)          # built WITHOUT the flag
    mesh = make_mesh(8)
    # constraints only work inside jit (uneven N+2 dims); static flags ride
    # the output pytree structure, so the jitted result carries them
    out = jax.jit(lambda l: constrain_levels(l, mesh))(levs)
    assert all(l.sharded and not l.blocked for l in out)
    # region budget: tiny levels stay on GSPMD forms (no lev.mesh — each
    # shard_map region costs ~3 ms on the tunnel runtime regardless of
    # level size, docs/PERF.md round 4); forcing the threshold to 0
    # attaches the mesh to every evenly-divided level
    assert all(l.mesh is None for l in out)
    from waterlily_tpu.parallel import mesh as pmesh
    old = pmesh.SHARDMAP_MIN_CELLS
    try:
        pmesh.SHARDMAP_MIN_CELLS = 0
        out0 = jax.jit(lambda l: constrain_levels(l, mesh))(levs)
    finally:
        pmesh.SHARDMAP_MIN_CELLS = old
    assert out0[0].mesh is not None


def test_bf16_operator_gate_default_off():
    """The operator-coefficient shadows stay gated OFF by default until the
    real-TPU mixed-dtype NaN is root-caused (docs/PERF.md round-3: the
    algebra is exonerated by CPU emulation; the compilation is not).  An
    accidental default flip must fail loudly, not ship via bench."""
    import waterlily_tpu.ops.poisson as pois
    assert pois.BF16_OP is False
    # make_level must not build shadows while the gate is off
    from waterlily_tpu.ops.poisson import make_level
    import jax.numpy as _jnp
    L = _jnp.ones((2, 10, 10), _jnp.float32)
    assert make_level(L).L16 is None


# fused-iteration PCG sweeps (pcg_dir_mult/pcg_update/pcg_blocked): retired
# to ops/attic.py (measured 0.968x at 256^3, scripts/ab_pcgiter.py) — one
# interpret parity test lives in tests/test_attic.py, which also asserts
# structurally that nothing in the package imports the attic.


@pytest.mark.parametrize("block", [1, 4, 5])
def test_cfl3d_pallas_bitwise(block):
    """Blocked CFL partial-max reduction: max is association-free and the
    per-term algebra matches flow.cfl, so the dt is bitwise-equal."""
    from waterlily_tpu.flow import cfl
    from waterlily_tpu.ops.pallas_stencil import cfl3d_pallas
    S = (18, 34, 34)
    u = jax.random.normal(jax.random.PRNGKey(7), (3,) + S, f32)
    nu = 0.04
    ref = cfl(u, nu)
    mx = cfl3d_pallas(u, S, interpret=True, block=block)
    got = jnp.minimum(jnp.asarray(10.0, f32), 1.0 / (mx + 5 * nu))
    assert float(ref) == float(got)


def test_fdot_dispatch_gates(monkeypatch):
    """fdot uses the kernel only on blocked levels; the KDOT knob and
    non-blocked levels keep grid.field_dot (GSPMD-safe)."""
    from waterlily_tpu.ops import poisson
    S = (10, 10, 10)
    L = bc_vector(jnp.ones((3,) + S, f32), (0.0,) * 3)
    lev = make_level(L)
    assert not lev.blocked  # CPU: use_blocked is False
    r = jnp.zeros(S, f32).at[2, 3, 4].set(1.5)
    assert float(poisson.fdot(lev, r, r)) == 2.25
    called = {}

    def boom(*a, **k):
        called["hit"] = True
        raise AssertionError("kernel dot must not dispatch here")

    monkeypatch.setattr("waterlily_tpu.ops.attic.dot3d_pallas", boom)
    poisson.fdot(lev, r, r)
    lev_b = lev.replace(blocked=True)
    monkeypatch.setattr(poisson, "KDOT", False)
    poisson.fdot(lev_b, r, r)
    assert "hit" not in called


