"""Attic kernels (retired, never dispatched): one interpret-mode parity test
per family so the documented negative results stay runnable (VERDICT r4
weak #5 — the numbers live in docs/PERF.md; the code in ops/attic.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.ops.bc import bc_vector
from waterlily_tpu.ops.poisson import make_level, mult, increment, pcg
from waterlily_tpu.ops.pallas_stencil import HAS_PALLAS

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


def test_stream_mult_and_increment_match(level_and_fields):
    """Carried-rows streaming kernels equal the XLA operator (incl. the
    fused dot and the indivisible-slab fallback)."""
    from waterlily_tpu.ops.attic import mult3d_stream, increment3d_stream
    S, lev, x, r, eps = level_and_fields
    z_ref = mult(lev, x)
    z_pl, dot = mult3d_stream(lev.L, lev.D, x, S, interpret=True,
                              block=2, with_dot=True)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_pl), atol=1e-5)
    assert np.isclose(float(dot), float(jnp.sum(z_ref * x)), rtol=1e-5)
    # 34 % 5 != 0: must route to the halo-row kernel and stay correct
    z_fb = mult3d_stream(lev.L, lev.D, x, S, interpret=True, block=5)
    assert np.allclose(np.asarray(z_ref), np.asarray(z_fb), atol=1e-5)
    x_ref, r_ref = increment(lev, x, r, eps)
    x_pl, r_pl = increment3d_stream(lev.L, lev.D, eps, x, r, S,
                                    interpret=True, block=2)
    assert np.allclose(np.asarray(x_ref), np.asarray(x_pl), atol=1e-6)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=1e-5)


def test_pcg_blocked_matches_xla(level_and_fields, monkeypatch):
    """Fused-iteration PCG sweeps vs ops.poisson.pcg: same dead-mask
    algebra, only dot association/FMA contraction differ."""
    from waterlily_tpu.ops import attic
    S, lev, x, r, eps = level_and_fields
    x_ref, r_ref = pcg(lev, x, r, it=6)
    monkeypatch.setattr(attic, "block_for_pcgiter", lambda *a, **k: 2)
    x_pl, r_pl = attic.pcg_blocked(lev, x, r, it=6, interpret=True)
    assert x_pl.dtype == x.dtype and r_pl.dtype == r.dtype
    assert np.allclose(np.asarray(x_ref), np.asarray(x_pl), atol=2e-5)
    assert np.allclose(np.asarray(r_ref), np.asarray(r_pl), atol=2e-5)


def test_attic_is_not_dispatched():
    """The retired kernels must stay undispatched: no module-level import
    of ops.attic anywhere in the package (the A/B losses in docs/PERF.md
    are the record), and the two function-scope dispatch seams that keep
    the round-5 A/Bs one-flag reproducible (`ops.poisson.KDOT`/`KAXPY`
    → attic dot/axpy kernels) ship OFF."""
    import ast
    import pathlib
    import waterlily_tpu
    from waterlily_tpu.ops import poisson
    assert poisson.KDOT is False and poisson.KAXPY is False
    pkg = pathlib.Path(waterlily_tpu.__file__).parent
    for p in pkg.rglob("*.py"):
        if p.name == "attic.py":
            continue
        for node in ast.parse(p.read_text()).body:
            if isinstance(node, ast.Import):
                names = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                names = [node.module or ""] + [a.name for a in node.names]
            else:
                continue
            assert not any("attic" in n for n in names), p


@pytest.mark.parametrize("block", [2, 5, 8])  # 5/8 = ragged at 34 rows
def test_dot3d_pallas(level_and_fields, block):
    """Blocked partial-sum dot vs field_dot on ghost-zero operands (the
    solver's rho/rho2/r·r streams — round-5 reduction kernels)."""
    from waterlily_tpu.grid import field_dot
    from waterlily_tpu.ops.attic import dot3d_pallas
    S, lev, x, r, eps = level_and_fields
    d = dot3d_pallas(r, eps, S, interpret=True, block=block)
    assert np.isclose(float(d), float(field_dot(r, eps)), rtol=1e-5)
    # one-operand (r·r) variant streams a single input
    d2 = dot3d_pallas(r, r, S, interpret=True, block=block)
    assert np.isclose(float(d2), float(field_dot(r, r)), rtol=1e-5)


@pytest.mark.parametrize("block", [2, 8])
def test_dot3d_rid_mode(level_and_fields, block):
    """mode='rid': ⟨r, r∘iD⟩ without materializing the product — same
    multiply order as z2 = r*iD; rho2 = Σ r·z2 (bf16 iD upcast included)."""
    from waterlily_tpu.grid import field_dot
    from waterlily_tpu.ops.attic import dot3d_pallas
    S, lev, x, r, eps = level_and_fields
    ref = field_dot(r, r * lev.iD)
    d = dot3d_pallas(r, lev.iD, S, interpret=True, block=block, mode="rid")
    assert np.isclose(float(d), float(ref), rtol=1e-5)


@pytest.mark.parametrize("block", [2, 8])
def test_pcg_axpy_pallas(level_and_fields, block):
    """Fused axpy pair + next-rho sweep vs the XLA expressions (equal up
    to FMA-contraction ulps — the same property as project3d_pallas —
    and rho2 to sum-association ulps)."""
    from waterlily_tpu.grid import field_dot
    from waterlily_tpu.ops.attic import pcg_axpy_pallas
    S, lev, x, r, eps = level_and_fields
    z = jax.random.normal(jax.random.PRNGKey(9), S, f32)
    z = jnp.where(jnp.zeros(S, bool).at[1:-1, 1:-1, 1:-1].set(True), z, 0)
    upd = jnp.float32(0.37)
    for e in (eps, eps.astype(jnp.bfloat16)):
        x_ref = x + upd * e.astype(f32)
        r_ref = r - upd * z
        rho_ref = field_dot(r_ref, r_ref * lev.iD)
        xo, ro, rho = pcg_axpy_pallas(x, r, e, z, lev.iD, upd,
                                      interpret=True, block=block)
        assert np.allclose(np.asarray(x_ref), np.asarray(xo), atol=2e-6)
        assert np.allclose(np.asarray(r_ref), np.asarray(ro), atol=2e-6)
        assert np.isclose(float(rho), float(rho_ref), rtol=1e-5)
