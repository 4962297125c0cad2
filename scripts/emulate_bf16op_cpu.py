"""CPU dense emulation of the bf16 operator-coefficient shadows at 256^3.

The real-TPU full step NaNs at step 1 with the shadows live even though
interpret mode at 66^3 is f32-parity (docs/PERF.md round-3 addendum).  Two
hypotheses: (1) a Mosaic lowering bug in the mixed-dtype stencil, or
(2) the bf16-rounded operator's NUMERICS fail only at 256^3-class condition
numbers (A's eigenvalue ratio grows ~N^2; 66^3 is 15x better conditioned).

This script tests (2) without hardware: it applies the EXACT shadow algebra
(A16 = bf16-rounded taps upcast to f32, consistent f32 diagonal derived from
the rounded taps, bf16 Jacobi preconditioner, bf16 search directions) via
plain XLA ops on the CPU backend — no Pallas anywhere — and runs the full
256^3 sphere step.  If this diverges like the hardware run, the gate is a
numerics problem; if it is clean, Mosaic is the remaining suspect.

Variants mirror scripts/bisect_bf16.py's hardware battery:
  full    L16 + derived D16 + bf16 iD16 + bf16 eps
  l16only L16 + derived D16, f32 iD and f32 eps
  f32     unmodified control

Usage: python scripts/emulate_bf16op_cpu.py [n] [steps] [min_cells]
(default 256 3 2_000_000; min_cells lets small-grid harness self-checks
force shadows onto every level, matching the 66^3 interpret-mode pin)
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
import waterlily_tpu.ops.poisson as P  # noqa: E402
import waterlily_tpu.ops.multigrid as MG  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
MIN_CELLS = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000

# --- patch the dense operator paths to read the shadows when present --------
# (the blocked Pallas kernels do this natively; on CPU `blocked` is False so
# the flags below are the only way the shadows are exercised)

_orig_mult_interior = P._mult_interior


def _mult_interior_shadow(lev, x):
    if lev.L16 is not None:
        # taps upcast to f32 (bf16*f32 promotes), diagonal already f32:
        # exactly the kernel's register arithmetic
        return P._mult_interior_arrays(lev.L16.astype(jnp.float32),
                                       lev.D16, x)
    return _orig_mult_interior(lev, x)


P._mult_interior = _mult_interior_shadow

_orig_increment = P.increment


def _increment_shadow(lev, x, r, eps):
    if lev.L16 is not None and lev.bf16_eps:
        # the blocked increment rounds the correction to bf16 and updates
        # x and r with the SAME rounded eps (A.eps in f32 from it)
        eps = eps.astype(jnp.bfloat16)
    if lev.L16 is not None:
        ae = P.mult(lev, eps)
        return x + eps, r - ae
    return _orig_increment(lev, x, r, eps)


P.increment = _increment_shadow
MG.increment = _increment_shadow


def emulate_level(lev, *, taps=True, pre16=True, eps16=True):
    """Attach shadows to a level exactly as make_level(BF16_OP=True) does."""
    if not taps or lev.L.dtype != jnp.float32:
        return lev
    L16 = lev.L.astype(jnp.bfloat16)
    D16 = P._diag(L16.astype(jnp.float32))
    feps = jnp.finfo(jnp.float32).eps
    g16 = D16 * D16 < 2 * feps
    iD16 = jnp.where(g16, 0.0,
                     1.0 / jnp.where(g16, 1.0, D16)).astype(jnp.bfloat16)
    return lev.replace(L16=L16, D16=D16,
                       iD16=iD16 if pre16 else None,
                       bf16_eps=bool(eps16))


def would_block(S):
    """use_blocked's size gate at 256^3 on TPU: the finest two levels."""
    import math
    return len(S) == 3 and math.prod(S) >= MIN_CELLS and S[0] >= 4


def run(tag, sim, **kw):
    from waterlily_tpu.flow import mom_step
    levels = tuple(emulate_level(l, **kw) if would_block(l.D.shape) else l
                   for l in sim.levels)
    nblk = sum(1 for l in levels if l.L16 is not None)
    step = jax.jit(lambda s: mom_step(sim.cfg, levels, s))
    state = jax.tree.map(lambda a: a + 0, sim.flow)
    print(f"{tag}: shadow levels={nblk}", flush=True)
    for k in range(STEPS):
        state, aux = step(state)
        dt = float(aux["dt"])
        pn = [int(v) for v in aux["pois_n"]]
        nn = int(jnp.isnan(state.u).sum()) + int(jnp.isnan(state.p).sum())
        print(f"{tag} step {k}: pois_n={pn} dt={dt:.5f} nan={nn}", flush=True)
        if nn or dt != dt:
            print(f"{tag}: DIVERGED at step {k}", flush=True)
            return


def main():
    from waterlily_tpu.models.cases import sphere_3d
    sim = sphere_3d(n=N, m=N, Re=3700, dtype=jnp.float32)
    run("full   ", sim, taps=True, pre16=True, eps16=True)
    run("l16only", sim, taps=True, pre16=False, eps16=False)
    run("f32    ", sim, taps=False)


if __name__ == "__main__":
    main()
