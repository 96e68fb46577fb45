"""Mixed-precision iterative refinement: f64 accuracy at f32 multigrid speed.

TPU f64 is software-emulated; the BASELINE parity target is a 1e-10
residual.  Classic defect correction bridges the gap:

    loop:  r = b - A u            (float64, one emulated matvec per outer step)
           e ~ A^-1 r             (k float32 V-cycles — the fast path)
           u = u + e              (float64 accumulation)

The f32 inner solve only needs to reduce the defect by ~1e-6 per outer
iteration, so the outer loop reaches 1e-10..1e-14 in a handful of rounds
while >95% of the work runs in native-speed float32.
"""

import jax
import jax.numpy as jnp

from dgtpu.utils.norms import lp_norm


def make_refined_solver(op64, cycle32, n_inner=8, tol=1e-10, max_outer=20):
    """Build a jitted mixed-precision solver.

    ``op64``: the float64 operator (matvec).  ``cycle32(rhs32, u32)``: one
    float32 V-cycle.  Returns solve(rhs64, u0) -> (u, res, n_outer, history).
    """

    def inner_solve(r32):
        e = jnp.zeros_like(r32)
        for _ in range(n_inner):
            e = cycle32(r32, e)
        return e

    # op64 is passed as a jit ARGUMENT (it is a registered pytree), not
    # captured by closure: closure-captured arrays become HLO literals, and
    # the emulated-f64 operator blocks are by far the largest array in the
    # program (212 MB at 64x64 — large enough to exceed compile-request
    # limits on remote-compile setups)
    @jax.jit
    def solve_with_op(op64, rhs, u0):
        res0 = lp_norm(rhs - op64.matvec(u0), 2)
        hist0 = jnp.full((max_outer + 1,), jnp.nan, dtype=rhs.dtype)

        def cond(state):
            n, u, res, hist = state
            return (n < max_outer) & (res >= tol) & jnp.isfinite(res)

        def body(state):
            n, u, res, hist = state
            hist = hist.at[n].set(res)
            r = rhs - op64.matvec(u)
            e32 = inner_solve(r.astype(jnp.float32))
            u = u + e32.astype(rhs.dtype)
            res = lp_norm(rhs - op64.matvec(u), 2) / res0
            return n + 1, u, res, hist

        state = (jnp.asarray(0, dtype=jnp.int32), u0,
                 jnp.asarray(1.0, dtype=rhs.dtype), hist0)
        n, u, res, hist = jax.lax.while_loop(cond, body, state)
        hist = hist.at[n].set(res)
        return u, res, n, hist

    def solve(rhs, u0):
        return solve_with_op(op64, rhs, u0)

    return solve
