"""Standalone-smoother solve driver with residual tracking and divergence guard.

Reference: ``Solver.solve_smoother`` (solver.py:61-66) and the
residual-tracked ``block_gauss_seidel_pyamg`` loop (relaxation.py:197-218):
sweep until the normalized residual drops below 1e-6, diverges above 1e10,
or ``max_iterations`` is reached.  The loop runs on device as a
``lax.while_loop``; divergence returns a status code instead of ``exit()``.

Status codes: 0 = converged, 1 = max iterations, 2 = diverged.
"""

import jax
import jax.numpy as jnp

from dgtpu.ops.smoothers import (SMOOTHER_ALIASES, apply_smoother,
                                 block_diag_inv, estimate_rho_dinv_a,
                                 normalize_smoother_name)
from dgtpu.utils.jitting import const_jit
from dgtpu.utils.norms import lp_norm


def residual_tracked_smoother(op, rhs, u0=None, name="block_gauss_seidel",
                              direction="symmetric", max_iterations=100,
                              tol=1e-6, div_tol=1e10, omega=1.0,
                              strategy="sequential", colors=None, Dinv=None,
                              degree=3):
    """Sweep-until-converged smoother solve; returns (u, residuals, n, status).

    ``degree`` is the Chebyshev polynomial degree applied per tracked sweep
    (ignored for other smoothers) — the same knob ``fixed_sweeps_smoother``
    exposes through its ``iterations`` argument, so both drivers honor the
    configured setting (advisor r3, relaxation_driver.py:40).
    """
    if u0 is None:
        u0 = jnp.zeros_like(rhs)
    if Dinv is None:
        Dinv = block_diag_inv(op)
    max_iterations = int(max_iterations)
    # chebyshev: rho(D^-1 A) must be estimated eagerly (power iteration)
    # before tracing; one "sweep" of the tracked loop is one degree-`degree`
    # polynomial application (default 3 matvecs, comparable work to
    # symmetric GS)
    is_cheby = SMOOTHER_ALIASES[normalize_smoother_name(name)] == "cheby"
    eig_max = 1.1 * estimate_rho_dinv_a(op, Dinv) if is_cheby else None

    def one_sweep(u):
        return apply_smoother(name, op, rhs, u, direction=direction, omega=omega,
                              iterations=int(degree) if is_cheby else 1,
                              Dinv=Dinv,
                              strategy=strategy, colors=colors, eig_max=eig_max)

    @const_jit
    def run(rhs, u0):
        res0 = lp_norm(rhs - op.matvec(u0), 2)
        hist0 = jnp.full((max_iterations,), jnp.nan, dtype=rhs.dtype)

        def cond(state):
            n, u, res, hist = state
            return (n < max_iterations) & (res >= tol) & (res <= div_tol) & jnp.isfinite(res)

        def body(state):
            n, u, res, hist = state
            u = one_sweep(u)
            res = lp_norm(rhs - op.matvec(u), 2) / res0
            hist = hist.at[n].set(res)
            return n + 1, u, res, hist

        n0 = jnp.asarray(0, dtype=jnp.int64 if rhs.dtype == jnp.float64 else jnp.int32)
        res_init = lp_norm(rhs - op.matvec(u0), 2) / res0
        n, u, res, hist = jax.lax.while_loop(cond, body, (n0, u0, res_init, hist0))
        # NaN/Inf residuals are divergence, not max-iterations: `res > div_tol`
        # is False for NaN, so the isfinite term is required for status 2.
        status = jnp.where(res < tol, 0,
                           jnp.where((res > div_tol) | ~jnp.isfinite(res), 2, 1))
        return u, hist, n, status

    return run(rhs, u0)


def fixed_sweeps_smoother(op, rhs, u0=None, name="block_gauss_seidel",
                          direction="symmetric", iterations=100, omega=1.0,
                          strategy="sequential", colors=None):
    """The reference's non-tracked path: exactly N sweeps (solver.py:65)."""
    if u0 is None:
        u0 = jnp.zeros_like(rhs)
    Dinv = block_diag_inv(op)
    is_cheby = SMOOTHER_ALIASES[normalize_smoother_name(name)] == "cheby"
    eig_max = 1.1 * estimate_rho_dinv_a(op, Dinv) if is_cheby else None
    return apply_smoother(name, op, rhs, u0, direction=direction, omega=omega,
                          iterations=int(iterations), Dinv=Dinv,
                          strategy=strategy, colors=colors, eig_max=eig_max)
