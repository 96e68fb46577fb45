"""Preconditioned Krylov solvers (CG / GMRES).

The reference's Krylov path is marked broken (``solver.py:79-112``: lgmres
with a dense-inverted block preconditioner that never converged).  Re-derived
here per SURVEY §7:

* Poisson: CG (the SIP operator is SPD when not mass-premultiplied) or
  GMRES, preconditioned by the element-block-diagonal inverse or one
  SA-AMG V-cycle.
* Stokes (global order): GMRES with the block-diagonal
  P = [[diag_block(A), 0], [0, -S_hat]] preconditioner, S_hat = D diag(A)^-1 G
  approximating the (negative) pressure Schur complement.

Built on ``jax.scipy.sparse.linalg`` with our stencil matvec as the operator
— everything stays on device, the preconditioner applies as batched solves.

All knobs come from the ``solver.krylov`` paramfile section
(``method | preconditioner | tolerance | absolute tolerance |
max iterations | restart``); explicit keyword arguments override it.  The
final normalized residual is always checked after the solve and a warning
is logged when it exceeds the requested tolerance — the reference returned
non-converged lgmres results silently.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgtpu.ops.smoothers import block_diag_inv
from dgtpu.utils.logger import Logger


def _krylov_params(settings, tol, atol, maxiter, restart):
    """Resolve solver.krylov settings; explicit kwargs win over the paramfile."""
    ks = getattr(getattr(settings, "solver", None), "krylov", None)

    def pick(explicit, attr, default, cast):
        if explicit is not None:
            return explicit
        return cast(getattr(ks, attr, default))

    return {
        "method": str(getattr(ks, "method", "gmres")).lower(),
        "precond": str(getattr(ks, "preconditioner", "block_diagonal")),
        "tol": pick(tol, "tolerance", 1e-8, float),
        "atol": pick(atol, "absolute_tolerance", 1e-5, float),
        "maxiter": pick(maxiter, "max_iterations", 2000, int),
        "restart": pick(restart, "restart", 50, int),
    }


def _check_convergence(op, rhs, u, tol, atol, settings, method,
                       strict=False):
    """Post-solve residual audit: jax gmres/cg discard the info flag.

    ``strict=True`` raises instead of warning — used for combinations
    whose failure mode is a silently wrong answer rather than slow
    convergence (CG with a non-SPD preconditioner misconverges without
    any error signal from jax.scipy).
    """
    # scipy-style stopping criterion: ||b - Au||_2 <= max(tol*||b||_2, atol)
    res = float(jnp.linalg.norm(rhs - op.matvec(u)))
    rhs_norm = float(jnp.linalg.norm(rhs))
    bound = max(tol * rhs_norm, atol)
    normalized = res / rhs_norm if rhs_norm > 0 else res
    logger = Logger(__name__, settings).logger
    if not np.isfinite(res) or res > bound:
        msg = (f"Krylov ({method}) did NOT reach tolerance: "
               f"||b-Au||={res:.3e} (normalized {normalized:.3e}) > "
               f"max(tol*||b||, atol)={bound:.3e}")
        if strict:
            raise RuntimeError(msg)
        logger.warning(msg)
    else:
        logger.info(f"Krylov ({method}) converged: normalized residual "
                    f"{normalized:.3e}")
    return normalized


# smoothers whose sweep operator is symmetric on its own (so equal pre/post
# counts already make the V-cycle SPD regardless of sweep direction)
_SELF_ADJOINT_SMOOTHERS = {"jacobi", "block_jacobi", "chebyshev"}


def _validate_spd_cycle(settings):
    """CG demands an SPD preconditioner.  A multigrid V-cycle is SPD only
    when each level's post-smoother is the adjoint of its pre-smoother with
    equal sweep counts (e.g. forward GS pre + backward GS post, or an
    inherently symmetric smoother).  The default paramfile uses forward/
    forward DGS-style sweeps, which yield a NONsymmetric M — jax CG then
    misconverges with no error signal.  Raise early with an actionable
    message instead (advisor r3, krylov.py:99)."""
    from dgtpu.ops.smoothers import normalize_smoother_name
    mgs = settings.solver.multigrid
    for t in ("penalty_parameter", "polynomial", "geometric"):
        node = getattr(mgs, f"{t}_coarsening", None)
        if node is None or not bool(getattr(node, "enabled", False)):
            continue
        pre, post = node.pre_smoother, node.post_smoother
        name_pre = normalize_smoother_name(pre.smoother)
        name_post = normalize_smoother_name(post.smoother)
        ok = (name_pre == name_post
              and int(pre.iterations) == int(post.iterations))
        if ok and name_pre not in _SELF_ADJOINT_SMOOTHERS:
            dirs = (str(getattr(pre, "direction", "forward")).lower(),
                    str(getattr(post, "direction", "forward")).lower())
            ok = dirs in (("forward", "backward"), ("backward", "forward"),
                          ("symmetric", "symmetric"))
        if not ok:
            raise ValueError(
                f"solver.krylov.method 'cg' with preconditioner 'multigrid' "
                f"needs a symmetric cycle, but the {t} coarsening smoothing "
                f"is not self-adjoint (pre={pre.smoother}/"
                f"{getattr(pre, 'direction', '?')}x{pre.iterations}, "
                f"post={post.smoother}/{getattr(post, 'direction', '?')}x"
                f"{post.iterations}).  Use adjoint directions "
                f"(forward/backward), symmetric sweeps, a self-adjoint "
                f"smoother (jacobi/chebyshev), or method 'gmres'.")


def solve_krylov(level, settings, tol=None, atol=None, maxiter=None,
                 restart=None, mg_cycle=None):
    """Dispatch on problem type and solver.krylov.method; returns the solution.

    ``mg_cycle`` (optional) is a jitted one-V-cycle closure built by the
    orchestrator when ``solver.krylov.preconditioner: multigrid`` — Krylov-
    accelerated multigrid, the standard remedy when a stand-alone cycle
    stalls (dgtpu extension; the reference's lgmres path never converged,
    solver.py:79-112).
    """
    p = _krylov_params(settings, tol, atol, maxiter, restart)
    if p["precond"] == "multigrid" and mg_cycle is None:
        raise ValueError("preconditioner 'multigrid' requires the assembled "
                         "hierarchy; call through DGFEM.solve()")
    cg_mg = p["method"] == "cg" and p["precond"] == "multigrid"
    if cg_mg:
        _validate_spd_cycle(settings)
    if settings.problem.type == "Poisson" or level.block_A is None:
        u = _solve_poisson(level, mg_cycle=mg_cycle, **p)
    else:
        if p["method"] == "cg":
            raise ValueError("solver.krylov.method 'cg' requires an SPD "
                             "operator; the Stokes saddle system is "
                             "indefinite — use 'gmres'")
        u = _solve_stokes_gmres(level, p["tol"], p["atol"], p["maxiter"],
                                p["restart"], mg_cycle=mg_cycle)
    # cg+multigrid: a residual miss here means CG misconverged on a subtly
    # non-SPD M — a wrong answer, not slow convergence; fail loudly
    _check_convergence(level.op, level.rhs, u, p["tol"], p["atol"], settings,
                       p["method"], strict=cg_mg)
    return u


def _poisson_preconditioner(op, precond, mg_cycle=None):
    if precond == "multigrid":
        # one geometric/p/penalty V-cycle per Krylov iteration — with
        # symmetric smoothing sweeps the cycle is an SPD operator, so it
        # is admissible for CG as well as GMRES
        return mg_cycle
    if precond == "amg":
        # one SA-AMG V-cycle as the preconditioner application — far
        # stronger than the block diagonal for large/ill-conditioned grids
        from dgtpu.solvers.amg import build_sa_cycle
        cycle, _ = build_sa_cycle(op)

        def M(x):
            return cycle(x, jnp.zeros_like(x))
    else:
        Dinv = block_diag_inv(op)
        n, _, br, _ = op.blocks.shape

        def M(x):
            return jnp.einsum("nij,nj->ni", Dinv, x.reshape(n, br)).reshape(-1)

    return M


def _solve_poisson(level, method, precond, tol, atol, maxiter, restart,
                   mg_cycle=None):
    op, rhs = level.op, level.rhs
    M = _poisson_preconditioner(op, precond, mg_cycle)
    if method == "cg":
        # the SIP operator is SPD (face.py:119-126 symmetry asserts in the
        # reference); the block-diagonal / SA-AMG preconditioners are SPD too
        u, _ = jax.scipy.sparse.linalg.cg(
            op.matvec, rhs, tol=tol, atol=atol, maxiter=maxiter, M=M)
        return u
    if method != "gmres":
        raise ValueError(f"unknown solver.krylov.method '{method}' "
                         "(expected 'gmres' or 'cg')")
    u, _ = jax.scipy.sparse.linalg.gmres(
        op.matvec, rhs, tol=tol, atol=atol, maxiter=maxiter,
        restart=restart, M=M, solve_method="batched")
    return u


def _solve_stokes_gmres(level, tol, atol, maxiter, restart, mg_cycle=None):
    """Block-diagonal Schur-complement-preconditioned GMRES for the saddle system."""
    op, rhs = level.op, level.rhs
    if mg_cycle is not None:
        # DGS-smoothed saddle V-cycle as M: far stronger than the
        # block-diagonal Schur approximation for the indefinite system
        u, _ = jax.scipy.sparse.linalg.gmres(
            op.matvec, rhs, tol=tol, atol=atol, maxiter=maxiter,
            restart=restart, M=mg_cycle, solve_method="batched")
        return u
    n, nu, npd = op.sizes

    # block-diagonal of A in global layout: per-element 2Nu blocks, but the
    # global layout splits u/v — use the element-interleaved diag and permute.
    A_diag = np.asarray(op.A.diag_blocks())          # (N, 2Nu, 2Nu)
    A_diag_inv = np.linalg.inv(A_diag)
    # S_hat = D diag(A)^-1 G (element-local product; D, G diag slots)
    D_diag = np.asarray(op.D.diag_blocks())          # (N, Np, 2Nu)
    G_diag = np.asarray(op.G.diag_blocks())          # (N, 2Nu, Np)
    S_hat = np.einsum("nij,njk,nkl->nil", D_diag, A_diag_inv, G_diag)
    # regularize the pressure null space (constant mode) before inversion
    for e in range(n):
        S_hat[e] += 1e-12 * np.eye(npd)
    S_hat[0][0, 0] += 1.0
    S_inv = jnp.asarray(np.linalg.inv(S_hat))
    A_diag_inv = jnp.asarray(A_diag_inv)

    def M(x):
        uv_g, p = x[:2 * n * nu], x[2 * n * nu:]
        u = uv_g[:n * nu].reshape(n, nu)
        v = uv_g[n * nu:].reshape(n, nu)
        uv = jnp.concatenate([u, v], axis=1)
        uv2 = jnp.einsum("nij,nj->ni", A_diag_inv, uv)
        p2 = jnp.einsum("nij,nj->ni", S_inv, p.reshape(n, npd))
        return jnp.concatenate([uv2[:, :nu].reshape(-1), uv2[:, nu:].reshape(-1),
                                p2.reshape(-1)])

    u, _ = jax.scipy.sparse.linalg.gmres(
        op.matvec, rhs, tol=tol, atol=atol, maxiter=maxiter,
        restart=restart, M=M, solve_method="batched")
    return u
