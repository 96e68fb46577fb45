"""Preconditioned Krylov solvers (GMRES / CG).

The reference's Krylov path is marked broken (``solver.py:79-112``: lgmres
with a dense-inverted block preconditioner that never converged).  Re-derived
here per SURVEY §7:

* Poisson: CG (the SIP operator is SPD when not mass-premultiplied) or GMRES,
  preconditioned by the element-block-diagonal inverse.
* Stokes (global order): GMRES with the block-diagonal
  P = [[diag_block(A), 0], [0, -S_hat]] preconditioner, S_hat = D diag(A)^-1 G
  approximating the (negative) pressure Schur complement.

Built on ``jax.scipy.sparse.linalg`` with our stencil matvec as the operator
— everything stays on device, the preconditioner applies as batched solves.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgtpu.ops.linalg import host_inv
from dgtpu.ops.smoothers import block_diag_inv
from dgtpu.utils.norms import lp_norm


def solve_krylov(level, settings, tol=1e-8, atol=1e-5, maxiter=2000,
                 restart=50):
    """Dispatch on problem type; returns the solution vector."""
    precond = str(getattr(getattr(settings.solver, "krylov", None),
                          "preconditioner", "block_diagonal"))
    if settings.problem.type == "Poisson" or level.block_A is None:
        return _solve_poisson_gmres(level, tol=tol, atol=atol, maxiter=maxiter,
                                    restart=restart, precond=precond)
    return _solve_stokes_gmres(level, tol=tol, atol=atol, maxiter=maxiter,
                               restart=restart)


def _solve_poisson_gmres(level, tol, atol, maxiter, restart,
                         precond="block_diagonal"):
    op, rhs = level.op, level.rhs
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

    u, info = jax.scipy.sparse.linalg.gmres(
        op.matvec, rhs, tol=tol, atol=atol, maxiter=maxiter,
        restart=restart, M=M, solve_method="batched")
    return u


def _solve_stokes_gmres(level, tol, atol, maxiter, restart):
    """Block-diagonal Schur-complement-preconditioned GMRES for the saddle system."""
    from dgtpu.models.stokes import _uv_permutation
    op, rhs = level.op, level.rhs
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

    u, info = jax.scipy.sparse.linalg.gmres(
        op.matvec, rhs, tol=tol, atol=atol, maxiter=maxiter,
        restart=restart, M=M, solve_method="batched")
    return u
