"""2nd-order curvilinear finite-volume discretization of the Poisson equation.

Reference: ``dgfem/discrete_system.py:188-353``
(assemble_BSR_and_RHS_Poisson_FVM): a 5-point scalar stencil with
face-length / center-distance coefficients ``a_N = s_face / |c_N - c_C|``,
ghost-value Dirichlet boundaries weighted by ``bc_order``, and cell-average
sources.  Used standalone (``-fvm``) and as the optional lowest multigrid
level (``geometric_coarsening.use_FVM``).

Batched: cell centers, corners and face midpoints come from the same modal
geometry interpolation as the DG path, evaluated at (0,0), (±1,±1) and
(±1,0)/(0,±1).
"""

import jax.numpy as jnp
import numpy as np

from dgtpu.basis import vandermonde_2d
from dgtpu.ops.stencil import StencilOperator


def _interp_at(level, r, s):
    """(1, G) operator evaluating the element geometry map at one ref point."""
    V = vandermonde_2d(level.quad.n_grid, np.atleast_1d(r), np.atleast_1d(s))
    return jnp.asarray(V @ level.quad.V_grid_grid_inv)


def fvm_cell_centers(level):
    L0 = _interp_at(level, 0.0, 0.0)
    X, Y = jnp.asarray(level.X), jnp.asarray(level.Y)
    return (X @ L0.T)[:, 0], (Y @ L0.T)[:, 0]


def assemble_poisson_fvm(level, mms, bc_order=2):
    """Assemble the FVM operator (scalar 5-point StencilOperator) and RHS."""
    X, Y = jnp.asarray(level.X), jnp.asarray(level.Y)
    xc, yc = fvm_cell_centers(level)

    def at(r, s):
        L = _interp_at(level, r, s)
        return (X @ L.T)[:, 0], (Y @ L.T)[:, 0]

    # corners and boundary-face midpoints
    c_mm = at(-1, -1)
    c_mp = at(-1, 1)
    c_pm = at(1, -1)
    c_pp = at(1, 1)
    mid = {"iL": at(-1, 0), "iR": at(1, 0), "jL": at(0, -1), "jR": at(0, 1)}

    def dist(a, b):
        return jnp.sqrt((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2)

    s_imin = dist(c_mp, c_mm)
    s_imax = dist(c_pp, c_pm)
    s_jmin = dist(c_pm, c_mm)
    s_jmax = dist(c_pp, c_mp)
    s_face = {"iL": s_imin, "iR": s_imax, "jL": s_jmin, "jR": s_jmax}

    nbr, mask = level.nbr, level.nbr_mask
    centers = (xc, yc)
    slot_names = {1: "iL", 2: "iR", 3: "jL", 4: "jR"}

    N = level.N
    blocks = jnp.zeros((N, 5, 1, 1))
    A_cell = level.gt["A"]
    f_src = mms.f_momentum[0](xc, yc)
    rhs = -f_src * A_cell
    diag = jnp.zeros(N)

    for slot, key in slot_names.items():
        has = jnp.asarray(mask[:, slot], dtype=xc.dtype)
        idx = nbr[:, slot]
        c_n = (xc[idx], yc[idx])
        d_int = dist(c_n, centers)
        d_bnd = dist(mid[key], centers)
        # interior coefficient
        a_int = s_face[key] / jnp.where(d_int == 0, 1.0, d_int)
        # boundary ghost coefficient and Dirichlet data
        a_bnd = bc_order * s_face[key] / (2.0 * d_bnd)
        u_b = mms.u(mid[key][0], mid[key][1])
        a = has * a_int
        blocks = blocks.at[:, slot, 0, 0].set(a)
        diag = diag - has * a_int - (1 - has) * a_bnd
        rhs = rhs - (1 - has) * a_bnd * u_b

    blocks = blocks.at[:, 0, 0, 0].set(diag)
    # The reference assembles the *negative* Laplacian stencil (diag = -sum a,
    # discrete_system.py:275-318), i.e. a negative-definite system.  We negate
    # globally: the standalone solution is identical, the operator becomes
    # SPD (better smoother behavior), and — crucially — the sign convention
    # matches the SPD DG levels so FVM works as a multigrid coarse level
    # (the reference's use_FVM multigrid is sign-inconsistent and cannot
    # converge; see SURVEY §7 hard parts).
    op = StencilOperator(-blocks, jnp.asarray(nbr, dtype=jnp.int32),
                         jnp.asarray(mask))
    return op, -rhs
