"""Inter-level transfer operators for penalty / p / h (geometric) multigrid.

The reference hardcodes its transfer matrices (identity for penalty
coarsening, zero-padded identity for p-coarsening built by array inserts, a
4x16 sqrt(3) stencil for 2x2 geometric agglomeration at p=1, and bilinear
(9,3,3,1)/16 weights for cell-centered FVM) — ``dgfem/dgfem.py:269-372``.

Here every operator is *generated* from the L2-projection definition on the
orthonormal tensor-Legendre basis, which reproduces the reference constants
exactly (tested) and generalizes to any polynomial degree and coarsening
factor:

    P[(child, j), k] = int_ref phi_j(r) phi_k(child_map(r)) dr,
    R = P^T / cf**2                (Galerkin-consistent scaling)

Column ordering of geometric operators matches the V-cycle's reshape:
child_j slowest, child_i, then mode (solver.py:152-190).
"""

from functools import lru_cache

import numpy as np

from dgtpu.basis import gauss_legendre, legendre_orthonormal


def p_restriction(p_fine, p_coarse):
    """Zero-padded identity selecting modes with i,j <= p_coarse (dgfem.py:304-317)."""
    nf, nc = p_fine + 1, p_coarse + 1
    R = np.zeros((nc * nc, nf * nf))
    for j in range(nc):
        for i in range(nc):
            R[i + j * nc, i + j * nf] = 1.0
    return R


@lru_cache(maxsize=None)
def _proj_1d(p, cf):
    """1D child-projection blocks: W[c][j, k] = int phi_j(r) phi_k((r + 2c + 1 - cf)/cf) dr."""
    n = p + 1
    r, w = gauss_legendre(2 * p + 2)
    out = []
    for c in range(cf):
        R_of_r = (r + 2 * c + 1 - cf) / cf   # child c covers R in [-1+2c/cf, -1+2(c+1)/cf]
        W = np.zeros((n, n))
        for j in range(n):
            fj = legendre_orthonormal(r, j)
            for k in range(n):
                W[j, k] = np.sum(w * fj * legendre_orthonormal(R_of_r, k))
        out.append(W)
    return tuple(out)


def geometric_prolongation(p, cf=2):
    """P: (cf^2 * B, B) mapping coarse modal coeffs to the cf x cf children.

    Row ordering: (child_j, child_i, mode) with mode fastest — the layout the
    V-cycle reshape produces.  For p=1, cf=2 this reproduces the reference's
    sqrt(3) 16x4 operator (dgfem.py:362-367, as prolongation = R^T * 4).
    """
    n = p + 1
    B = n * n
    W = _proj_1d(p, cf)
    P = np.zeros((cf * cf * B, B))
    for cj in range(cf):
        for ci in range(cf):
            blk = np.zeros((B, B))
            for j in range(n):          # fine mode (i1, j1); coarse mode (i2, j2)
                for i in range(n):
                    for jj in range(n):
                        for ii in range(n):
                            blk[i + j * n, ii + jj * n] = W[ci][i, ii] * W[cj][j, jj]
            P[(cj * cf + ci) * B:(cj * cf + ci + 1) * B, :] = blk
    return P


def geometric_restriction(p, cf=2):
    """R = P^T / cf^2 — (B, cf^2 * B)."""
    return geometric_prolongation(p, cf).T / (cf * cf)


def dg_to_fvm_restriction(p):
    """Modal DG(p) element -> FVM cell average.  R[0, j] = mean(phi_j).

    For p=1 this is [[1,0,0,0]]/2 with prolongation R^T*4/2 = [2,0,0,0]^T/... —
    exactly the reference's [[1.,0,0,0]]/2 and transpose*2 (dgfem.py:328-331).
    """
    n = p + 1
    r, w = gauss_legendre(p + 1)
    means = np.zeros(n * n)
    for j in range(n):
        for i in range(n):
            mi = np.sum(w * legendre_orthonormal(r, i)) / 2.0
            mj = np.sum(w * legendre_orthonormal(r, j)) / 2.0
            means[i + j * n] = mi * mj
    return means[None, :]


def dg_to_fvm_prolongation(p):
    """Constant field -> modal coefficients: u = v => c_00 = v / phi_00."""
    n = p + 1
    P = np.zeros((n * n, 1))
    phi00 = legendre_orthonormal(np.array([0.0]), 0)[0] ** 2
    P[0, 0] = 1.0 / phi00
    return P


def fvm_geometric_prolongation():
    """Bilinear cell-centered 2->1 prolongation over a 4x4 fine / 2x2 coarse tile.

    Generated from the 1D weights (3/4, 1/4) with out-of-tile neighbors
    dropped; reproduces the reference's (9,3,3,1)/16 table (dgfem.py:342-358).
    Row order (child_j, child_i); column order (coarse_j, coarse_i).
    """
    w1d = {0: [(0, 0.75)], 1: [(0, 0.75), (1, 0.25)],
           2: [(0, 0.25), (1, 0.75)], 3: [(1, 0.75)]}
    P = np.zeros((16, 4))
    for fj in range(4):
        for fi in range(4):
            for cj, wj in w1d[fj]:
                for ci, wi in w1d[fi]:
                    P[fj * 4 + fi, cj * 2 + ci] = wi * wj
    return P


def fvm_geometric_restriction():
    return fvm_geometric_prolongation().T / 4.0


def _gather_tiles(vec, Nj_t, Ni_t, cf, B):
    """(N_f*B,) m-ordered -> (N_tiles, cf^2*B) rows with (tile_j, tile_i) order
    and (child_j, child_i, mode) columns — the V-cycle reshape (solver.py:152-168)."""
    v = vec.reshape(Nj_t, cf, Ni_t, cf, B)       # j_t, cj, i_t, ci, B
    v = v.transpose(0, 2, 1, 3, 4)               # j_t, i_t, cj, ci, B
    return v.reshape(Nj_t * Ni_t, cf * cf * B)


def _scatter_tiles(rows, Nj_t, Ni_t, cf, B):
    v = rows.reshape(Nj_t, Ni_t, cf, cf, B)
    v = v.transpose(0, 2, 1, 3, 4)
    return v.reshape(-1)


class TransferOp:
    """One inter-level transfer with its V-cycle tiling logic.

    The fine side is gathered into tiles of ``cf_f x cf_f`` cells of ``B_f``
    entries; the coarse side scatters into ``cf_c x cf_c`` tiles of ``B_c``
    (cf=1 means per-element, no tiling).  All vectors are in element m-order
    (m = j*Ni + i, j slow).
    """

    def __init__(self, kind, R, P, Ni_t=1, Nj_t=1, cf_f=1, cf_c=1, B_f=None,
                 B_c=None, row_scale=None):
        import jax.numpy as jnp
        self.kind = kind
        self.R = jnp.asarray(R)
        self.P = jnp.asarray(P)
        self.Ni_t, self.Nj_t = Ni_t, Nj_t
        self.cf_f, self.cf_c = cf_f, cf_c
        self.B_f = B_f if B_f is not None else self.R.shape[1]
        self.B_c = B_c if B_c is not None else self.R.shape[0]
        # per-coarse-row residual scaling (dg->fvm needs the cell Jacobian to
        # convert the mass-premultiplied DG residual into the FVM integral
        # form; the reference's unscaled transfer cannot converge)
        self.row_scale = None if row_scale is None else jnp.asarray(row_scale)

    def restrict(self, residual):
        import jax.numpy as jnp
        if self.kind == "penalty":
            # identity transfer between penalty levels (dgfem.py:285-288);
            # applied as a no-op so it also covers mixed-block Stokes vectors
            return residual
        if self.cf_f > 1:
            rows = _gather_tiles(residual, self.Nj_t, self.Ni_t, self.cf_f, self.B_f)
        else:
            rows = residual.reshape(-1, self.R.shape[1])
        out = jnp.einsum("ij,kj->ki", self.R, rows)
        if self.row_scale is not None:
            out = out * self.row_scale[:, None]
        if self.cf_c > 1:
            return _scatter_tiles(out, self.Nj_t, self.Ni_t, self.cf_c, self.B_c)
        return out.reshape(-1)

    def prolong(self, u_coarse):
        import jax.numpy as jnp
        if self.kind == "penalty":
            return u_coarse
        if self.cf_c > 1:
            rows = _gather_tiles(u_coarse, self.Nj_t, self.Ni_t, self.cf_c, self.B_c)
        else:
            rows = u_coarse.reshape(-1, self.P.shape[1])
        v = jnp.einsum("ij,kj->ki", self.P, rows)
        if self.cf_f > 1:
            return _scatter_tiles(v, self.Nj_t, self.Ni_t, self.cf_f, self.B_f)
        return v.reshape(-1)


def make_transfer(kind, p_fine=None, p_coarse=None, Ni_c=None, Nj_c=None, cf=2,
                  row_scale=None):
    """Factory covering all reference transfer flavors.

    ``Ni_c, Nj_c``: the coarse level's element counts (tile grid for
    geometric kinds).
    """
    if kind == "penalty":
        B = (p_fine + 1) ** 2
        return TransferOp("penalty", np.eye(B), np.eye(B))
    if kind == "polynomial":
        R = p_restriction(p_fine, p_coarse)
        return TransferOp("polynomial", R, R.T)
    if kind == "geometric":
        R = geometric_restriction(p_fine, cf)
        P = geometric_prolongation(p_fine, cf)
        B = (p_fine + 1) ** 2
        return TransferOp("geometric", R, P, Ni_t=Ni_c, Nj_t=Nj_c,
                          cf_f=cf, cf_c=1, B_f=B, B_c=B * 1)
    if kind == "dg_to_fvm":
        # per-element transfer, no tile reshape (the reference routes this
        # through the geometric reshape which permutes the element order — a
        # latent inconsistency; implemented correctly here, see SURVEY §7)
        R = dg_to_fvm_restriction(p_fine)
        P = dg_to_fvm_prolongation(p_fine)
        return TransferOp("dg_to_fvm", R, P, row_scale=row_scale)
    if kind == "geometric_fvm":
        # 4x4 fine cells -> 2x2 coarse cells per tile; Ni_c/Nj_c here are the
        # coarse CELL counts, the tile grid is half that
        R = fvm_geometric_restriction()
        P = fvm_geometric_prolongation()
        return TransferOp("geometric_fvm", R, P,
                          Ni_t=Ni_c // 2, Nj_t=Nj_c // 2,
                          cf_f=4, cf_c=2, B_f=1, B_c=1)
    raise ValueError(kind)
