"""Independent NumPy mini-reference for validating the batched device pipeline.

A deliberately simple, serial, per-element/per-face SIP-DG Poisson assembler
and block smoothers written directly from the weak form:

    a(u, v) = nu [ int grad u . grad v
                   - sum_F int_F ( {grad u . n}[v] + {grad v . n}[u] )
                   + sum_F sigma/h_F int_F [u][v] ]

on the curvilinear quadrilateral grid with modal tensor-Legendre bases.
This is a *different code path* from dgtpu (dense numpy loops, no stencil
tensors, no unified face weights) used as the test oracle; it mirrors the
conventions of the original thesis code so operator equality is exact.
"""

import numpy as np

from dgtpu.basis import (gauss_legendre, grad_vandermonde_2d, vandermonde_2d)


class MiniPoisson:
    """Dense SIP-DG Poisson operator on a GridLevel's data (numpy, serial)."""

    def __init__(self, level):
        self.level = level
        self.q = level.quad
        self.nu = level.settings.problem.kinematic_viscosity
        self.sigma = level.sigma
        self.gt = {k: np.asarray(v) if not isinstance(v, dict) else
                   {k2: {k3: np.asarray(v3) for k3, v3 in v2.items()}
                    for k2, v2 in v.items()}
                   for k, v in level.gt.items()}
        g = level.gt["u"]
        self.g = {side: {k: np.asarray(arr) for k, arr in d.items()}
                  for side, d in g.items()}
        self.A_el = np.asarray(level.gt["A"])
        self.B = level.N_DOF_sol["u"]
        self.w2d = self.q.w_int_2d["u"]
        self.w1d = self.q.w_int["u"]

    # --- per-element pieces -------------------------------------------------

    def volume(self, e):
        g = self.g["e"]
        Vr = self.q.Vr_sol_int["u"]["u"]
        Vs = self.q.Vs_sol_int["u"]["u"]
        Gx = Vr * g["rx"][e][:, None] + Vs * g["sx"][e][:, None]
        Gy = Vr * g["ry"][e][:, None] + Vs * g["sy"][e][:, None]
        wJ = self.w2d * g["J"][e]
        return self.nu * (Gx.T @ (wJ[:, None] * Gx) + Gy.T @ (wJ[:, None] * Gy)).T

    def mass(self, e):
        V = self.q.V_sol_int["u"]["u"]
        wJ = self.w2d * self.g["e"]["J"][e]
        return V.T @ (wJ[:, None] * V)

    def _side(self, e, side):
        g = self.g[side]
        Vr = self.q.Vr_sol_face[side]["u"]["u"]
        Vs = self.q.Vs_sol_face[side]["u"]["u"]
        V = self.q.V_sol_face[side]["u"]["u"]
        gx = Vr * g["rx"][e][:, None] + Vs * g["sx"][e][:, None]
        gy = Vr * g["ry"][e][:, None] + Vs * g["sy"][e][:, None]
        Gn = gx * g["nx"][e][:, None] + gy * g["ny"][e][:, None]
        return V, Gn, g["Jf"][e]

    def face_blocks(self, eL, eR, has_L, has_R):
        """SIP face 4-tuple for one face, straight from the weak form."""
        nu, sig = self.nu, self.sigma
        B = self.B
        V_L, Gn_L, J_L = (self._side(eL, "imax" if self.direction == "i" else "jmax")
                          if has_L else (None, None, None))
        V_R, Gn_R, J_R = (self._side(eR, "imin" if self.direction == "i" else "jmin")
                          if has_R else (None, None, None))
        J = J_L if has_L else J_R
        if has_L and has_R:
            h = (np.sqrt(self.A_el[eL]) + np.sqrt(self.A_el[eR])) / 2
            wL = wR = 0.5
        elif has_L:
            h = np.sqrt(self.A_el[eL])
            wL, wR = 1.0, 0.0
        else:
            h = np.sqrt(self.A_el[eR])
            wL, wR = 0.0, 1.0
        wq = self.w1d * J
        Z = np.zeros((B, B))

        def fk(Vx, Gy, coef):   # sum_q wq Gy[q,i] Vx[q,k] -> [k,i]
            return coef * np.einsum("q,qi,qk->ki", wq, Gy, Vx)

        def pk(Vx, Vy, coef):
            return coef * np.einsum("q,qi,qk->ki", wq, Vy, Vx)

        def sk(Vy, Gx, coef):   # sum_q wq Vy[q,i] Gx[q,k]
            return coef * np.einsum("q,qi,qk->ki", wq, Vy, Gx)

        LL = Z.copy(); LR = Z.copy(); RL = Z.copy(); RR = Z.copy()
        pen = sig * nu / h
        if has_L:
            LL = LL + fk(V_L, Gn_L, -nu * wL) + pk(V_L, V_L, pen) + sk(V_L, Gn_L, -nu * wL)
            RL = RL + (fk(V_R, Gn_L, nu * wL) + pk(V_R, V_L, -pen)
                       + sk(V_L, Gn_R, -nu * wL)) if has_R else Z
        if has_R:
            RR = RR + fk(V_R, Gn_R, nu * wR) + pk(V_R, V_R, pen) + sk(V_R, Gn_R, nu * wR)
            LR = LR + (fk(V_L, Gn_R, -nu * wR) + pk(V_L, V_R, -pen)
                       + sk(V_R, Gn_L, nu * wR)) if has_L else Z
        return LL, LR, RL, RR

    # --- assembly ------------------------------------------------------------

    def dense(self, with_mass_premultiply=None):
        lvl = self.level
        Ni, Nj, B = lvl.Ni, lvl.Nj, self.B
        N = Ni * Nj
        A = np.zeros((N * B, N * B))
        m = lambda i, j: j * Ni + i

        def add(r, c, blk):
            A[r * B:(r + 1) * B, c * B:(c + 1) * B] += blk

        for j in range(Nj):
            for i in range(Ni):
                e = m(i, j)
                add(e, e, self.volume(e))
        # i-direction faces
        self.direction = "i"
        periodic_i = lvl.O_grid
        for j in range(Nj):
            rng = range(Ni) if periodic_i else range(Ni + 1)
            for fi in rng:
                if periodic_i:
                    eL, eR, hl, hr = m((fi - 1) % Ni, j), m(fi, j), True, True
                else:
                    hl, hr = fi > 0, fi < Ni
                    eL = m(fi - 1, j) if hl else None
                    eR = m(fi, j) if hr else None
                LL, LR, RL, RR = self.face_blocks(eL, eR, hl, hr)
                if hl:
                    add(eL, eL, LL)
                if hl and hr:
                    add(eL, eR, LR)
                    add(eR, eL, RL)
                if hr:
                    add(eR, eR, RR)
        self.direction = "j"
        for i in range(Ni):
            for fj in range(Nj + 1):
                hl, hr = fj > 0, fj < Nj
                eL = m(i, fj - 1) if hl else None
                eR = m(i, fj) if hr else None
                LL, LR, RL, RR = self.face_blocks(eL, eR, hl, hr)
                if hl:
                    add(eL, eL, LL)
                if hl and hr:
                    add(eL, eR, LR)
                    add(eR, eL, RL)
                if hr:
                    add(eR, eR, RR)

        premul = (self.level.settings.problem.multiply_inverse_mass_matrix
                  if with_mass_premultiply is None else with_mass_premultiply)
        if premul:
            for e in range(N):
                Minv = np.linalg.inv(self.mass(e))
                A[e * B:(e + 1) * B, :] = Minv @ A[e * B:(e + 1) * B, :]
        return A


def numpy_block_gs_sweep(A, b, x, B, backward=False, omega=1.0):
    """Lexicographic block-GS sweep on a dense matrix (pyamg semantics)."""
    n = A.shape[0] // B
    x = x.copy()
    order = range(n - 1, -1, -1) if backward else range(n)
    for e in order:
        sl = slice(e * B, (e + 1) * B)
        r = b[sl] - A[sl, :] @ x + A[sl, sl] @ x[sl]
        xe = np.linalg.solve(A[sl, sl], r)
        x[sl] = omega * xe + (1 - omega) * x[sl]
    return x


def numpy_block_jacobi_sweep(A, b, x, B, omega=1.0):
    n = A.shape[0] // B
    xn = x.copy()
    for e in range(n):
        sl = slice(e * B, (e + 1) * B)
        r = b[sl] - A[sl, :] @ x + A[sl, sl] @ x[sl]
        xn[sl] = omega * np.linalg.solve(A[sl, sl], r) + (1 - omega) * x[sl]
    return xn
