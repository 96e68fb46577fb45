"""Batched DG face kernels (SIP flux / penalty / symmetrizing, continuity,
pressure, velocity-penalty).

The reference evaluates these per ``Face`` object with three structurally
different branches (interior / left-boundary / right-boundary,
``dgfem/face.py:115-372``).  All three collapse into one batched formula per
term with per-face scalars:

    w_L, w_R : trial-side averaging weights (1/2, 1/2 interior; 1/0 one-sided)
    p_L, p_R : presence indicators (penalty terms use full sigma either way)
    J        : face Jacobian — the L element's 'max' trace when L exists,
               else the R element's 'min' trace (face.py:13-35)
    h_F      : mean sqrt(element area) of the present sides

so the whole direction's faces evaluate as a handful of MXU einsums.  Each
kernel returns ``(LL, LR, RL, RR)`` stacks of shape (F, B_test, B_trial),
bit-compatible with the reference's per-face 4-tuples.
"""

import jax.numpy as jnp


class FaceData:
    """Gathered per-face geometry for one direction and one quadrature var.

    ``V_L/V_R``: trace Vandermondes of a basis on the L ('max') / R ('min')
    side; ``Gn_L/Gn_R``: normal-derivative traces of that basis built from
    each side's own metric terms; ``n_L/n_R``: unit normals (both point in
    +grad r / +grad s, i.e. from L into R, as in element.py:96-102).
    """

    def __init__(self, level, topo, var_quad, gt=None):
        gt = gt if gt is not None else level.gt
        g = gt[var_quad]
        sL, sR = topo.side_L, topo.side_R
        eL, eR = topo.eL, topo.eR
        self.topo = topo
        self.w_q = jnp.asarray(level.quad.w_int[var_quad])
        self.J = jnp.where(jnp.asarray(topo.has_L)[:, None],
                           g[sL]["Jf"][eL], g[sR]["Jf"][eR])
        self.h_F = level.h_F(topo)
        self.w_L = jnp.asarray(topo.w_L)
        self.w_R = jnp.asarray(topo.w_R)
        self.p_L = jnp.asarray(topo.p_L)
        self.p_R = jnp.asarray(topo.p_R)
        # per-side metric terms at the trace quadrature points
        self.mt_L = {k: g[sL][k][eL] for k in ("rx", "sx", "ry", "sy", "nx", "ny")}
        self.mt_R = {k: g[sR][k][eR] for k in ("rx", "sx", "ry", "sy", "nx", "ny")}
        # boundary-side physical coordinates (for Dirichlet data)
        self.x_L, self.y_L = g[sL]["x"][eL], g[sL]["y"][eL]
        self.x_R, self.y_R = g[sR]["x"][eR], g[sR]["y"][eR]
        self._level = level
        self._var_quad = var_quad
        self.wJ = self.w_q[None, :] * self.J       # (F, nq)

    def trace(self, var_basis):
        """(V_L, V_R) trace Vandermondes of a basis at this direction's faces."""
        q = self._level.quad
        sL, sR = self.topo.side_L, self.topo.side_R
        return (jnp.asarray(q.V_sol_face[sL][var_basis][self._var_quad]),
                jnp.asarray(q.V_sol_face[sR][var_basis][self._var_quad]))

    def grad_normal(self, var_basis):
        """(Gn_L, Gn_R): n . grad(phi) traces, each (F, nq, B)."""
        q = self._level.quad
        sL, sR = self.topo.side_L, self.topo.side_R
        out = []
        for side_key, mt in ((sL, self.mt_L), (sR, self.mt_R)):
            Vr = jnp.asarray(q.Vr_sol_face[side_key][var_basis][self._var_quad])
            Vs = jnp.asarray(q.Vs_sol_face[side_key][var_basis][self._var_quad])
            gx = Vr[None] * mt["rx"][:, :, None] + Vs[None] * mt["sx"][:, :, None]
            gy = Vr[None] * mt["ry"][:, :, None] + Vs[None] * mt["sy"][:, :, None]
            out.append(gx * mt["nx"][:, :, None] + gy * mt["ny"][:, :, None])
        return out[0], out[1]


def sip_terms(fd, nu, sigma, var="u"):
    """Sum of the SIP consistency-flux, penalty, and symmetrizing face terms.

    Reference: face.py:115-280 (compute_momentum_laplace_SIP_*).  Scalar
    (Poisson) blocks; the Stokes 2x2 velocity expansion is block-diagonal in
    these (face.py:174-178) and applied by the Stokes assembler.
    """
    V_L, V_R = fd.trace(var)
    Gn_L, Gn_R = fd.grad_normal(var)
    wJ = fd.wJ

    def contract_gn_v(Gn, V, coef):
        # (F,) coef * sum_q wJ[f,q] Gn[f,q,i] V[q,k] -> (F, k, i)
        return jnp.einsum("f,fq,fqi,qk->fki", coef, wJ, Gn, V)

    def contract_v_gn(V, Gn, coef):
        # coef * sum_q wJ V[q,i] Gn[f,q,k] -> (F, k, i)
        return jnp.einsum("f,fq,qi,fqk->fki", coef, wJ, V, Gn)

    def contract_v_v(Va, Vb, coef):
        return jnp.einsum("f,fq,qi,qk->fki", coef, wJ, Va, Vb)

    # consistency flux: res_XY = t_X * nu * w_Y * <Gn_Y, V_X>,  t_L=-1, t_R=+1
    LL = contract_gn_v(Gn_L, V_L, -nu * fd.w_L)
    LR = contract_gn_v(Gn_R, V_L, -nu * fd.w_R)
    RL = contract_gn_v(Gn_L, V_R, +nu * fd.w_L)
    RR = contract_gn_v(Gn_R, V_R, +nu * fd.w_R)

    # penalty: res_XY = s_X * c_Y * sigma*nu/h * p_Y * <V_Y, V_X>, s_L=c_L=+1, s_R=c_R=-1
    pen = sigma * nu / fd.h_F
    LL += contract_v_v(V_L, V_L, +pen * fd.p_L)
    LR += contract_v_v(V_R, V_L, -pen * fd.p_R)
    RL += contract_v_v(V_L, V_R, -pen * fd.p_L)
    RR += contract_v_v(V_R, V_R, +pen * fd.p_R)

    # symmetrizing: res_XY = -(sign_Y) * nu * w_Y * <V_Y[.,i] Gn_X[.,k]>, sign_L=+1, sign_R=-1
    LL += contract_v_gn(V_L, Gn_L, -nu * fd.w_L)
    LR += contract_v_gn(V_R, Gn_L, +nu * fd.w_R)
    RL += contract_v_gn(V_L, Gn_R, -nu * fd.w_L)
    RR += contract_v_gn(V_R, Gn_R, +nu * fd.w_R)

    return LL, LR, RL, RR


def sip_dirichlet_rhs(fd, nu, sigma, g_min, g_max, var="u"):
    """Dirichlet boundary contributions of the SIP penalty + symmetrizing terms.

    ``g_min[f, q]``: boundary data at min-side boundary faces (element R
    present), ``g_max`` at max-side ones.  Returns (rhs_min, rhs_max) of shape
    (F, B), to be scatter-added to eR / eL on boundary faces only.
    Reference: face.py:180-219 (penalty RHS) and face.py:221-254
    (symmetrizing RHS; note the sign flip between min and max sides).
    """
    V_L, V_R = fd.trace(var)
    Gn_L, Gn_R = fd.grad_normal(var)
    pen = sigma * nu / fd.h_F
    rhs_min = jnp.einsum("f,qi,fq,fq->fi", pen, V_R, g_min, fd.wJ)
    rhs_min += nu * jnp.einsum("fqi,fq,fq->fi", Gn_R, g_min, fd.wJ)
    rhs_max = jnp.einsum("f,qi,fq,fq->fi", pen, V_L, g_max, fd.wJ)
    rhs_max -= nu * jnp.einsum("fqi,fq,fq->fi", Gn_L, g_max, fd.wJ)
    return rhs_min, rhs_max
