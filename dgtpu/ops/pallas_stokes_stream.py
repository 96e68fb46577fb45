"""HBM-streamed Stokes distributive-GS hybrid V-cycle.

The fused Stokes cycle (``ops/pallas_stokes.py``) keeps every component
stencil VMEM-resident, which stops scaling once the hierarchy's padded
footprint exceeds the chip's VMEM.  Past that point the *state* lattices
(uv, p) are still tiny while the A/G/D blocks are tens of MB, so — exactly
like the Poisson ``ops/pallas_stream.py`` — this module streams the blocks:
every stencil application (momentum matvec, pressure-gradient matvec,
divergence matvec, red-black block-GS half-sweeps on A) is one
``pallas_call`` whose sequential ``(pass, color, chunk)`` grid lets Mosaic
double-buffer the per-chunk block DMA while the vectors stay VMEM-resident
within the call.  The distributive-GS sweep (velocity block-GS ->
pressure DG-solve -> distributive back-transform,
``dgfem/relaxation.py:220-441`` semantics) composes those streamed kernels
at the XLA level; the tiny DG-diagonal updates run as plain XLA MACs.

``StreamedStokesVCycle`` composes this into a full cycle: the coarse
sub-hierarchy that fits VMEM runs as one fused ``SoAStokesVCycle`` kernel,
levels above it smooth with streamed kernels, and transfers run as XLA
per-component tile reshapes.  The update math is bit-identical to
``SoAStokesVCycle`` / ``dgtpu.models.stokes.StencilDGS`` (pinned by the
CPU interpret tests); V-cycle semantics mirror ``dgfem/solver.py:141-207``.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dgtpu.utils.jitting import const_jit

from dgtpu.ops.pallas_soa import _mac
from dgtpu.ops.pallas_stokes import SoAStokesVCycle, _blockdiag2, _soa_diag
from dgtpu.ops.pallas_stream import StreamedLevel, _soa2_to_vec, _vec_to_soa2


class StreamedStokesLevel:
    """Streamed distributive-GS smoother + saddle residual for one level.

    State: stacked color lattices ``uv01 (2, 2Nu, C)`` / ``p01 (2, Np, C)``.
    The A/G/D component stencils stream through ``StreamedLevel`` kernels;
    the DG = D@G diagonal (and its inverse) are (Np, Np, C) per-color
    arrays applied as XLA MACs (they are vector-sized, not operator-sized).
    """

    def __init__(self, level, dtype=jnp.float32, interpret=False,
                 chunk_lanes=512, align=128, n_pass=2, block_storage=None,
                 resident_budget=80 * 1024 * 1024):
        from dgtpu.ops import rolled
        from dgtpu.ops.linalg import host_inv
        from dgtpu.parallel.stokes_halo import _dg_diag_blocks
        if level.block_A is None:
            raise ValueError("StreamedStokesLevel needs a global-order "
                             "Stokes assembly (level.block_A/D/G)")
        self.nj, self.ni = level.Nj, level.Ni
        self.nu = level.N_DOF_sol["u"]
        self.npd = level.N_DOF_sol["p"]
        self.n_pass = n_pass
        self.dtype = dtype
        kw = dict(dtype=dtype, interpret=interpret,
                  chunk_lanes=chunk_lanes, align=align,
                  resident_budget=resident_budget)
        # the velocity block-GS runs in defect form (its rhs is the f32
        # momentum residual, which vanishes at the smoother's fixed point),
        # so bf16 sweep-block storage cannot shift what the sweep converges
        # toward — only the A sweeps narrow; G/D matvecs stay f32
        self.A_s = StreamedLevel(level.block_A, self.nj, self.ni,
                                 block_storage=block_storage, **kw)
        self.G_s = StreamedLevel(level.block_G, self.nj, self.ni, **kw)
        self.D_s = StreamedLevel(level.block_D, self.nj, self.ni, **kw)

        nj, ni = self.nj, self.ni
        dgd = np.asarray(_dg_diag_blocks(level.block_D, level.block_G))
        dgd = dgd.reshape(nj, ni, *dgd.shape[1:])
        dgdinv = np.asarray(host_inv(jnp.asarray(dgd)))
        _, pair_d = rolled.pack_operator_colors(
            np.zeros((nj, ni, 5, 1, 1)), dgd)
        _, pair_di = rolled.pack_operator_colors(
            np.zeros((nj, ni, 5, 1, 1)), dgdinv)
        cast = lambda t: tuple(jnp.asarray(np.asarray(x), dtype) for x in t)
        self.DG_diag = cast(_soa_diag(pair_d))
        self.DG_Dinv = cast(_soa_diag(pair_di))

        # build each streamed kernel once; reused across sweeps/cycles
        self._mvA = self.A_s.matvec()
        self._mvG = self.G_s.matvec()
        self._mvD = self.D_s.matvec()
        # color-restricted D matvecs for the pressure DG passes: each
        # half-pass updates one color's rows only, so streaming the other
        # color's D blocks would be pure waste (half the D traffic)
        self._mvD_c = (self.D_s.matvec_color(0), self.D_s.matvec_color(1))
        self._bgsA = self.A_s.half_sweeps(2 * n_pass)

    def to_device(self, device):
        for s in (self.A_s, self.G_s, self.D_s):
            s.to_device(device)
        self.DG_diag = tuple(jax.device_put(x, device) for x in self.DG_diag)
        self.DG_Dinv = tuple(jax.device_put(x, device) for x in self.DG_Dinv)
        return self

    # -- distributive GS (SoAStokesVCycle._dgs_sweep, streamed) --------------

    def _bgs_dg(self, rhs01, p01):
        """Colored GS passes on DG = D@G; same math as
        ``SoAStokesVCycle._bgs_dg`` with the composed matvec streamed."""
        dgd, dgi = self.DG_diag, self.DG_Dinv
        for _ in range(self.n_pass):
            for c in (0, 1):
                g01 = self._mvG(p01)
                d_c = self._mvD_c[c](g01)     # only color c's D rows/blocks
                off = d_c - _mac(dgd[c], p01[c])
                pn = _mac(dgi[c], rhs01[c] - off)
                p01 = p01.at[c].set(pn)
        return p01

    def dgs_sweep(self, f_mom01, f_cont01, uv01, p01):
        """One lsq-splitting distributive GS sweep (StencilDGS.sweep)."""
        rhs_mom = f_mom01 - self._mvA(uv01) - self._mvG(p01)
        du_s = self._bgsA(rhs_mom, jnp.zeros_like(uv01))
        rhs_cont = f_cont01 - self._mvD(uv01 + du_s)
        dp_s = self._bgs_dg(rhs_cont, jnp.zeros_like(p01))
        G_dp = self._mvG(dp_s)
        du = du_s + G_dp
        rhs_dg = -self._mvD(self._mvA(G_dp))
        dp = self._bgs_dg(rhs_dg, jnp.zeros_like(p01))
        return uv01 + du, p01 + dp

    def residual(self, f_mom01, f_cont01, uv01, p01):
        r_mom = f_mom01 - self._mvA(uv01) - self._mvG(p01)
        r_cont = f_cont01 - self._mvD(uv01)
        return r_mom, r_cont


class StreamedStokesVCycle:
    """Hybrid Stokes V-cycle for hierarchies beyond fused-kernel VMEM.

    The deepest prefix of levels whose ``SoAStokesVCycle`` footprint fits
    ``vmem_budget`` runs as one fused kernel; levels above it smooth with
    streamed distributive GS and transfer via XLA per-component tile
    reshapes.  Interface matches SoAStokesVCycle.build(): one_cycle(rhs, u)
    on global-order [all u; all v; all p] vectors of the finest level.
    """

    def __init__(self, levels, transfers, types, settings, dtype=jnp.float32,
                 interpret=False, vmem_budget=96 * 1024 * 1024,
                 chunk_lanes=512, align=128, n_pass=2, block_storage=None,
                 resident_budget=80 * 1024 * 1024):
        if block_storage is None:
            block_storage = str(getattr(getattr(settings, "performance", None),
                                        "block_storage", "float32"))
        self.block_storage = block_storage
        self.dtype = dtype
        self.n_lev = len(levels)
        self.transfers = transfers
        self.types = types
        self.dims = [(l.Nj, l.Ni) for l in levels]
        self.nu = [l.N_DOF_sol["u"] for l in levels]
        self.npd = [l.N_DOF_sol["p"] for l in levels]
        self.cycle_type = str(getattr(settings.solver.multigrid,
                                      "cycle_type", "V")).upper()
        if self.cycle_type not in ("V", "W"):
            # F-cycles (and anything else) run on the generic XLA path
            # (solvers/multigrid.py) -- error early instead of silently
            # degrading to V
            raise NotImplementedError(
                f"the streamed Stokes hybrid implements V and W, not "
                f"{self.cycle_type!r}")

        cut = 0
        for k in range(1, self.n_lev):      # always stream the finest level
            est = SoAStokesVCycle.estimated_vmem_bytes(
                levels[:k], transfers[:k - 1], dtype=dtype)
            if est > vmem_budget:
                break
            cut = k
        if cut < 1:
            raise ValueError("even the coarsest Stokes level exceeds the "
                             "VMEM budget")
        self.cut = cut
        self.sub = SoAStokesVCycle(levels[:cut], transfers[:cut - 1],
                                   types[:cut - 1], settings, dtype=dtype,
                                   interpret=interpret, n_pass=n_pass)
        self.streams = {}
        for k in range(cut, self.n_lev):
            self.streams[k] = StreamedStokesLevel(
                levels[k], dtype=dtype, interpret=interpret,
                chunk_lanes=chunk_lanes, align=align, n_pass=n_pass,
                block_storage=block_storage, resident_budget=resident_budget)

        # smoother config: structurally DGS (same validation as the fused
        # cycle), iteration counts per coarsening type
        from dgtpu.ops.smoothers import normalize_smoother_name
        self._cfg = {}
        for t in set(types):
            node = getattr(settings.solver.multigrid, f"{t}_coarsening")
            for side in (node.pre_smoother, node.post_smoother):
                if normalize_smoother_name(side.smoother) != \
                        "distributive_gauss_seidel":
                    raise ValueError(
                        "StreamedStokesVCycle smooths with distributive GS; "
                        f"config names {side.smoother!r}")
            self._cfg[t] = (int(node.pre_smoother.iterations),
                            int(node.post_smoother.iterations))

        # XLA transfer operators for the streamed levels (index >= cut - 1)
        cast = lambda x: jnp.asarray(np.asarray(x), dtype)
        self.R, self.P = {}, {}
        for k in range(cut - 1, self.n_lev - 1):
            t = transfers[k]
            kind = getattr(t, "kind", "penalty")
            if kind == "penalty":
                continue
            if kind == "polynomial":
                Ruv = cast(_blockdiag2(t.Ru))
                Rp = cast(np.asarray(t.Rp))
                self.R[k] = (Ruv, Rp)
                self.P[k] = (Ruv.T, Rp.T)
            elif kind == "geometric":
                self.R[k] = (self._child_stack(t.tu.R, uv=True, restrict=True),
                             self._child_stack(t.tp.R, uv=False, restrict=True))
                self.P[k] = (self._child_stack(t.tu.P, uv=True, restrict=False),
                             self._child_stack(t.tp.P, uv=False, restrict=False))
            else:
                raise ValueError(kind)

    def _child_stack(self, M, uv, restrict):
        """Component transfer matrix -> per-child (4, ., .) stack for the
        rolled-layout tile transfers (PallasVCycle layout)."""
        M = np.asarray(M)
        if restrict:
            B = M.shape[1] // 4
            st = np.stack([M[:, k * B:(k + 1) * B] for k in range(4)])
        else:
            B = M.shape[0] // 4
            st = np.stack([M[k * B:(k + 1) * B, :] for k in range(4)])
        if uv:
            st = np.stack([_blockdiag2(m) for m in st])
        return jnp.asarray(st.astype(np.dtype(self.dtype)))

    def to_device(self, device):
        self.sub.to_device(device)
        for s in self.streams.values():
            s.to_device(device)
        self.R = {k: tuple(jax.device_put(x, device) for x in v)
                  for k, v in self.R.items()}
        self.P = {k: tuple(jax.device_put(x, device) for x in v)
                  for k, v in self.P.items()}
        return self

    # -- layout conversion ----------------------------------------------------

    def _soa2_to_rolled(self, s01, k, B):
        nj, ni = self.dims[k]
        return _soa2_to_vec(s01, nj, ni, B).reshape(nj, ni, B)

    def _rolled_to_soa2(self, r, k, B):
        nj, ni = self.dims[k]
        return _vec_to_soa2(r.reshape(-1), nj, ni, B)

    def _to_flat(self, k, uv01, p01):
        """Stacked color lattices -> global-order flat vector at level k."""
        from dgtpu.models.stokes import _elem_uv_to_global
        nj, ni = self.dims[k]
        n, nu, npd = nj * ni, self.nu[k], self.npd[k]
        uv = _soa2_to_vec(uv01, nj, ni, 2 * nu)
        p = _soa2_to_vec(p01, nj, ni, npd)
        return jnp.concatenate([_elem_uv_to_global(uv, n, nu), p])

    def _from_flat(self, k, vec):
        from dgtpu.models.stokes import _global_uv_to_elem
        nj, ni = self.dims[k]
        n, nu, npd = nj * ni, self.nu[k], self.npd[k]
        uv = _global_uv_to_elem(vec[:2 * n * nu], n, nu)
        p = vec[2 * n * nu:]
        return (_vec_to_soa2(uv, nj, ni, 2 * nu),
                _vec_to_soa2(p, nj, ni, npd))

    # -- transfers ------------------------------------------------------------

    def _restrict(self, k, r_mom01, r_cont01):
        """Transfer k: level k+1 residual -> level k rhs."""
        t = self.transfers[k]
        kind = getattr(t, "kind", "penalty")
        if kind == "penalty":
            return r_mom01, r_cont01
        if kind == "polynomial":
            Ruv, Rp = self.R[k]
            mm = jax.lax.dot_general(Ruv, r_mom01, (((1,), (1,)), ((), ())),
                                     preferred_element_type=r_mom01.dtype)
            cc = jax.lax.dot_general(Rp, r_cont01, (((1,), (1,)), ((), ())),
                                     preferred_element_type=r_cont01.dtype)
            # dot_general puts the kept lhs dim first: (B_c, 2, C) -> (2, B_c, C)
            return mm.transpose(1, 0, 2), cc.transpose(1, 0, 2)
        from dgtpu.ops.pallas_vcycle import _tile_restrict
        R4uv, R4p = self.R[k]
        njc, nic = self.dims[k]
        out = []
        for s01, R4, B in ((r_mom01, R4uv, 2 * self.nu[k + 1]),
                           (r_cont01, R4p, self.npd[k + 1])):
            r = self._soa2_to_rolled(s01, k + 1, B)
            rc = _tile_restrict(r, R4, njc, nic)
            out.append(self._rolled_to_soa2(rc, k, rc.shape[-1]))
        return out[0], out[1]

    def _prolong(self, k, e_mom01, e_cont01):
        t = self.transfers[k]
        kind = getattr(t, "kind", "penalty")
        if kind == "penalty":
            return e_mom01, e_cont01
        if kind == "polynomial":
            Puv, Pp = self.P[k]
            mm = jax.lax.dot_general(Puv, e_mom01, (((1,), (1,)), ((), ())),
                                     preferred_element_type=e_mom01.dtype)
            cc = jax.lax.dot_general(Pp, e_cont01, (((1,), (1,)), ((), ())),
                                     preferred_element_type=e_cont01.dtype)
            return mm.transpose(1, 0, 2), cc.transpose(1, 0, 2)
        from dgtpu.ops.pallas_vcycle import _tile_prolong
        P4uv, P4p = self.P[k]
        njc, nic = self.dims[k]
        out = []
        for s01, P4, B in ((e_mom01, P4uv, 2 * self.nu[k]),
                           (e_cont01, P4p, self.npd[k])):
            e = self._soa2_to_rolled(s01, k, B)
            ef = _tile_prolong(e, P4, njc, nic)
            out.append(self._rolled_to_soa2(ef, k + 1, ef.shape[-1]))
        return out[0], out[1]

    # -- cycle ----------------------------------------------------------------

    def _cycle(self, k, f_mom01, f_cont01, uv01, p01):
        if k < self.cut:
            rhs_flat = self._to_flat(k, f_mom01, f_cont01)
            u_flat = self._to_flat(k, uv01, p01)
            out = self.sub._fn(rhs_flat, u_flat)
            return self._from_flat(k, out)
        s = self.streams[k]
        pre, post = self._cfg[self.types[k - 1]]
        for _ in range(pre):
            uv01, p01 = s.dgs_sweep(f_mom01, f_cont01, uv01, p01)
        r_mom01, r_cont01 = s.residual(f_mom01, f_cont01, uv01, p01)
        rc_mom, rc_cont = self._restrict(k - 1, r_mom01, r_cont01)
        e_uv, e_p = self._cycle(k - 1, rc_mom, rc_cont,
                                jnp.zeros_like(rc_mom),
                                jnp.zeros_like(rc_cont))
        if self.cycle_type == "W" and k - 1 > 0:
            # at the fused-subtree boundary this re-invokes the whole fused
            # sub-cycle with the first visit fed back as the initial guess
            # (the coarsest level itself is never revisited, matching the
            # fused cycle and MultigridSolver)
            e_uv, e_p = self._cycle(k - 1, rc_mom, rc_cont, e_uv, e_p)
        pe_uv, pe_p = self._prolong(k - 1, e_uv, e_p)
        uv01 = uv01 + pe_uv
        p01 = p01 + pe_p
        for _ in range(post):
            uv01, p01 = s.dgs_sweep(f_mom01, f_cont01, uv01, p01)
        return uv01, p01

    def build(self):
        if getattr(self.sub, "_fn", None) is None:
            self.sub.build()
        top = self.n_lev - 1

        @const_jit
        def one_cycle(rhs, u):
            f_mom01, f_cont01 = self._from_flat(top, rhs.astype(self.dtype))
            uv01, p01 = self._from_flat(top, u.astype(self.dtype))
            uv01, p01 = self._cycle(top, f_mom01, f_cont01, uv01, p01)
            return self._to_flat(top, uv01, p01)

        self._fn = one_cycle
        return one_cycle

    def build_matvec(self):
        """f32 finest-level matvec on the streamed stencils (flat global-
        order vectors) — the operator for Krylov-wrapped refinement
        (``make_refined_solver(inner='gmres')``)."""
        top = self.n_lev - 1
        s = self.streams[top]

        @const_jit
        def matvec(x):
            uv01, p01 = self._from_flat(top, x.astype(self.dtype))
            r_mom, r_cont = s.residual(jnp.zeros_like(uv01),
                                       jnp.zeros_like(p01), uv01, p01)
            # residual(f, c, u, p) = f - A u; with f = 0 this is -A u
            return -self._to_flat(top, r_mom, r_cont)

        return matvec

    def build_fmg(self, finest_cycle=None):
        """fmg(rhs) -> u0: FMG guess through the hybrid Stokes hierarchy
        (fused subtree contributes its own XLA FMG pass; streamed levels
        restrict down / one cycle per level up).  One-shot per solve — no
        new Mosaic kernel is compiled.  ``finest_cycle`` is accepted for
        interface parity with the fused builders and ignored: the
        finest-level FMG cycle here already runs the streamed kernels."""
        del finest_cycle
        if getattr(self.sub, "_fn", None) is None:
            self.sub.build()
        # the subtree's cut-level FMG cycle runs its fused kernel (already
        # built above) instead of the XLA graph
        sub_fmg = self.sub.build_fmg(finest_cycle=self.sub._fn)
        top = self.n_lev - 1

        @const_jit
        def fmg(rhs):
            rhss = [self._from_flat(top, rhs.astype(self.dtype))]
            for k in range(top, self.cut - 1, -1):
                rhss.append(self._restrict(k - 1, *rhss[-1]))
            rhss = rhss[::-1]               # level cut-1 first
            u_flat = sub_fmg(self._to_flat(self.cut - 1, *rhss[0]))
            uv01, p01 = self._from_flat(self.cut - 1, u_flat)
            for i, k in enumerate(range(self.cut, self.n_lev)):
                uv01, p01 = self._prolong(k - 1, uv01, p01)
                uv01, p01 = self._cycle(k, rhss[i + 1][0], rhss[i + 1][1],
                                        uv01, p01)
            return self._to_flat(top, uv01, p01)

        return fmg
