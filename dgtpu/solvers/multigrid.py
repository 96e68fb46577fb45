"""Multigrid V-cycle solver — fully on-device, one jitted while_loop.

Reference: ``dgfem/solver.py:114-207``.  The recursion over levels is
statically unrolled at trace time; each cycle is a fixed graph of smoother
sweeps, stencil matvecs, transfer einsums and the cached coarse solve, and
the outer tolerance loop is a ``lax.while_loop`` carrying the residual
history (the reference pickles this history for its thesis plots; we return
it).  Divergence (nan/inf residual) exits the loop and is reported as a
status code instead of the reference's ``exit()``
(relaxation.py:214-217 -> SURVEY §5 failure-detection note).
"""

from functools import partial

import jax
import jax.numpy as jnp

from dgtpu.ops.linalg import host_lu_inverse
from dgtpu.ops.smoothers import (ColorPack, apply_smoother, block_diag_inv,
                                 element_colors, normalize_smoother_name)
from dgtpu.utils.jitting import const_jit
from dgtpu.utils.norms import lp_norm


class SmootherConfig:
    def __init__(self, name, direction, iterations, omega, eig_ratio=None):
        self.name = normalize_smoother_name(name)
        self.direction = direction
        self.iterations = int(iterations)
        self.omega = float(omega)
        # chebyshev smoothing-interval lower end (fraction of lmax); an
        # optional 'eig ratio' key on the smoother node — explicit, so the
        # relaxation factor never has to double as it (advisor r3)
        self.eig_ratio = None if eig_ratio is None else float(eig_ratio)

    @classmethod
    def from_settings(cls, node):
        return cls(node.smoother, node.direction, node.iterations,
                   node.relaxation_factor,
                   eig_ratio=getattr(node, "eig_ratio", None))


class MultigridSolver:
    """V-cycle driver over an assembled level hierarchy (coarsest first).

    Parameters
    ----------
    ops : list of StencilOperator, coarsest -> finest (the per-level 'BSR')
    transfers : list of TransferOp, transfers[k-2] sits between level k and k-1
    types : list of 'penalty'|'polynomial'|'geometric' per transfer
    settings : Settings (smoother configs per coarsening type, tolerances)
    colors : list of element colorings per level (for the red-black fast path)
    """

    def __init__(self, ops, transfers, types, settings, colors=None, levels=None):
        assert len(ops) == len(transfers) + 1 == len(types) + 1
        self.ops = ops
        self.transfers = transfers
        self.types = types
        self.settings = settings
        self.strategy = getattr(getattr(settings, "performance", None),
                                "smoother_parallelization", "sequential")
        self.colors = colors or [None] * len(ops)
        # color-packed off-diag blocks: ~2.5x less smoother block traffic
        self.packs = [ColorPack(op, c)
                      if (self.strategy == "redblack" and c is not None
                          and hasattr(op, "blocks")) else None
                      for op, c in zip(ops, self.colors)]
        # distributive-GS smoother state per level (Stokes global order);
        # built lazily when a level config names it
        self._dgs = {}
        self._levels = levels
        self.Dinv = [block_diag_inv(op) if hasattr(op, "blocks") else None
                     for op in ops]
        # Chebyshev smoothing interval: per-level rho(D^-1 A) estimated
        # eagerly at setup (power iteration), folded into the jitted cycle
        self.eig_max = [None] * len(ops)
        self.coarse_solver = settings.solver.multigrid.coarse_grid_solver
        # V (reference behavior), W (each coarse sub-hierarchy visited
        # twice) or F (first visit recurses as F, second as V) — dgtpu
        # extensions, the reference only implements V
        self.cycle_type = str(getattr(settings.solver.multigrid,
                                      "cycle_type", "V")).upper()
        if self.cycle_type not in ("V", "W", "F"):
            raise ValueError(
                f"cycle type must be V, W or F, got {self.cycle_type}")
        # full multigrid (nested iteration): solve coarsest first, prolong
        # upward with one cycle per level — the initial guess starts near
        # discretization accuracy instead of zero
        self.full_multigrid = bool(getattr(settings.solver.multigrid,
                                           "full_multigrid", False))
        if self.coarse_solver in ("direct", "amg"):
            coarse = ops[0]
            # a Stokes saddle operator needs its pressure pin to be invertible
            if hasattr(coarse, "pin") and not coarse.pin:
                from dataclasses import replace
                coarse = replace(coarse, pin=True)
            # dense inverse cached at setup; applied as one matmul per visit
            self.coarse_inv = host_lu_inverse(coarse.to_dense())
        else:
            self.coarse_inv = None
        self._smoother_cfg = {}
        for t in set(types):
            node = getattr(settings.solver.multigrid, f"{t}_coarsening")
            self._smoother_cfg[t] = (SmootherConfig.from_settings(node.pre_smoother),
                                     SmootherConfig.from_settings(node.post_smoother))
        if any(c.name == "chebyshev"
               for pair in self._smoother_cfg.values() for c in pair):
            from dgtpu.ops.smoothers import estimate_rho_dinv_a

            def uses_cheby(k):
                # level k smooths with its transfer's config (k>=1); the
                # coarsest level only smooths when there is no cached
                # coarse inverse (then with the pre-smoother of types[0])
                if k == 0:
                    return (self.coarse_inv is None and
                            self._smoother_cfg[types[0]][0].name
                            == "chebyshev")
                pre, post = self._smoother_cfg[types[k - 1]]
                return "chebyshev" in (pre.name, post.name)

            # estimate rho(D^-1 A) only on levels that actually smooth
            # with chebyshev: the 30 eager power iterations on the finest
            # operator dominate setup otherwise (advisor r3, halo.py:422)
            self.eig_max = [1.1 * estimate_rho_dinv_a(op, dv)
                            if dv is not None and uses_cheby(k) else None
                            for k, (op, dv) in enumerate(zip(ops, self.Dinv))]
        # distributive GS needs eager (host) setup: build the per-level
        # smoother states before tracing the jitted cycle
        uses_dgs = any(c.name == "distributive_gauss_seidel"
                       for pair in self._smoother_cfg.values() for c in pair)
        if uses_dgs:
            if levels is None:
                raise ValueError("distributive GS smoothing needs GridLevels")
            from dgtpu.models.stokes import make_dgs
            splitting = getattr(getattr(settings, "performance", None),
                                "dgs_splitting", "classical_exact")
            for k, lvl in enumerate(levels):
                self._dgs[k] = make_dgs(lvl, splitting)
        self._solve_jit = None

    # -- one V-cycle (statically unrolled recursion) -------------------------

    def _smooth(self, cfg, k, rhs, u, iterations=None):
        if cfg.name == "distributive_gauss_seidel":
            # Stokes saddle smoother (the reference's configured choice for
            # penalty-coarsening Stokes multigrid — which crashes there on a
            # name-case AttributeError; working here)
            for _ in range(int(iterations or cfg.iterations)):
                u = self._dgs[k].sweep(rhs, u)
            return u
        if cfg.name == "chebyshev" and self.eig_max[k] is None:
            # Stokes saddle operators have no block-stencil form to power-
            # iterate; fail at trace time with an actionable message
            # instead of a ConcretizationTypeError inside the jitted cycle
            raise ValueError(
                "chebyshev smoothing needs a block-stencil operator (level "
                f"{k} has none); use distributive_gauss_seidel for saddle "
                "systems")
        return apply_smoother(cfg.name, self.ops[k], rhs, u,
                              direction=cfg.direction, omega=cfg.omega,
                              iterations=iterations or cfg.iterations,
                              Dinv=self.Dinv[k],
                              strategy=self.strategy, colors=self.colors[k],
                              pack=self.packs[k], eig_max=self.eig_max[k],
                              eig_ratio=cfg.eig_ratio)

    def v_cycle(self, k, rhs, u, mode=None):
        """Level index k = number of levels in this sub-hierarchy (as in solver.py:141).

        ``mode`` is the cycle shape for this sub-tree (defaults to the
        configured ``cycle_type``): W revisits each coarse sub-hierarchy
        with the same shape, F revisits it with a plain V — the classic
        F-cycle, between V and W in cost and robustness.
        """
        mode = mode or self.cycle_type
        if k > 1:
            pre, post = self._smoother_cfg[self.types[k - 2]]
            u = self._smooth(pre, k - 1, rhs, u)
            residual = rhs - self.ops[k - 1].matvec(u)
            rhs_coarse = self.transfers[k - 2].restrict(residual)
            u_coarse = self.v_cycle(k - 1, rhs_coarse,
                                    jnp.zeros_like(rhs_coarse), mode=mode)
            if mode in ("W", "F") and k - 1 > 1:
                u_coarse = self.v_cycle(k - 1, rhs_coarse, u_coarse,
                                        mode="W" if mode == "W" else "V")
            u = u + self.transfers[k - 2].prolong(u_coarse)
            u = self._smooth(post, k - 1, rhs, u)
        else:
            if self.coarse_inv is not None:
                u = self.coarse_inv @ rhs
            else:
                pre, _ = self._smoother_cfg[self.types[0]]
                u = self._smooth(pre, 0, rhs, u, iterations=10)
        return u

    def fmg_guess(self, rhs):
        """Full-multigrid (nested-iteration) initial guess.

        Restricts the rhs through the hierarchy, solves the coarsest level,
        then prolongs upward running one ``cycle_type`` cycle per level.
        The returned iterate is typically within a couple of orders of the
        discretization accuracy, so the outer tolerance loop starts 2-4
        cycles ahead of a zero guess.  dgtpu extension (the reference only
        iterates from zero, solver.py:114-139).
        """
        rhss = [rhs]
        for t in reversed(self.transfers):          # fine -> coarse
            rhss.append(t.restrict(rhss[-1]))
        rhss = rhss[::-1]                           # coarsest first
        u = self.v_cycle(1, rhss[0], jnp.zeros_like(rhss[0]))
        for k in range(2, len(self.ops) + 1):
            u = self.transfers[k - 2].prolong(u)
            u = self.v_cycle(k, rhss[k - 1], u)
        return u

    # -- outer tolerance loop -------------------------------------------------

    def _build_solve(self, tol, max_cycles):
        n_lev = len(self.ops)
        A = self.ops[-1]

        def solve(rhs, u0):
            # normalization stays ||rhs - A*0|| = ||rhs|| when FMG supplies
            # the guess, so "res <= tol" keeps the reference's meaning
            # (relative to the zero iterate, solver.py:117-123) instead of
            # demanding 1e-6 *beyond* the already-good FMG iterate
            if self.full_multigrid:
                u0 = u0 + self.fmg_guess(rhs - A.matvec(u0))
            res0 = lp_norm(rhs, 2) if self.full_multigrid \
                else lp_norm(rhs - A.matvec(u0), 2)
            hist0 = jnp.full((max_cycles + 1,), jnp.nan, dtype=rhs.dtype)

            def cond(state):
                n, u, res, hist = state
                return (n < max_cycles) & (res >= tol) & jnp.isfinite(res)

            def body(state):
                n, u, res, hist = state
                hist = hist.at[n].set(res)
                u = self.v_cycle(n_lev, rhs, u)
                res = lp_norm(rhs - A.matvec(u), 2) / res0
                return n + 1, u, res, hist

            res_init = lp_norm(rhs - A.matvec(u0), 2) / res0
            n, u, res, hist = jax.lax.while_loop(
                cond, body, (jnp.int64(0) if rhs.dtype == jnp.float64 else jnp.int32(0),
                             u0, res_init, hist0))
            hist = hist.at[n].set(res)
            return u, res, n, hist

        # const_jit: the v_cycle closes over the whole operator hierarchy;
        # plain jax.jit would bake it into the HLO as literals (see
        # dgtpu/utils/jitting.py)
        return const_jit(solve)

    def solve(self, rhs, u0=None, tol=None, max_cycles=None):
        """Run V-cycles to tolerance; returns (u, final_residual, n_cycles, history).

        ``history[i]`` is the normalized residual *before* cycle i (so
        history[0] == 1.0), matching the reference's pickled residual lists
        (solver.py:118-123).
        """
        tol = tol if tol is not None else self.settings.solver.multigrid.tolerance
        max_cycles = int(max_cycles if max_cycles is not None
                         else self.settings.solver.multigrid.max_cycles)
        if u0 is None:
            u0 = jnp.zeros_like(rhs)
        if self._solve_jit is None or self._solve_key != (tol, max_cycles):
            self._solve_jit = self._build_solve(tol, max_cycles)
            self._solve_key = (tol, max_cycles)
        return self._solve_jit(rhs, u0)
