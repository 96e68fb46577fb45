"""Streamed Stokes hybrid V-cycle vs the fully-fused SoA Stokes cycle.

StreamedStokesVCycle must be numerically identical to SoAStokesVCycle
(same distributive-GS update math, component stencils streamed instead of
VMEM-resident), including the fused-subtree handoff, multi-chunk
streaming, and W-cycles across the cut boundary.  SoAStokesVCycle itself
is pinned to MultigridSolver + StencilDGS in test_pallas_stokes.py, so
parity here chains to the generic f64 path.
"""

import jax.numpy as jnp
import pytest

from dgtpu.api import DGFEM
from dgtpu.ops.pallas_stokes import SoAStokesVCycle
from dgtpu.ops.pallas_stokes_stream import StreamedStokesVCycle
from dgtpu.settings import Settings, load_params


@pytest.fixture(scope="module")
def stokes_mg():
    params = load_params()
    params["problem"]["type"] = "Stokes"
    params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["solution"]["u"]["polynomial degree"] = 2
    params["solution"]["p"]["polynomial degree"] = 1
    params["solution"]["ordering"] = "global"
    params["solver"]["multigrid"]["penalty parameter coarsening"]["enabled"] = False
    params["solver"]["multigrid"]["polynomial coarsening"]["enabled"] = True
    params["solver"]["multigrid"]["polynomial coarsening"]["levels"]["u"] = "1,2"
    params["solver"]["multigrid"]["geometric coarsening"]["enabled"] = True
    params["solver"]["multigrid"]["geometric coarsening"]["coarsening factors"] = 2
    for c in ("polynomial coarsening", "geometric coarsening"):
        for w in ("pre smoother", "post smoother"):
            params["solver"]["multigrid"][c][w]["smoother"] = \
                "distributive_gauss_seidel"
    params["solver"]["multigrid"]["coarse grid solver"] = "direct"
    params["performance"]["dgs_splitting"] = "lsq"
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "multigrid"
    s.update_setting("solver.discretization", "dg")
    return DGFEM(settings=s, solve_multigrid=True)


def _hybrid(dg, **kw):
    kw.setdefault("dtype", jnp.float64)
    kw.setdefault("interpret", True)
    kw.setdefault("chunk_lanes", 4)
    kw.setdefault("align", 2)
    # small budget so only the coarsest level fuses (f64 + 128-lane padding
    # make even the 2x2 level ~5 MB padded); the 4x4 levels stream
    kw.setdefault("vmem_budget", 8 * 1024 * 1024)
    return StreamedStokesVCycle(dg.levels, dg.transfers, dg.transfer_types,
                                dg.settings, **kw)


@pytest.mark.slow
def test_streamed_stokes_matches_fused(stokes_mg):
    dg = stokes_mg
    sv = SoAStokesVCycle(dg.levels, dg.transfers, dg.transfer_types,
                         dg.settings, dtype=jnp.float64, interpret=True)
    fused = sv.build_xla()
    hv = _hybrid(dg)
    assert 1 <= hv.cut < hv.n_lev
    # at least one streamed stencil runs the multi-chunk path
    assert any(s.A_s.n_chunks > 1 for s in hv.streams.values())
    hybrid = hv.build()
    rhs = dg.levels[-1].rhs
    uf = uh = jnp.zeros_like(rhs)
    for _ in range(2):
        uf = fused(rhs, uf)
        uh = hybrid(rhs, uh)
    scale = float(jnp.abs(uf).max())
    assert float(jnp.abs(uh - uf).max()) / scale < 1e-11
    op = dg.levels[-1].op
    r = float(jnp.linalg.norm(rhs - op.matvec(uh)) / jnp.linalg.norm(rhs))
    assert r < 1e-1


@pytest.mark.slow
def test_streamed_stokes_wcycle_matches_fused(stokes_mg):
    """W-cycles stay identical across the fused-subtree boundary."""
    dg = stokes_mg
    s = dg.settings
    old = getattr(s.solver.multigrid, "cycle_type", "V")
    s.solver.multigrid.cycle_type = "W"
    try:
        sv = SoAStokesVCycle(dg.levels, dg.transfers, dg.transfer_types,
                             s, dtype=jnp.float64, interpret=True)
        fused = sv.build_xla()
        hv = _hybrid(dg)
        assert hv.cycle_type == "W"
        hybrid = hv.build()
        rhs = dg.levels[-1].rhs
        uf = fused(rhs, jnp.zeros_like(rhs))
        uh = hybrid(rhs, jnp.zeros_like(rhs))
        scale = float(jnp.abs(uf).max())
        assert float(jnp.abs(uh - uf).max()) / scale < 1e-11
    finally:
        s.solver.multigrid.cycle_type = old


@pytest.mark.slow
def test_streamed_stokes_refines_to_1e10(stokes_mg):
    """Mixed-precision refinement with the streamed hybrid inner cycle
    reaches the 1e-10 BASELINE parity target (f64 interpret stand-in for
    the TPU f32 path; the contraction per cycle is dtype-independent)."""
    from dgtpu.solvers.refinement import make_refined_solver
    dg = stokes_mg
    hv = _hybrid(dg)
    cyc = hv.build()
    op = dg.levels[-1].op
    rhs = dg.levels[-1].rhs
    refined = make_refined_solver(op, cyc, n_inner=6, tol=1e-10)
    u, res, n, _ = refined(rhs, jnp.zeros_like(rhs))
    assert float(res) < 1e-10


def test_streamed_stokes_build_matvec(stokes_mg):
    """build_matvec on the streamed finest level equals op.matvec."""
    import numpy as np
    dg = stokes_mg
    hv = _hybrid(dg)
    mv = hv.build_matvec()
    op = dg.levels[-1].op
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(dg.levels[-1].rhs.shape[0]))
    y_ref = np.asarray(op.matvec(x))
    y = np.asarray(mv(x))
    rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert rel < 1e-12, rel


@pytest.mark.slow
def test_streamed_stokes_gmres_refinement(stokes_mg):
    """inner='gmres' refinement through the streamed hybrid converges to
    1e-10 (the robust route for deep hierarchies whose stand-alone cycle
    contraction degrades past 1 — bench stokes_large fallback)."""
    from dgtpu.solvers.refinement import make_refined_solver
    dg = stokes_mg
    hv = _hybrid(dg)
    cyc = hv.build()
    op = dg.levels[-1].op
    rhs = dg.levels[-1].rhs
    refined = make_refined_solver(op, cyc, n_inner=6, tol=1e-10,
                                  inner="gmres", matvec32=hv.build_matvec())
    u, res, n, _ = refined(rhs, jnp.zeros_like(rhs))
    assert float(res) < 1e-10
    assert int(n) <= 10


def test_streamed_stokes_fmg_guess(stokes_mg):
    """StreamedStokesVCycle.build_fmg: the hybrid FMG guess lands well
    below the zero iterate on the saddle system."""
    dg = stokes_mg
    hv = _hybrid(dg)
    hv.build()
    fmg = hv.build_fmg()
    rhs = dg.levels[-1].rhs
    u0 = fmg(rhs)
    op = dg.levels[-1].op
    r = float(jnp.linalg.norm(rhs - op.matvec(u0)) / jnp.linalg.norm(rhs))
    assert r < 0.1, f"streamed Stokes FMG guess too weak: {r}"
