"""SoA (cells-in-lanes) fused V-cycle vs the rolled-layout fused cycle.

The SoA layout must be numerically identical to the rolled fused cycle
(same color-split red-black sweeps, transfers and coarse solve — only the
memory layout differs), including on O-grid topologies where the
i-neighbors wrap periodically.  V-cycle semantics mirror
``dgfem/solver.py:141-207``.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.api import DGFEM
from dgtpu.ops.pallas_soa import SoAVCycle
from dgtpu.ops.pallas_vcycle import PallasVCycle
from dgtpu.settings import Settings, load_params

INPUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "input")


@pytest.fixture(scope="module")
def flagship():
    import __graft_entry__
    return __graft_entry__._flagship(n=8, p_grid=2, p_sol=2)


@pytest.fixture(scope="module")
def ogrid():
    params = load_params()
    params["grid"]["filename"] = "CircleInCircle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["grid"]["O grid"] = True
    params["grid"]["circular"] = True
    params["solution"]["u"]["polynomial degree"] = 2
    params["problem"]["SIP penalty parameter multiplier"] = 2
    params["solver"]["multigrid"]["polynomial coarsening"]["levels"]["u"] = "1,2"
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "multigrid"
    s.update_setting("solver.discretization", "dg")
    return DGFEM(settings=s, solve_multigrid=True)


def _build_pair(dg):
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    pv = PallasVCycle([l.op for l in dg.levels], dg.transfers,
                      dg.transfer_types, dg.settings, dims,
                      dtype=jnp.float64)
    sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                   dg.transfer_types, dg.settings, dims,
                   dtype=jnp.float64, interpret=True)
    return pv, sv


def _compare(dg, expect_periodic):
    pv, sv = _build_pair(dg)
    assert all(p == expect_periodic for p in sv.periodic)
    rolled = pv.build_xla()
    soa_xla = sv.build_xla()
    soa_kernel = sv.build()          # interpret-mode Pallas kernel
    rhs = dg.levels[-1].rhs
    ur = us = uk = jnp.zeros_like(rhs)
    for _ in range(3):
        ur, us, uk = rolled(rhs, ur), soa_xla(rhs, us), soa_kernel(rhs, uk)
    scale = float(jnp.abs(ur).max())
    assert float(jnp.abs(us - ur).max()) / scale < 1e-11
    assert float(jnp.abs(uk - us).max()) / scale < 1e-12
    op = dg.levels[-1].op
    r = float(jnp.linalg.norm(rhs - op.matvec(us)) / jnp.linalg.norm(rhs))
    assert r < 5e-2                  # contracting


def test_soa_matches_rolled_flagship(flagship):
    _compare(flagship, expect_periodic=False)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(INPUT_DIR, "CircleInCircle_4X4_nPoly2.xyz")),
    reason="circle grid missing")
def test_soa_matches_rolled_ogrid(ogrid):
    _compare(ogrid, expect_periodic=True)


def test_soa_w_cycle_matches_generic(flagship):
    """cycle_type: W is honored inside the fused kernels (coarse
    sub-hierarchies visited twice, matching MultigridSolver)."""
    import copy
    from dgtpu.ops.smoothers import element_colors
    from dgtpu.solvers.multigrid import MultigridSolver

    dg = flagship
    s = copy.deepcopy(dg.settings)
    s.solver.multigrid.cycle_type = "W"
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                   dg.transfer_types, s, dims,
                   dtype=jnp.float64, interpret=True)
    assert sv.cycle_type == "W"
    colors = [element_colors(l.Ni, l.Nj) for l in dg.levels]
    mg = MultigridSolver([l.op for l in dg.levels], dg.transfers,
                         dg.transfer_types, s, colors=colors)
    rhs = dg.levels[-1].rhs
    soa = sv.build_xla()
    ug = us = jnp.zeros_like(rhs)
    for _ in range(2):
        ug = mg.v_cycle(len(dg.levels), rhs, ug)
        us = soa(rhs, us)
    # same W recursion, different smoother layout: residuals must agree
    op = dg.levels[-1].op
    rg = float(jnp.linalg.norm(rhs - op.matvec(ug)))
    rs = float(jnp.linalg.norm(rhs - op.matvec(us)))
    assert rs == pytest.approx(rg, rel=0.3)
    # and W contracts at least as fast as V per cycle
    sv_v = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                     dg.transfer_types, dg.settings, dims,
                     dtype=jnp.float64, interpret=True)
    soa_v = sv_v.build_xla()
    uv = jnp.zeros_like(rhs)
    for _ in range(2):
        uv = soa_v(rhs, uv)
    rv = float(jnp.linalg.norm(rhs - op.matvec(uv)))
    assert rs <= rv * 1.05


def test_soa_rejects_odd_ni(flagship):
    """The color-split layout needs an even Ni on every level."""
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    bad_dims = [(nj, ni) for nj, ni in dims]
    bad_dims[-1] = (dims[-1][0], dims[-1][1] - 1)
    with pytest.raises(Exception):
        SoAVCycle([l.op for l in dg.levels], dg.transfers,
                  dg.transfer_types, dg.settings, bad_dims,
                  dtype=jnp.float64, interpret=True)


def test_soa_f_cycle_between_v_and_w(flagship):
    """cycle_type: F in the fused kernels: first coarse visit recurses as
    F, the revisit as a plain V — contraction between V and W."""
    import copy

    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    op = dg.levels[-1].op
    rhs = dg.levels[-1].rhs

    def run(cycle):
        s = copy.deepcopy(dg.settings)
        s.solver.multigrid.cycle_type = cycle
        sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                       dg.transfer_types, s, dims,
                       dtype=jnp.float64, interpret=True)
        fn = sv.build_xla()
        u = jnp.zeros_like(rhs)
        for _ in range(2):
            u = fn(rhs, u)
        return float(jnp.linalg.norm(rhs - op.matvec(u)))

    rv, rf, rw = run("V"), run("F"), run("W")
    assert rw <= rf * 1.05 and rf <= rv * 1.05
