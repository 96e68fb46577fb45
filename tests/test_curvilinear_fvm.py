"""BASELINE config 4 (curvilinear O-grid multigrid) and the FVM paths."""

import os

import numpy as np
import pytest

from dgtpu.api import DGFEM
from dgtpu.settings import Settings, load_params
from tests.conftest import INPUT_DIR

CIRCLE = os.path.join(INPUT_DIR, "CircleInCircle_8X8_nPoly5.xyz")


def circle_settings(method, mult=2.0, grid="CircleInCircle_8X8_nPoly5.xyz",
                    p_grid=5, p_sol=5):
    params = load_params()
    params["grid"]["filename"] = grid
    params["grid"]["polynomial degree"] = p_grid
    params["grid"]["O grid"] = True
    params["grid"]["circular"] = True
    params["solution"]["u"]["polynomial degree"] = p_sol
    # the reference warns multipliers < 2 are unstable on curved grids
    # (dgfem.py:280-282); with 1.0 the SIP operator is indefinite here.
    params["problem"]["SIP penalty parameter multiplier"] = mult
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = method
    s.update_setting("solver.discretization", "dg")
    return s


@pytest.mark.skipif(not os.path.exists(CIRCLE), reason="circle grid missing")
def test_circle_direct_accuracy():
    dg = DGFEM(settings=circle_settings("direct"), solve_direct=True)
    dg.solve()
    assert dg.L2_error_u < 5e-3
    assert dg.residual < 1e-10


@pytest.mark.skipif(not os.path.exists(CIRCLE), reason="circle grid missing")
def test_circle_multigrid_converges():
    """Benchmark config 4: curvilinear O-grid Poisson multigrid."""
    dg = DGFEM(settings=circle_settings("multigrid"), solve_multigrid=True)
    dg.solve()
    assert dg.residuals[-1] < 1e-6
    assert dg.L2_error_u < 5e-3


@pytest.mark.skipif(not os.path.exists(CIRCLE), reason="circle grid missing")
def test_circle_indefinite_at_low_penalty():
    """Reproduces the reference's documented instability (sigma multiplier 1
    on curved grids): the operator is not positive definite."""
    s = circle_settings("direct", mult=1.0)
    s.update_setting("problem.multiply_inverse_mass_matrix", False)
    dg = DGFEM(settings=s, solve_direct=True)
    A = np.asarray(dg.levels[-1].op.to_dense())
    eigs = np.linalg.eigvalsh((A + A.T) / 2)
    assert eigs.min() < 0


@pytest.mark.skipif(not os.path.exists(CIRCLE.replace("8X8_nPoly5", "4X4_nPoly2")),
                    reason="circle grid missing")
def test_stokes_on_annulus_direct():
    """Stokes on the curvilinear O-grid (periodic-in-theta velocity coupling,
    polar pressure mean, dgfem.py:378-392)."""
    params = load_params()
    params["problem"]["type"] = "Stokes"
    params["problem"]["exact solution"] = {
        # divergence-free rigid-ish rotation field, zero at both radii scaled
        "u": "-y*(x**2 + y**2 - 1)",
        "v": "x*(x**2 + y**2 - 1)",
        "p": "x*y",
        "tag": "swirl"}
    params["grid"]["filename"] = "CircleInCircle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["grid"]["O grid"] = True
    params["grid"]["circular"] = True
    params["problem"]["SIP penalty parameter multiplier"] = 2
    params["solution"]["u"]["polynomial degree"] = 3
    params["solution"]["p"]["polynomial degree"] = 2
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "direct"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_direct=True)
    dg.solve()
    assert dg.residual < 1e-9
    assert dg.L2_error_u < 0.05
    assert dg.L2_error_p < 0.5


def test_fvm_standalone_solve():
    params = load_params()
    params["grid"]["filename"] = "Rectangle_8X8_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "finite_volume_method"
    s.update_setting("solver.discretization", "fvm")
    dg = DGFEM(settings=s, solve_finite_volume_method=True)
    dg.solve()
    assert dg.L2_error_u < 0.2


def test_use_fvm_multigrid_converges():
    """Geometric coarsening with FVM coarse levels (use FVM: True).

    The reference's version of this path is broken three ways (element-order
    permutation in the transfer reshape, sign-inconsistent FVM operator,
    unscaled residual restriction); fixed here — see models/fvm.py and
    ops/transfer.py docstrings."""
    params = load_params()
    params["grid"]["filename"] = "Rectangle_8X8_nPoly1.xyz"
    params["grid"]["polynomial degree"] = 1
    params["solution"]["u"]["polynomial degree"] = 1
    params["solver"]["multigrid"]["polynomial coarsening"]["enabled"] = False
    params["solver"]["multigrid"]["geometric coarsening"]["enabled"] = True
    params["solver"]["multigrid"]["geometric coarsening"]["use FVM"] = True
    params["solver"]["multigrid"]["geometric coarsening"]["coarsening factors"] = 2
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "multigrid"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_multigrid=True)
    dg.solve()
    assert dg.residuals[-1] < 1e-6
    assert [l.discretization for l in dg.levels] == ["fvm", "fvm", "dg"]


def test_fvm_h_convergence():
    """Cell-centered FVM is 2nd order on the cell averages."""
    errs = []
    for n in (4, 8):
        params = load_params()
        params["grid"]["filename"] = f"Rectangle_{n}X{n}_nPoly2.xyz"
        params["grid"]["polynomial degree"] = 2
        params["visualization"]["export"] = False
        params["visualization"]["automatically open paraview"] = False
        params["logging"]["loglevel"] = "ERROR"
        s = Settings(params)
        s.solver.method = "finite_volume_method"
        s.update_setting("solver.discretization", "fvm")
        dg = DGFEM(settings=s, solve_finite_volume_method=True)
        dg.solve()
        errs.append(dg.L2_error_u)
    assert np.log2(errs[0] / errs[1]) > 1.5, errs


def test_fvm_amplification_cli(tmp_path):
    """-amp --fvm-discretization end to end (requires p_solution=0, the
    reference's own validation rule)."""
    from dgtpu.__main__ import main
    dg = main(["-amp", "--fvm-discretization", "-f", "Rectangle_8X8_nPoly1.xyz",
               "--p-grid", "1", "--p-solution", "0", "--silent"])
    import numpy as np
    out = np.load(os.path.join(dg.results_dir, "amplification.npz"))
    for q in range(1, 5):
        A = out[f"A{q}"]
        assert 0.0 <= A.min() and A.max() <= 1.0  # GS contracts the FVM stencil
