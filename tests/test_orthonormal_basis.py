"""orthonormal_on_physical_element: consistent per-element basis change."""

import numpy as np
import pytest

from dgtpu.api import DGFEM
from dgtpu.settings import Settings, load_params


def _run(ortho, grid="Rectangle_4X4_nPoly1.xyz", p_grid=1, p_sol=2, circ=False):
    params = load_params()
    params["grid"]["filename"] = grid
    params["grid"]["polynomial degree"] = p_grid
    params["grid"]["O grid"] = circ
    params["grid"]["circular"] = circ
    if circ:
        params["problem"]["SIP penalty parameter multiplier"] = 2
    params["problem"]["orthonormal on physical element"] = ortho
    params["solution"]["u"]["polynomial degree"] = p_sol
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "direct"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_direct=True)
    dg.solve()
    return dg


def test_solution_invariant_under_basis_change_curvilinear():
    """Same approximation space => identical nodal solution and errors."""
    a = _run(False, grid="CircleInCircle_4X4_nPoly2.xyz", p_grid=2, circ=True)
    b = _run(True, grid="CircleInCircle_4X4_nPoly2.xyz", p_grid=2, circ=True)
    assert np.isclose(a.L2_error_u, b.L2_error_u, rtol=1e-10)
    assert np.abs(a.u_nodal - b.u_nodal).max() < 1e-9


def test_mass_matrix_near_identity_on_affine():
    """On affine elements the transform is an exact orthonormalization."""
    from dgtpu.models.poisson import mass_matrices
    dg = _run(True)
    M = np.asarray(mass_matrices(dg.levels[-1]))
    assert np.abs(M - np.eye(M.shape[1])).max() < 1e-12


def test_polynomial_exactness_with_ortho_basis():
    params = load_params()
    params["grid"]["filename"] = "Rectangle_4X4_nPoly1.xyz"
    params["grid"]["polynomial degree"] = 1
    params["problem"]["orthonormal on physical element"] = True
    params["problem"]["exact solution"] = {"u": "x**2 + y**2", "tag": "quad"}
    params["solution"]["u"]["polynomial degree"] = 2
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "direct"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_direct=True)
    dg.solve()
    assert dg.L2_error_u < 1e-11
