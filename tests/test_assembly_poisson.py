"""Poisson SIP operator: structural properties + equality vs the numpy oracle."""

import os

import numpy as np
import pytest

from dgtpu.geometry import Geometry, generate_annulus_grid, write_plot3d
from dgtpu.level import GridLevel
from dgtpu.mms import ManufacturedSolution
from dgtpu.models.poisson import assemble_poisson, mass_matrices
from tests.conftest import INPUT_DIR
from tests.numpy_reference import MiniPoisson


def _level(base_settings, n=4, p_grid=1, p_sol=2, premul=False, ogrid=False,
           gridfile=None):
    base_settings.update_setting("grid.polynomial_degree", p_grid)
    base_settings.update_setting("problem.multiply_inverse_mass_matrix", premul)
    if ogrid:
        base_settings.update_setting("grid.O_grid", True)
        base_settings.update_setting("grid.circular", True)
    gridfile = gridfile or f"Rectangle_{n}X{n}_nPoly{p_grid}.xyz"
    geom = Geometry(os.path.join(INPUT_DIR, gridfile), base_settings)
    return GridLevel(geom, base_settings, ["u"], {"u": p_sol})


@pytest.mark.parametrize("p_sol", [1, 2, 3])
def test_operator_matches_numpy_oracle(base_settings, p_sol):
    lvl = _level(base_settings, n=4, p_grid=1, p_sol=p_sol)
    op, _, _ = assemble_poisson(lvl)
    A = np.asarray(op.to_dense())
    A_ref = MiniPoisson(lvl).dense(with_mass_premultiply=False)
    assert np.abs(A - A_ref).max() < 1e-11 * max(1, np.abs(A_ref).max())


def test_operator_matches_oracle_ogrid(base_settings):
    x, y = generate_annulus_grid(4, 4, 2)
    path = os.path.join(INPUT_DIR, "gen_annulus_4x4_p2.xyz")
    write_plot3d(path, x, y)
    lvl = _level(base_settings, p_grid=2, p_sol=2, ogrid=True,
                 gridfile="gen_annulus_4x4_p2.xyz")
    op, _, _ = assemble_poisson(lvl)
    A = np.asarray(op.to_dense())
    A_ref = MiniPoisson(lvl).dense(with_mass_premultiply=False)
    assert np.abs(A - A_ref).max() < 1e-10 * np.abs(A_ref).max()


def test_sip_operator_is_spd(base_settings):
    """SIP with sufficient penalty is symmetric positive definite
    (the reference asserts face-block symmetry at assembly, face.py:119-126)."""
    lvl = _level(base_settings, n=4, p_grid=1, p_sol=2)
    op, _, _ = assemble_poisson(lvl)
    A = np.asarray(op.to_dense())
    assert np.abs(A - A.T).max() < 1e-11 * np.abs(A).max()
    np.linalg.cholesky(A)  # raises if not SPD


def test_mass_premultiply(base_settings):
    lvl = _level(base_settings, n=2, p_grid=1, p_sol=2, premul=True)
    op, _, inv_mass = assemble_poisson(lvl)
    A = np.asarray(op.to_dense())
    lvl2 = _level(base_settings, n=2, p_grid=1, p_sol=2, premul=False)
    op2, _, _ = assemble_poisson(lvl2)
    A2 = np.asarray(op2.to_dense())
    B = lvl.N_DOF_sol_tot
    Minv = np.asarray(inv_mass)
    blockdiag = np.zeros_like(A2)
    for e in range(lvl.N):
        blockdiag[e * B:(e + 1) * B, e * B:(e + 1) * B] = Minv[e]
    assert np.allclose(A, blockdiag @ A2, atol=1e-10)


def test_mass_matrix_is_identity_on_affine(base_settings):
    """On affine elements the orthonormal basis gives M = J * I (J const)."""
    lvl = _level(base_settings, n=4, p_grid=1, p_sol=3)
    M = np.asarray(mass_matrices(lvl))
    J = 0.25 ** 2
    for e in range(lvl.N):
        assert np.allclose(M[e], J * np.eye(lvl.N_DOF_sol_tot), atol=1e-13)


def test_rhs_matches_quadrature(base_settings):
    """Interior element RHS (no boundary terms) = sum_q w J f phi_i."""
    lvl = _level(base_settings, n=4, p_grid=1, p_sol=2)
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    _, rhs, _ = assemble_poisson(lvl, mms)
    rhs = np.asarray(rhs).reshape(lvl.N, -1)
    # interior element m = 1 + 1*4 = 5
    g = {k: np.asarray(v) for k, v in lvl.gt["u"]["e"].items()}
    V = lvl.quad.V_sol_int["u"]["u"]
    wJ = lvl.quad.w_int_2d["u"] * g["J"][5]
    f = np.asarray(mms.f_momentum[0](g["x"][5], g["y"][5]))
    expect = V.T @ (wJ * f)
    assert np.allclose(rhs[5], expect, atol=1e-13)


def test_periodic_ogrid_row_sum(base_settings):
    """On the O-grid, constants are in the kernel of the pure-Neumann-like
    i-direction coupling; with Dirichlet at j-ends the operator is still SPD."""
    x, y = generate_annulus_grid(4, 4, 1)
    path = os.path.join(INPUT_DIR, "gen_annulus_4x4_p1.xyz")
    write_plot3d(path, x, y)
    lvl = _level(base_settings, p_grid=1, p_sol=1, ogrid=True,
                 gridfile="gen_annulus_4x4_p1.xyz")
    op, _, _ = assemble_poisson(lvl)
    A = np.asarray(op.to_dense())
    assert np.abs(A - A.T).max() < 1e-10 * np.abs(A).max()
    np.linalg.cholesky(A)
