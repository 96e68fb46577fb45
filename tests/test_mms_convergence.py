"""MMS integration tests: exactness, h- and p-convergence (reference §4 oracle)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.geometry import Geometry
from dgtpu.level import GridLevel
from dgtpu.mms import ManufacturedSolution
from dgtpu.models.poisson import assemble_poisson
from dgtpu.solvers.direct import solve_direct
from dgtpu.utils.norms import lp_norm
from tests.conftest import INPUT_DIR


def _solve(base_settings, n, p_grid, p_sol, expr, premul=True):
    base_settings.update_setting("grid.polynomial_degree", p_grid)
    base_settings.update_setting("problem.multiply_inverse_mass_matrix", premul)
    geom = Geometry(os.path.join(INPUT_DIR, f"Rectangle_{n}X{n}_nPoly{p_grid}.xyz"),
                    base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": p_sol})
    mms = ManufacturedSolution({"u": expr}, "Poisson",
                               base_settings.problem.kinematic_viscosity)
    op, rhs, _ = assemble_poisson(lvl, mms)
    u = solve_direct(op, rhs)
    un = u.reshape(lvl.N, -1) @ jnp.asarray(lvl.quad.V_sol_grid["u"]).T
    ue = mms.u(jnp.asarray(lvl.X), jnp.asarray(lvl.Y))
    return float(lp_norm(un - ue, 2))


@pytest.mark.parametrize("expr,p_min", [("x + y", 1), ("x**2 + y**2", 2),
                                        ("x**2*y + y**2", 3)])
def test_polynomial_exactness(base_settings, expr, p_min):
    """Polynomial exact solutions of degree <= p are reproduced to roundoff."""
    err = _solve(base_settings, 4, 1, p_min, expr)
    assert err < 1e-11


@pytest.mark.slow
def test_h_convergence_rate(base_settings):
    """L2 error ~ h^(p+1) for the smooth sine solution."""
    for p, expected in ((1, 2.0), (2, 3.0)):
        errs = [_solve(base_settings, n, 1, p, "sin(pi*x)*sin(pi*y)")
                for n in (2, 4, 8)]
        rates = [np.log2(errs[k] / errs[k + 1]) for k in range(2)]
        assert rates[-1] > expected - 0.35, (p, errs, rates)


def test_p_convergence(base_settings):
    """Error drops superalgebraically with p on a fixed grid."""
    errs = [_solve(base_settings, 4, 1, p, "sin(pi*x)*sin(pi*y)")
            for p in (1, 2, 3, 4)]
    assert all(errs[k + 1] < errs[k] * 0.5 for k in range(3)), errs


def test_nu_scaling(base_settings):
    """Viscosity scales through assembly and MMS source consistently."""
    base_settings.update_setting("problem.kinematic_viscosity", 2.5)
    err = _solve(base_settings, 4, 1, 2, "x**2 + y**2")
    assert err < 1e-11
    base_settings.update_setting("problem.kinematic_viscosity", 1.0)


def test_kovasznay_lambda_constant():
    """lam expression evaluation (Kovasznay config, dgfem.py:53-56)."""
    mms = ManufacturedSolution(
        {"u": "1 - exp(lam*x)*cos(2*pi*y)",
         "v": "lam/(2*pi)*exp(lam*x)*sin(2*pi*y)",
         "p": "-1/2*exp(2*lam*x)"},
        "Stokes", nu=0.025,
        lam_expr="-8*pi**2/(nu**(-1) + (nu**(-2) + 16*pi**2)**(1/2))")
    mms.check_divergence_free()
    lam = 0.025 ** -1 / 2 - np.sqrt(0.025 ** -2 / 4 + 4 * np.pi ** 2)
    assert np.isclose(float(mms.u(np.array([0.3]), np.array([0.2]))[0]),
                      1 - np.exp(lam * 0.3) * np.cos(2 * np.pi * 0.2), atol=1e-12)


def test_divergence_check_raises():
    mms = ManufacturedSolution({"u": "x", "v": "y", "p": "0"}, "Stokes", 1.0)
    with pytest.raises(ValueError, match="divergence-free"):
        mms.check_divergence_free()


def test_autodiff_source_matches_sympy():
    """Cross-check the autodiff momentum source against symbolic sympy."""
    sympy = pytest.importorskip("sympy")
    x, y = sympy.symbols("x y")
    u = -2 * sympy.sin(sympy.pi * x) ** 2 * sympy.sin(sympy.pi * y) * sympy.cos(sympy.pi * y)
    f = -(sympy.diff(u, x, 2) + sympy.diff(u, y, 2))
    f_np = sympy.lambdify((x, y), f, "numpy")
    mms = ManufacturedSolution(
        {"u": "-2*sin(pi*x)**2*sin(pi*y)*cos(pi*y)"}, "Poisson", 1.0)
    pts = np.random.default_rng(3).uniform(-1, 1, (2, 50))
    ours = np.asarray(mms.f_momentum[0](pts[0], pts[1]))
    assert np.abs(ours - f_np(pts[0], pts[1])).max() < 1e-11
