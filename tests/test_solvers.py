"""Smoothers, transfer operators, multigrid: parity with the numpy oracle."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.geometry import Geometry
from dgtpu.level import CoarseGridLevel, GridLevel
from dgtpu.mms import ManufacturedSolution
from dgtpu.models.poisson import assemble_poisson
from dgtpu.ops.smoothers import (block_diag_inv, block_gauss_seidel,
                                 block_jacobi, element_colors)
from dgtpu.ops.transfer import (dg_to_fvm_restriction, fvm_geometric_prolongation,
                                geometric_prolongation, geometric_restriction,
                                make_transfer, p_restriction)
from dgtpu.solvers.direct import solve_direct
from dgtpu.solvers.relaxation_driver import residual_tracked_smoother
from tests.conftest import INPUT_DIR
from tests.numpy_reference import numpy_block_gs_sweep, numpy_block_jacobi_sweep

MMS = {"u": "sin(pi*x)*sin(pi*y)"}


def _setup(base_settings, n=4, p_grid=1, p_sol=2, premul=True):
    base_settings.update_setting("grid.polynomial_degree", p_grid)
    base_settings.update_setting("problem.multiply_inverse_mass_matrix", premul)
    geom = Geometry(os.path.join(INPUT_DIR, f"Rectangle_{n}X{n}_nPoly{p_grid}.xyz"),
                    base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": p_sol})
    mms = ManufacturedSolution(MMS, "Poisson", 1.0)
    op, rhs, _ = assemble_poisson(lvl, mms)
    return lvl, op, rhs


def test_block_gs_matches_numpy_sweep(base_settings):
    lvl, op, rhs = _setup(base_settings)
    A = np.asarray(op.to_dense())
    b = np.asarray(rhs)
    B = lvl.N_DOF_sol_tot
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(b.shape)
    # forward
    x_np = numpy_block_gs_sweep(A, b, x0, B)
    x_jx = block_gauss_seidel(op, rhs, jnp.asarray(x0), direction="forward",
                              iterations=1)
    assert np.abs(np.asarray(x_jx) - x_np).max() < 1e-11
    # symmetric x2
    x_np = x0
    for _ in range(2):
        x_np = numpy_block_gs_sweep(A, b, x_np, B, backward=False)
        x_np = numpy_block_gs_sweep(A, b, x_np, B, backward=True)
    x_jx = block_gauss_seidel(op, rhs, jnp.asarray(x0), direction="symmetric",
                              iterations=2)
    assert np.abs(np.asarray(x_jx) - x_np).max() < 1e-10


def test_block_jacobi_matches_numpy(base_settings):
    lvl, op, rhs = _setup(base_settings)
    A = np.asarray(op.to_dense())
    b = np.asarray(rhs)
    B = lvl.N_DOF_sol_tot
    x0 = np.zeros_like(b)
    x_np = x0
    for _ in range(3):
        x_np = numpy_block_jacobi_sweep(A, b, x_np, B, omega=0.8)
    x_jx = block_jacobi(op, rhs, jnp.asarray(x0), omega=0.8, iterations=3)
    assert np.abs(np.asarray(x_jx) - x_np).max() < 1e-11


def test_redblack_gs_converges(base_settings):
    lvl, op, rhs = _setup(base_settings)
    colors = element_colors(lvl.Ni, lvl.Nj)
    u, hist, n, status = residual_tracked_smoother(
        op, rhs, name="block_gauss_seidel", direction="symmetric",
        max_iterations=200, strategy="redblack", colors=colors)
    assert int(status) == 0, f"red-black GS did not converge: {np.asarray(hist)[:5]}"


def test_sequential_gs_solver_converges(base_settings):
    lvl, op, rhs = _setup(base_settings)
    u, hist, n, status = residual_tracked_smoother(
        op, rhs, name="block_gauss_seidel_pyamg", direction="symmetric",
        max_iterations=200)
    assert int(status) == 0
    u_direct = np.asarray(solve_direct(op, rhs))
    assert np.abs(np.asarray(u) - u_direct).max() < 1e-4


def test_matvec_matches_dense(base_settings):
    lvl, op, rhs = _setup(base_settings)
    A = np.asarray(op.to_dense())
    rng = np.random.default_rng(0)
    x = rng.standard_normal(A.shape[1])
    assert np.abs(np.asarray(op.matvec(jnp.asarray(x))) - A @ x).max() < 1e-12


# ---------------------------------------------------------------------------
# transfer operators
# ---------------------------------------------------------------------------

def test_p_restriction_selects_low_modes():
    R = p_restriction(5, 3)
    assert R.shape == (16, 36)
    # row (i=2, j=1) of coarse -> fine column 2 + 1*6 = 8
    assert R[2 + 1 * 4, 2 + 1 * 6] == 1.0
    assert R.sum() == 16.0  # exactly one 1 per row


def test_geometric_transfer_reproduces_reference_constants():
    """The generated p=1, cf=2 operators equal the reference's sqrt(3) table
    (dgfem.py:362-367) — derived independently from L2 projection."""
    R = geometric_restriction(1, 2)
    s3 = np.sqrt(3.0)
    expected = np.array([
        [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0]]) / 4.0
    assert np.allclose(R[0], expected[0], atol=1e-14)
    row1 = np.array([-s3, 1, 0, 0, s3, 1, 0, 0, -s3, 1, 0, 0, s3, 1, 0, 0]) / 8.0
    row2 = np.array([-s3, 0, 1, 0, -s3, 0, 1, 0, s3, 0, 1, 0, s3, 0, 1, 0]) / 8.0
    row3 = np.array([3, -s3, -s3, 1, -3, -s3, s3, 1, -3, s3, -s3, 1, 3, s3, s3, 1]) / 16.0
    assert np.allclose(R[1], row1, atol=1e-14)
    assert np.allclose(R[2], row2, atol=1e-14)
    assert np.allclose(R[3], row3, atol=1e-14)


def test_geometric_prolongation_exact_on_coarse_polys():
    """P must reproduce any coarse-representable function exactly on children."""
    for p in (1, 2):
        P = geometric_prolongation(p, 2)
        R = geometric_restriction(p, 2)
        # R P = identity (L2 projection of an exactly representable function)
        assert np.allclose(R @ P, np.eye((p + 1) ** 2), atol=1e-13)


def test_fvm_transfer_constants():
    P = fvm_geometric_prolongation()
    assert np.allclose(P[0], [9 / 16, 0, 0, 0])
    assert np.allclose(P[1], [9 / 16, 3 / 16, 0, 0])
    assert np.allclose(P[5], [9 / 16, 3 / 16, 3 / 16, 1 / 16])
    R1 = dg_to_fvm_restriction(1)
    assert np.allclose(R1, [[0.5, 0, 0, 0]])


def test_geometric_tile_reshape_roundtrip():
    """Restrict-then-prolong of a coarse-representable field is exact,
    including the m-order tile gather/scatter (solver.py:152-190 semantics)."""
    p, Ni_c, Nj_c = 1, 3, 2
    t = make_transfer("geometric", p_fine=p, Ni_c=Ni_c, Nj_c=Nj_c, cf=2)
    B = (p + 1) ** 2
    rng = np.random.default_rng(2)
    u_c = rng.standard_normal(Ni_c * Nj_c * B)
    fine = t.prolong(jnp.asarray(u_c))
    back = t.restrict(fine)
    assert np.abs(np.asarray(back) - u_c).max() < 1e-13


def test_packed_colored_sweep_matches_masked(base_settings):
    """ColorPack red-black sweep is bit-identical to the where-masked sweep."""
    import jax.numpy as jnp
    from dgtpu.geometry import Geometry
    from dgtpu.level import GridLevel
    from dgtpu.mms import ManufacturedSolution
    from dgtpu.models.poisson import assemble_poisson
    from dgtpu.ops.smoothers import (ColorPack, _gs_sweep_colored,
                                     _gs_sweep_packed, block_diag_inv,
                                     element_colors)

    base_settings.update_setting("grid.polynomial_degree", 1)
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_4X4_nPoly1.xyz"),
                    base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": 2})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    lvl.op, rhs, _ = assemble_poisson(lvl, mms)
    Dinv = block_diag_inv(lvl.op)
    colors = element_colors(lvl.Ni, lvl.Nj)
    pack = ColorPack(lvl.op, colors)
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal(rhs.shape[0]))
    u_masked = _gs_sweep_colored(lvl.op, rhs, u0, Dinv, 1.0, colors)
    u_packed = _gs_sweep_packed(lvl.op, rhs, u0, Dinv, 1.0, pack)
    assert np.array_equal(np.asarray(u_masked), np.asarray(u_packed))


def test_amg_converges_high_order(base_settings):
    """SA-AMG stays convergent for high-p SIP-DG: the smoothing and
    prolongator omegas are normalized by a measured rho(D^-1 A) and the
    finest level uses element-block Jacobi (unnormalized fixed omegas
    diverge for p >= 3)."""
    import jax.numpy as jnp
    from dgtpu.geometry import Geometry
    from dgtpu.level import GridLevel
    from dgtpu.mms import ManufacturedSolution
    from dgtpu.models.poisson import assemble_poisson
    from dgtpu.solvers.amg import solve_amg

    base_settings.update_setting("grid.polynomial_degree", 2)
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_4X4_nPoly2.xyz"),
                    base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": 4})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    lvl.op, rhs, _ = assemble_poisson(lvl, mms)
    u, info = solve_amg(lvl.op, rhs)
    assert info["info"] == 0
    r = np.asarray(rhs) - np.asarray(lvl.op.matvec(u))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs)) < 1e-5


def test_krylov_amg_preconditioner(base_settings):
    """AMG-preconditioned GMRES solves Poisson to the direct-solve answer
    (dgtpu extension over the reference's block-diagonal preconditioner)."""
    from dgtpu.geometry import Geometry
    from dgtpu.level import GridLevel
    from dgtpu.mms import ManufacturedSolution
    from dgtpu.models.poisson import assemble_poisson
    from dgtpu.solvers.direct import solve_direct
    from dgtpu.solvers.krylov import solve_krylov

    s = base_settings
    s.update_setting("grid.polynomial_degree", 1)
    s.update_setting("solver.krylov", type("N", (), {})())
    s.solver.krylov.preconditioner = "amg"
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_8X8_nPoly1.xyz"), s)
    lvl = GridLevel(geom, s, ["u"], {"u": 2})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    lvl.op, lvl.rhs, _ = assemble_poisson(lvl, mms)
    u = solve_krylov(lvl, s)
    ud = np.asarray(solve_direct(lvl.op, lvl.rhs))
    assert np.abs(np.asarray(u) - ud).max() < 1e-6 * np.abs(ud).max()


def test_krylov_cg_matches_direct(base_settings):
    """The documented CG path: SPD SIP Poisson (no mass premultiply)
    preconditioned CG agrees with the direct solve."""
    from dgtpu.solvers.krylov import solve_krylov

    s = base_settings
    lvl, op, rhs = _setup(s, n=4, p_grid=1, p_sol=2, premul=False)
    # the SIP operator without M^-1 premultiply is symmetric positive definite
    A = np.asarray(op.to_dense())
    assert np.abs(A - A.T).max() < 1e-10
    lvl.op, lvl.rhs = op, rhs
    s.update_setting("solver.krylov", type("N", (), {})())
    s.solver.krylov.method = "cg"
    u = np.asarray(solve_krylov(lvl, s))
    ud = np.asarray(solve_direct(op, rhs))
    assert np.abs(u - ud).max() < 1e-6 * np.abs(ud).max()


def test_krylov_paramfile_settings_roundtrip():
    """solver.krylov knobs flow from the paramfile; explicit kwargs win."""
    from dgtpu.settings import Settings, load_params
    from dgtpu.solvers.krylov import _krylov_params

    params = load_params()
    params["solver"]["krylov"]["method"] = "cg"
    params["solver"]["krylov"]["tolerance"] = 1e-9
    params["solver"]["krylov"]["absolute tolerance"] = 1e-7
    params["solver"]["krylov"]["max iterations"] = 123
    params["solver"]["krylov"]["restart"] = 17
    s = Settings(params)
    p = _krylov_params(s, None, None, None, None)
    assert p["method"] == "cg" and p["tol"] == 1e-9 and p["atol"] == 1e-7
    assert p["maxiter"] == 123 and p["restart"] == 17
    # explicit keyword overrides the paramfile
    p2 = _krylov_params(s, 1e-3, None, 5, None)
    assert p2["tol"] == 1e-3 and p2["maxiter"] == 5 and p2["restart"] == 17


def test_krylov_cg_rejects_stokes():
    from dgtpu.settings import Settings, load_params
    from dgtpu.solvers.krylov import solve_krylov

    params = load_params()
    params["problem"]["type"] = "Stokes"
    params["solution"]["ordering"] = "global"
    params["solver"]["krylov"]["method"] = "cg"
    s = Settings(params)

    class FakeLevel:
        block_A = object()     # marks a Stokes saddle operator
        op = rhs = None

    with pytest.raises(ValueError, match="indefinite"):
        solve_krylov(FakeLevel(), s)


def test_nonfinite_residual_reports_diverged(base_settings):
    """A NaN residual must map to status 2 (diverged), not 1 (max iters)."""
    lvl, op, rhs = _setup(base_settings)
    bad_rhs = rhs.at[0].set(jnp.nan)
    _, _, _, status = residual_tracked_smoother(
        op, bad_rhs, name="block_gauss_seidel", max_iterations=5)
    assert int(status) == 2


@pytest.mark.parametrize("variant", ["sa", "rs"])
def test_amg_variants_converge(base_settings, variant):
    """Both AMG variants solve the p<=2 SIP operator: sa (dgtpu default) and
    rs (the reference's literal pyamg Ruge-Stuben choice, solver.py:68-77)."""
    from dgtpu.solvers.amg import solve_amg

    base_settings.update_setting("grid.polynomial_degree", 2)
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_8X8_nPoly2.xyz"),
                    base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": 2})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    lvl.op, rhs, _ = assemble_poisson(lvl, mms)
    u, info = solve_amg(lvl.op, rhs, variant=variant)
    assert info["info"] == 0, f"{variant} AMG did not converge"
    r = np.asarray(rhs) - np.asarray(lvl.op.matvec(u))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(rhs)) < 1e-5


def test_rs_interpolation_reproduces_constant(base_settings):
    """Direct interpolation must interpolate the constant vector exactly on
    rows with a strong C neighbor (the RS design invariant)."""
    from dgtpu.solvers.amg import (_cf_split, _rs_direct_interpolation,
                                   _rs_strength)

    lvl, op, rhs = _setup(base_settings, n=4, p_grid=1, p_sol=1, premul=False)
    A = np.asarray(op.to_dense())
    S = _rs_strength(A)
    is_C = _cf_split(S)
    P = _rs_direct_interpolation(A, S, is_C)
    assert 0 < is_C.sum() < A.shape[0]
    ones_c = np.ones(int(is_C.sum()))
    v = P @ ones_c
    # C rows are exact; F rows with a strong C neighbor interpolate a
    # row-sum-consistent value (exactly 1 for zero-row-sum interior rows)
    assert np.allclose(v[is_C], 1.0)


def test_krylov_multigrid_preconditioner_poisson():
    """Krylov-accelerated multigrid (dgtpu extension): one V-cycle per GMRES
    iteration over the same p+geometric hierarchy the multigrid method uses.
    The reference has no multigrid preconditioner (solver.py:79-112)."""
    from dgtpu.api import DGFEM
    from dgtpu.settings import Settings, load_params

    params = load_params()
    params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["solution"]["u"]["polynomial degree"] = 3
    params["solver"]["multigrid"]["polynomial coarsening"]["levels"]["u"] = "3,1"
    params["solver"]["multigrid"]["coarse grid solver"] = "direct"
    params["solver"]["krylov"]["preconditioner"] = "multigrid"
    params["solver"]["krylov"]["method"] = "gmres"
    # a strong preconditioner: full convergence inside a single restart
    params["solver"]["krylov"]["max iterations"] = 30
    params["solver"]["krylov"]["restart"] = 15
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    params["caching"]["enabled"] = False
    s = Settings(params)
    s.solver.method = "krylov"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_krylov=True)
    assert len(dg.levels) > 1, "hierarchy must be assembled for the precond"
    dg.solve()
    lvl = dg.levels[-1]
    from dgtpu.utils.norms import lp_norm
    assert dg.residual / float(lp_norm(lvl.rhs, 2)) < 1e-7


def test_krylov_multigrid_preconditioner_stokes():
    """DGS-smoothed saddle V-cycle as the GMRES preconditioner — far
    stronger than the block-diagonal Schur approximation."""
    from dgtpu.api import DGFEM
    from dgtpu.settings import Settings, load_params

    params = load_params()
    params["problem"]["type"] = "Stokes"
    params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["solution"]["u"]["polynomial degree"] = 2
    params["solution"]["p"]["polynomial degree"] = 1
    params["solution"]["ordering"] = "global"
    params["problem"]["SIP penalty parameter multiplier"] = 2
    params["solver"]["multigrid"]["penalty parameter coarsening"]["enabled"] = True
    params["solver"]["multigrid"]["penalty parameter coarsening"]["multipliers"] = "2,1"
    params["solver"]["multigrid"]["polynomial coarsening"]["enabled"] = False
    params["solver"]["multigrid"]["geometric coarsening"]["enabled"] = False
    params["solver"]["multigrid"]["coarse grid solver"] = "direct"
    params["solver"]["krylov"]["preconditioner"] = "multigrid"
    params["solver"]["krylov"]["max iterations"] = 60
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    params["caching"]["enabled"] = False
    s = Settings(params)
    s.solver.method = "krylov"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_krylov=True)
    dg.solve()
    lvl = dg.levels[-1]
    from dgtpu.utils.norms import lp_norm
    assert dg.residual / float(lp_norm(lvl.rhs, 2)) < 1e-6


def test_krylov_cg_multigrid_requires_symmetric_cycle():
    """CG + preconditioner 'multigrid': a V-cycle is SPD only when the
    post-smoother is the pre-smoother's adjoint with equal counts.  The
    forward/forward default must raise early (jax CG misconverges silently
    on a non-SPD M — advisor r3); adjoint forward/backward sweeps are
    accepted and converge."""
    from dgtpu.api import DGFEM
    from dgtpu.settings import Settings, load_params

    def make(pre_dir, post_dir):
        params = load_params()
        params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
        params["grid"]["polynomial degree"] = 2
        params["solution"]["u"]["polynomial degree"] = 3
        mgp = params["solver"]["multigrid"]
        mgp["polynomial coarsening"]["levels"]["u"] = "3,1"
        mgp["polynomial coarsening"]["pre smoother"]["direction"] = pre_dir
        mgp["polynomial coarsening"]["post smoother"]["direction"] = post_dir
        mgp["polynomial coarsening"]["post smoother"]["iterations"] = \
            mgp["polynomial coarsening"]["pre smoother"]["iterations"]
        # the default geometric node is symmetric x2 pre / x1 post — equal
        # counts are required for a symmetric cycle, so pin them
        mgp["geometric coarsening"]["post smoother"]["iterations"] = \
            mgp["geometric coarsening"]["pre smoother"]["iterations"]
        mgp["coarse grid solver"] = "direct"
        params["solver"]["krylov"]["preconditioner"] = "multigrid"
        params["solver"]["krylov"]["method"] = "cg"
        params["solver"]["krylov"]["max iterations"] = 40
        params["visualization"]["export"] = False
        params["visualization"]["automatically open paraview"] = False
        params["logging"]["loglevel"] = "ERROR"
        params["caching"]["enabled"] = False
        s = Settings(params)
        s.solver.method = "krylov"
        s.update_setting("solver.discretization", "dg")
        return DGFEM(settings=s, solve_krylov=True)

    with pytest.raises(ValueError, match="symmetric cycle"):
        make("forward", "forward").solve()

    dg = make("forward", "backward")
    dg.solve()
    from dgtpu.utils.norms import lp_norm
    assert dg.residual / float(lp_norm(dg.levels[-1].rhs, 2)) < 1e-7


def test_krylov_multigrid_preconditioner_needs_hierarchy():
    """preconditioner: multigrid with every coarsening disabled fails early
    with an actionable message instead of a shape error mid-solve."""
    from dgtpu.api import DGFEM
    from dgtpu.settings import Settings, load_params

    params = load_params()
    params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    for c in ("polynomial coarsening", "geometric coarsening",
              "penalty parameter coarsening"):
        params["solver"]["multigrid"][c]["enabled"] = False
    params["solver"]["krylov"]["preconditioner"] = "multigrid"
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "krylov"
    s.update_setting("solver.discretization", "dg")
    with pytest.raises(ValueError, match="coarsening"):
        DGFEM(settings=s, solve_krylov=True)


def test_chebyshev_smoother_contracts(base_settings):
    """Chebyshev is a SMOOTHER: on a high-frequency error (what the coarse
    grid cannot represent, i.e. what pre-smoothing must kill) degree-3
    Chebyshev beats 3 damped-Jacobi sweeps at the same matvec count.  On
    smooth error it may lose — components below eig_ratio*lmax are
    outside the damped interval by design; multigrid owns those."""
    from dgtpu.ops.smoothers import (block_diag_inv, block_jacobi, chebyshev,
                                     estimate_rho_dinv_a)

    lvl, op, rhs = _setup(base_settings, n=8, p_grid=1, p_sol=2, premul=False)
    Dinv = block_diag_inv(op)
    rho = estimate_rho_dinv_a(op, Dinv)
    assert rho > 0
    # oscillatory error: dominant eigenvector of D^-1 A (top of the
    # spectrum); solve A u = A e from u0 = 0 so the error IS e
    rng = np.random.default_rng(3)
    e = jnp.asarray(rng.standard_normal(np.asarray(rhs).shape))
    for _ in range(40):
        w = jnp.einsum("nij,nj->ni", Dinv,
                       op.matvec(e).reshape(Dinv.shape[0], -1)).reshape(-1)
        e = w / jnp.linalg.norm(w)
    b = op.matvec(e)
    u0 = jnp.zeros_like(b)
    u_ch = chebyshev(op, b, u0, degree=3, eig_max=1.1 * rho, Dinv=Dinv)
    u_ja = block_jacobi(op, b, u0, omega=0.8, iterations=3, Dinv=Dinv)
    err_ch = np.linalg.norm(np.asarray(u_ch) - np.asarray(e))
    err_ja = np.linalg.norm(np.asarray(u_ja) - np.asarray(e))
    assert err_ch < err_ja
    assert err_ch < 0.2   # high-frequency error crushed


def test_chebyshev_multigrid_converges():
    """Flagship p+geometric multigrid smoothed by degree-3 Chebyshev."""
    from dgtpu.api import DGFEM
    from dgtpu.settings import Settings, load_params

    params = load_params()
    params["grid"]["filename"] = "Rectangle_8X8_nPoly5.xyz"
    for c in ("polynomial coarsening", "geometric coarsening"):
        for w in ("pre smoother", "post smoother"):
            params["solver"]["multigrid"][c][w]["smoother"] = "chebyshev"
            params["solver"]["multigrid"][c][w]["iterations"] = 3
    params["visualization"]["export"] = False
    params["visualization"]["automatically open paraview"] = False
    params["logging"]["loglevel"] = "ERROR"
    params["caching"]["enabled"] = False
    s = Settings(params)
    s.solver.method = "multigrid"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_multigrid=True)
    dg.solve()
    assert dg.residuals[-1] < 1e-6
    assert len(dg.residuals) - 1 <= 15


def test_chebyshev_standalone_smoother_driver(base_settings):
    """The residual-tracked smoother driver accepts chebyshev (one tracked
    'sweep' = one degree-3 application; eig bound estimated eagerly)."""
    from dgtpu.solvers.relaxation_driver import residual_tracked_smoother

    lvl, op, rhs = _setup(base_settings, n=4, p_grid=1, p_sol=2, premul=False)
    u, hist, n, status = residual_tracked_smoother(
        op, rhs, name="chebyshev", max_iterations=400, tol=1e-6)
    assert int(status) == 0
    hist = np.asarray(hist)
    assert hist[np.isfinite(hist)][-1] < 1e-6
