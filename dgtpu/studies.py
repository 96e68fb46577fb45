"""Convergence-study driver: h-/p-refinement sweeps with stored results.

The reference generates its thesis convergence figures from per-run
``summary.txt`` files collected by hand (visualization.py:403-584).  This
module automates the sweep: run a solver configuration over a list of grids
and polynomial degrees, collect L1/L2 errors and residuals, persist a JSON
table, and render the log-log convergence plot with p+1 slope triangles.
"""

import json
import os

import numpy as np

from dgtpu.api import DGFEM
from dgtpu.settings import Settings, load_params


def run_convergence_study(grid_sizes=(2, 4, 8), degrees=(1, 2, 3),
                          p_grid=1, method="direct", problem="Poisson",
                          exact=None, paramfile=None, outdir=None,
                          silent=True):
    """Returns {p: [(N, L2_error), ...]} and writes results/table/plot."""
    results = {}
    details = []
    for p in degrees:
        pts = []
        for n in grid_sizes:
            params = load_params(paramfile)
            params["problem"]["type"] = problem
            if exact:
                params["problem"]["exact solution"] = dict(exact)
            params["grid"]["filename"] = f"Rectangle_{n}X{n}_nPoly{p_grid}.xyz"
            params["grid"]["polynomial degree"] = p_grid
            params["solution"]["u"]["polynomial degree"] = p
            if problem == "Stokes":
                params["solution"]["p"]["polynomial degree"] = max(p - 1, 0)
            params["visualization"]["export"] = False
            params["visualization"]["automatically open paraview"] = False
            params["logging"]["loglevel"] = "ERROR" if silent else "INFO"
            s = Settings(params)
            s.solver.method = method
            s.update_setting("solver.discretization", "dg")
            dg = DGFEM(settings=s, **{f"solve_{method}": True})
            dg.solve()
            pts.append((n, dg.L2_error_u))
            row = {"p": p, "N": n, "L2_u": dg.L2_error_u,
                   "L1_u": dg.L1_error_u, "residual": dg.residual}
            if problem == "Stokes":
                row.update({"L2_v": dg.L2_error_v, "L2_p": dg.L2_error_p})
            details.append(row)
        results[p] = pts

    rates = {}
    for p, pts in results.items():
        errs = [e for _, e in sorted(pts)]
        rates[p] = [float(np.log2(errs[i] / errs[i + 1]))
                    for i in range(len(errs) - 1)]

    if outdir is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        outdir = os.path.join(repo, "postprocessing", "convergence")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"{problem}_convergence.json"), "w") as f:
        json.dump({"details": details, "rates": rates}, f, indent=1)
    try:
        from dgtpu.visualization import plot_grid_convergence
        plot_grid_convergence(results, outdir=outdir,
                              name=f"{problem}_convergence")
    except Exception:
        pass
    return results, rates


def run_spectral_radius_study(grid_sizes=(2, 4), degrees=(1, 2), p_grid=1,
                              grid_kind="rectangle", sigma_multiplier=1,
                              which="forward", outdir=None):
    """rho(B) of the block-GS iteration matrix over grids x degrees.

    The reference computes these numbers one run at a time via its
    ``check_iteration_matrix`` flag (relaxation.py:494-509) and collects
    them by hand into the thesis dict fed to plot_spectral_radius
    (visualization.py:586-720); this sweeps and plots in one call.
    Returns {p: [(n, rho), ...]}.
    """
    from dgtpu.diagnostics import spectral_radius_gs

    results = {}
    for p in degrees:
        pts = []
        for n in grid_sizes:
            params = load_params()
            prefix = "Rectangle" if grid_kind == "rectangle" else "CircleInCircle"
            params["grid"]["filename"] = f"{prefix}_{n}X{n}_nPoly{p_grid}.xyz"
            params["grid"]["polynomial degree"] = p_grid
            if grid_kind != "rectangle":
                params["grid"]["O grid"] = True
            params["solution"]["u"]["polynomial degree"] = p
            params["problem"]["SIP penalty parameter multiplier"] = sigma_multiplier
            params["visualization"]["export"] = False
            params["visualization"]["automatically open paraview"] = False
            params["logging"]["loglevel"] = "ERROR"
            s = Settings(params)
            s.solver.method = "direct"
            s.update_setting("solver.discretization", "dg")
            dg = DGFEM(settings=s, solve_direct=True)
            lvl = dg.levels[-1]
            A = np.asarray(lvl.op.to_dense())
            rho = spectral_radius_gs(A, lvl.N_DOF_sol_tot, which=which)
            pts.append((n, float(rho)))
        results[p] = pts

    if outdir is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        outdir = os.path.join(repo, "postprocessing", "spectral_radius")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, f"spectral_radius_{grid_kind}.json"), "w") as f:
        json.dump({str(p): pts for p, pts in results.items()}, f, indent=1)
    try:
        from dgtpu.visualization import plot_spectral_radius
        plot_spectral_radius(results, outdir=outdir,
                             name=f"spectral_radius_{grid_kind}_sigmamul"
                                  f"{sigma_multiplier}")
    except Exception:
        pass
    return results


def run_figure_suite(p=3, outdir=None):
    """Generate the full basis/element thesis-figure set in one call.

    Covers the reference's manual figure scripts (visualization.py:174-401):
    standard element, 1D modal + nodal bases, the 2D tensor-product modal
    basis-mode surfaces, Lebesgue functions + Lebesgue-constant growth, and
    the Runge interpolation comparison.  Returns the written paths.
    """
    from dgtpu import visualization as viz
    if outdir is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        outdir = os.path.join(repo, "postprocessing", "plots")
    paths = [
        viz.plot_standard_element(p, outdir=outdir),
        viz.plot_basis_1d(p, outdir=outdir),
        viz.plot_basis_nodal_1d(p, outdir=outdir),
        viz.plot_basis_2d(p, outdir=outdir),
        viz.plot_lebesgue(p, outdir=outdir),
        viz.plot_lebesgue_constant(max(p, 6), outdir=outdir),
        viz.plot_runge(max(p, 6), outdir=outdir),
    ]
    return [p_ for p_ in paths if p_ is not None]
