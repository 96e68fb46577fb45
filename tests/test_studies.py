"""Convergence-study driver: rates come out ~p+1 and results persist."""

import json
import os

import numpy as np

from dgtpu.studies import run_convergence_study


def test_poisson_convergence_study(tmp_path):
    results, rates = run_convergence_study(
        grid_sizes=(2, 4, 8), degrees=(1, 2), p_grid=1,
        exact={"u": "sin(pi*x)*sin(pi*y)", "tag": "MMS"},
        outdir=str(tmp_path))
    for p in (1, 2):
        assert rates[p][-1] > p + 1 - 0.4, (p, rates)
    data = json.load(open(os.path.join(tmp_path, "Poisson_convergence.json")))
    assert len(data["details"]) == 6
    assert os.path.exists(os.path.join(tmp_path, "Poisson_convergence.png"))


def test_spectral_radius_study(tmp_path):
    """rho(B) sweep: increases toward 1 with grid size, larger for higher p
    (the thesis trend, reference visualization.py:586-720)."""
    from dgtpu.studies import run_spectral_radius_study
    res = run_spectral_radius_study(grid_sizes=(2, 4), degrees=(1, 2),
                                    outdir=str(tmp_path))
    for p, pts in res.items():
        rhos = [r for _, r in sorted(pts)]
        assert all(0 < r < 1 for r in rhos)      # convergent smoother
        assert rhos[0] < rhos[1]                 # degrades with grid size
    assert res[1][1][1] < res[2][1][1]           # degrades with degree
    assert any(f.endswith(".svg") for f in os.listdir(tmp_path))


def test_figure_suite(tmp_path):
    from dgtpu.studies import run_figure_suite
    from dgtpu import visualization as viz
    if not viz.HAVE_MPL:
        import pytest
        pytest.skip("matplotlib unavailable")
    paths = run_figure_suite(p=2, outdir=str(tmp_path))
    import os
    assert len(paths) == 7
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_amplification_quadrant_figure(tmp_path):
    """calculate_amplification exports the reference's four-quadrant layout."""
    import os
    from dgtpu.geometry import Geometry
    from dgtpu.level import GridLevel
    from dgtpu.mms import ManufacturedSolution
    from dgtpu.models.poisson import assemble_poisson
    from dgtpu.solvers.amplification import calculate_amplification
    from dgtpu.settings import Settings, load_params
    from dgtpu import visualization as viz
    from tests.conftest import INPUT_DIR
    if not viz.HAVE_MPL:
        import pytest
        pytest.skip("matplotlib unavailable")

    params = load_params()
    params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_4X4_nPoly2.xyz"), s)
    lvl = GridLevel(geom, s, ["u"], {"u": 2})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    lvl.op, lvl.rhs, _ = assemble_poisson(lvl, mms)
    calculate_amplification(lvl, str(tmp_path), n_theta=9, export=True)
    assert os.path.exists(os.path.join(tmp_path,
                                       "amplification_quadrants.png"))
