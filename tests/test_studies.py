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
