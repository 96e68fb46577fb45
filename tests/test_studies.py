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
