"""CLI surface: flag validation and end-to-end smoke runs of every solver flag."""

import os

import numpy as np
import pytest

from dgtpu.__main__ import (MutuallyExclusiveArgumentError,
                            MutuallyInclusiveArgumentError, build_parser, main)
from tests.conftest import INPUT_DIR


def test_parser_requires_solver_flag():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_smoother_flag_mutually_inclusive():
    with pytest.raises(MutuallyInclusiveArgumentError):
        main(["-s"])


def test_amp_requires_discretization():
    with pytest.raises(MutuallyInclusiveArgumentError):
        main(["-amp"])


def test_amp_discretizations_exclusive():
    with pytest.raises(MutuallyExclusiveArgumentError):
        main(["-amp", "--dg-discretization", "--fvm-discretization"])


def test_solver_flags_mutually_exclusive():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-d", "-m"])


def test_cli_direct():
    dg = main(["-d", "-f", "Rectangle_4X4_nPoly1.xyz", "--p-grid", "1",
               "--p-solution", "2", "--silent"])
    assert dg.L2_error_u < 1.0


def test_cli_smoother():
    dg = main(["-s", "--smoother", "block_gauss_seidel_pyamg",
               "-f", "Rectangle_4X4_nPoly1.xyz", "--p-grid", "1",
               "--p-solution", "2", "--silent"])
    assert dg.residuals[-1] < 1e-6


def test_cli_krylov():
    dg = main(["-k", "-f", "Rectangle_4X4_nPoly1.xyz", "--p-grid", "1",
               "--p-solution", "2", "--silent"])
    assert dg.residual < 1e-4


def test_cli_amg():
    dg = main(["-amg", "-f", "Rectangle_4X4_nPoly1.xyz", "--p-grid", "1",
               "--p-solution", "2", "--silent"])
    assert dg.L2_error_u < 1.0


def test_cli_fvm():
    dg = main(["-fvm", "-f", "Rectangle_4X4_nPoly1.xyz", "--p-grid", "1",
               "--silent"])
    assert dg.L2_error_u < 1.0


def test_cli_amplification():
    """-amp requires P_sol == P_grid == 6 (reference settings.py:24-29)."""
    from dgtpu.geometry import generate_rectangle_grid, write_plot3d
    path = os.path.join(INPUT_DIR, "Rectangle_4X4_nPoly6.xyz")
    if not os.path.exists(path):
        write_plot3d(path, *generate_rectangle_grid(4, 4, 6))
    out = main(["-amp", "--dg-discretization", "-f", "Rectangle_4X4_nPoly6.xyz",
                "--p-grid", "6", "--p-solution", "6", "--silent"])
    # amplification path returns the analysis dict via solve(); the DGFEM
    # object is returned by main
    assert out is not None


def test_cli_diagnostics_flags():
    dg = main(["-d", "-f", "Rectangle_4X4_nPoly1.xyz", "--p-grid", "1",
               "--p-solution", "1", "--check-eigenvalues",
               "--check-condition-number", "--silent"])
    assert "cond" in dg.diagnostics


def test_cli_profile_flag(tmp_path):
    """--profile DIR captures a jax.profiler trace around the solve."""
    from dgtpu.__main__ import main
    out = str(tmp_path / "trace")
    dg = main(["-d", "-f", "Rectangle_2X2_nPoly1.xyz", "--p-grid", "1",
               "--profile", out, "--silent"])
    assert dg.L2_error_u < 1.0
    found = []
    for root, _, files in os.walk(out):
        found.extend(f for f in files if f.endswith(".xplane.pb"))
    assert found, f"no trace files under {out}"
