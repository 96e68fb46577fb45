"""Compensated double-single (df32) residuals match the f64 oracle.

The df32 path (``ops/df32.py``) replaces the emulated-f64 defect matvec in
the refinement loop; these tests pin its accuracy against numpy float64 on
synthetic wide-dynamic-range stencils, on real assembled operators
(Poisson and Stokes incl. the pressure pin), and end-to-end through
``make_refined_solver(defect='df32')`` vs ``defect='f64'``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dgtpu.ops.df32 import (make_df32_residual, pair_to_f64, split_f64,
                            split_f64_np)
from dgtpu.ops.stencil import StencilOperator


def _random_stencil(rng, n=24, b=7, scale_spread=6):
    """Random masked stencil with ~10^±spread dynamic range in the entries."""
    mag = 10.0 ** rng.uniform(-scale_spread, scale_spread, (n, 5, b, b))
    blocks = rng.standard_normal((n, 5, b, b)) * mag
    nbr = rng.integers(0, n, (n, 5))
    nbr[:, 0] = np.arange(n)
    mask = rng.random((n, 5)) < 0.8
    mask[:, 0] = True
    blocks = np.where(mask[:, :, None, None], blocks, 0.0)
    return StencilOperator(jnp.asarray(blocks), jnp.asarray(nbr, jnp.int32),
                           jnp.asarray(mask))


def _oracle_residual(op, b, u):
    blocks = np.asarray(op.blocks, np.float64)
    nbr = np.asarray(op.nbr)
    n, _, br, bc = blocks.shape
    un = np.asarray(u, np.float64).reshape(n, bc)[nbr]          # (N,5,Bc)
    return np.asarray(b, np.float64) - np.einsum(
        "nsij,nsj->ni", blocks, un).reshape(-1)


def test_split_roundtrip():
    # range bounded to |x| in ~[1e-26, 1e26]: below ~2e-31 the lo half of a
    # pair goes f32-subnormal and the representation degrades gracefully to
    # plain f32 (documented df32 range limit — far below residual scales)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000) * 10.0 ** rng.uniform(-25, 25, 1000)
    hi, lo = split_f64(jnp.asarray(x))
    back = np.asarray(pair_to_f64(hi, lo))
    assert np.max(np.abs(back - x) / np.abs(x)) < 2.0 ** -45
    hi2, lo2 = split_f64_np(x)
    np.testing.assert_array_equal(np.asarray(hi), hi2)
    np.testing.assert_array_equal(np.asarray(lo), lo2)


def test_df32_residual_random_stencil():
    rng = np.random.default_rng(1)
    op = _random_stencil(rng)
    n, _, br, bc = op.blocks.shape
    u = rng.standard_normal(n * bc)
    b = rng.standard_normal(n * br)
    df = make_df32_residual(op)
    r = np.asarray(pair_to_f64(*df(*split_f64(jnp.asarray(b)),
                                   *split_f64(jnp.asarray(u)))))
    r_exact = _oracle_residual(op, b, u)
    scale = np.max(np.abs(np.asarray(op.blocks)).sum(axis=(1, 3))) \
        * np.max(np.abs(u)) + np.max(np.abs(b))
    assert np.max(np.abs(r - r_exact)) < 1e-12 * scale


def test_df32_residual_real_poisson_and_cancellation():
    import __graft_entry__
    dg = __graft_entry__._flagship(n=8, p_grid=2, p_sol=2)
    op = dg.levels[-1].op
    b = np.asarray(dg.levels[-1].rhs)
    df = make_df32_residual(op)

    rng = np.random.default_rng(2)
    u = rng.standard_normal(b.size)
    r = np.asarray(pair_to_f64(*df(*split_f64(jnp.asarray(b)),
                                   *split_f64(jnp.asarray(u)))))
    r_exact = _oracle_residual(op, b, u)
    scale = np.max(np.abs(np.asarray(op.blocks)).sum(axis=(1, 3))) \
        * np.max(np.abs(u)) + np.max(np.abs(b))
    assert np.max(np.abs(r - r_exact)) < 1e-12 * scale

    # cancellation: at the exact solution the tiny residual must still match
    from dgtpu.solvers.direct import solve_direct
    u_star = np.asarray(solve_direct(op, jnp.asarray(b)))
    r_star = np.asarray(pair_to_f64(*df(*split_f64(jnp.asarray(b)),
                                        *split_f64(jnp.asarray(u_star)))))
    r_star_exact = _oracle_residual(op, b, u_star)
    assert np.max(np.abs(r_star)) < 1e-9 * np.max(np.abs(b))
    assert np.max(np.abs(r_star - r_star_exact)) < 1e-12 * scale


def test_df32_residual_stokes_with_pin():
    import os

    from dgtpu.geometry import Geometry
    from dgtpu.level import GridLevel
    from dgtpu.mms import ManufacturedSolution
    from dgtpu.models.stokes import assemble_stokes
    from dgtpu.settings import Settings, load_params

    params = load_params()
    params["problem"]["type"] = "Stokes"
    params["grid"]["filename"] = "Rectangle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["solution"]["ordering"] = "global"
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.update_setting("solver.discretization", "dg")
    geom = Geometry(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "input", "Rectangle_4X4_nPoly2.xyz"), s)
    mms = ManufacturedSolution(
        {"u": "sin(pi*x)*sin(pi*y)", "v": "cos(pi*x)*cos(pi*y)",
         "p": "x + y"}, "Stokes", s.problem.kinematic_viscosity)
    lvl = GridLevel(geom, s, ["u", "p"], {"u": 2, "p": 1}, sigma=18.0)
    assemble_stokes(lvl, mms, direct=True)
    op = lvl.op
    assert op.pin

    rng = np.random.default_rng(3)
    ntot = op.shape[0]
    b = np.asarray(lvl.rhs, np.float64)
    u = rng.standard_normal(ntot)
    df = make_df32_residual(op)
    r = np.asarray(pair_to_f64(*df(*split_f64(jnp.asarray(b)),
                                   *split_f64(jnp.asarray(u)))))
    r_exact = np.asarray(b - np.asarray(op.matvec(jnp.asarray(u)),
                                        np.float64))
    scale = max(np.max(np.abs(r_exact)), np.max(np.abs(b)))
    assert np.max(np.abs(r - r_exact)) < 1e-11 * scale


def test_refined_df32_matches_f64_backend():
    """Both defect backends reach the 1e-12 floor with the same outer count
    (±1) when the inner solve is an exact f32 inverse."""
    import __graft_entry__
    from dgtpu.solvers.refinement import make_refined_solver

    dg = __graft_entry__._flagship(n=4, p_grid=1, p_sol=1)
    op = dg.levels[-1].op
    b = dg.levels[-1].rhs
    A32inv = jnp.asarray(
        np.linalg.inv(np.asarray(op.to_dense())).astype(np.float32))

    def cycle32(r, e):
        return A32inv @ r

    out = {}
    for defect in ("f64", "df32"):
        solve = make_refined_solver(op, cycle32, n_inner=1, tol=1e-12,
                                    defect=defect)
        u, res, n, hist = solve(b, jnp.zeros_like(b))
        assert float(res) < 1e-12, defect
        out[defect] = (np.asarray(u), int(n))
    assert abs(out["f64"][1] - out["df32"][1]) <= 1
    assert np.max(np.abs(out["f64"][0] - out["df32"][0])) \
        < 1e-10 * np.max(np.abs(out["f64"][0]))


def test_df32_rejects_dense():
    from dgtpu.ops.stencil import DenseOperator
    with pytest.raises(TypeError):
        make_df32_residual(DenseOperator(jnp.eye(4)))
