"""Bases and quadrature against closed forms (reference interpolation.py semantics)."""

import numpy as np
import pytest

from dgtpu.basis import (QuadratureSet, gauss_legendre, grad_legendre_orthonormal,
                         grad_vandermonde_2d, legendre_gauss_lobatto,
                         legendre_orthonormal, vandermonde_2d)


def test_gauss_legendre_exactness():
    # n-point GL integrates polynomials up to degree 2n-1 exactly
    for n in (1, 2, 4, 8):
        r, w = gauss_legendre(n)
        for deg in range(2 * n):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            assert np.sum(w * r ** deg) == pytest.approx(exact, abs=1e-14)


def test_lgl_nodes_closed_forms():
    assert np.allclose(legendre_gauss_lobatto(2), [-1, 1])
    assert np.allclose(legendre_gauss_lobatto(3), [-1, 0, 1])
    # P=3: interior nodes +-1/sqrt(5)
    assert np.allclose(legendre_gauss_lobatto(4),
                       [-1, -1 / np.sqrt(5), 1 / np.sqrt(5), 1], atol=1e-15)
    # P=4: interior nodes +-sqrt(3/7), 0
    assert np.allclose(legendre_gauss_lobatto(5),
                       [-1, -np.sqrt(3 / 7), 0, np.sqrt(3 / 7), 1], atol=1e-15)


def test_legendre_orthonormality():
    r, w = gauss_legendre(12)
    for i in range(6):
        for j in range(6):
            ip = np.sum(w * legendre_orthonormal(r, i) * legendre_orthonormal(r, j))
            assert ip == pytest.approx(1.0 if i == j else 0.0, abs=1e-13)


def test_grad_legendre_matches_finite_difference():
    x = np.linspace(-0.9, 0.9, 11)
    h = 1e-6
    for p in range(1, 6):
        fd = (legendre_orthonormal(x + h, p) - legendre_orthonormal(x - h, p)) / (2 * h)
        assert np.allclose(grad_legendre_orthonormal(x, p), fd, atol=1e-7)


def test_vandermonde_2d_ordering():
    """Column-major mode ordering n = i + j*N; row ordering m = p + q*len(r)."""
    r = np.array([-0.5, 0.3])
    s = np.array([0.7])
    V = vandermonde_2d(3, r, s)
    assert V.shape == (2, 9)
    # mode (i=2, j=1) -> column 2 + 1*3 = 5; row for (r[1], s[0]) -> 1
    expect = legendre_orthonormal(np.array([0.3]), 2)[0] * \
        legendre_orthonormal(np.array([0.7]), 1)[0]
    assert V[1, 5] == pytest.approx(expect, rel=1e-14)


def test_vandermonde_2d_mass_orthonormality():
    n = 4
    r, w = gauss_legendre(n + 1)
    V = vandermonde_2d(n, r, r)
    w2 = np.ravel(np.outer(w, w), order="F")
    M = V.T @ (w2[:, None] * V)
    assert np.allclose(M, np.eye(n * n), atol=1e-13)


def test_grad_vandermonde_consistency():
    n = 4
    r, _ = gauss_legendre(6)
    Vr, Vs = grad_vandermonde_2d(n, r, r)
    h = 1e-6
    Vp = vandermonde_2d(n, r + h, r)
    Vm = vandermonde_2d(n, r - h, r)
    assert np.allclose(Vr, (Vp - Vm) / (2 * h), atol=1e-6)


def test_legendre_to_lagrange_interpolates_polynomials():
    from dgtpu.basis import legendre_to_lagrange_1d, lagrange_basis
    p = 3
    r = np.linspace(-1, 1, 9)
    xi = legendre_gauss_lobatto(p + 1)
    T = legendre_to_lagrange_1d(p, r)
    f = lambda x: 2 * x ** 3 - x + 0.5
    assert np.allclose(T @ f(xi), f(r), atol=1e-13)
    # equals the directly-constructed Lagrange basis
    assert np.allclose(T, lagrange_basis(r, xi), atol=1e-12)


def test_lebesgue_lgl_beats_equidistant():
    from dgtpu.basis import lebesgue_function
    x = np.linspace(-1, 1, 500)
    lgl = lebesgue_function(legendre_gauss_lobatto(11), x).max()
    equi = lebesgue_function(np.linspace(-1, 1, 11), x).max()
    assert lgl < 3.5 < equi  # p=10: LGL constant ~2.05, equidistant ~29


def test_quadrature_set_construction():
    qs = QuadratureSet(6, {"u": 6, "p": 5}, {"u": 10, "p": 8})
    assert qs.V_grid_grid.shape == (36, 36)
    assert qs.V_sol_int["u"]["p"].shape == (64, 36)
    assert qs.V_sol_face["imin"]["p"]["u"].shape == (10, 25)
    # V_grid_grid is invertible (LGL nodes unisolvent)
    assert np.linalg.cond(qs.V_grid_grid) < 1e3
