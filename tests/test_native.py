"""Native C++ kernels vs the XLA/scan and numpy-oracle paths."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.geometry import Geometry
from dgtpu.level import GridLevel
from dgtpu.mms import ManufacturedSolution
from dgtpu.models.poisson import assemble_poisson
from dgtpu.ops.smoothers import block_gauss_seidel, block_jacobi
from tests.conftest import INPUT_DIR

native = pytest.importorskip("dgtpu.native")
if native.load() is None:
    pytest.skip("no native toolchain", allow_module_level=True)


@pytest.fixture(scope="module")
def system(base_settings_module):
    s = base_settings_module
    s.update_setting("grid.polynomial_degree", 1)
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_4X4_nPoly1.xyz"), s)
    lvl = GridLevel(geom, s, ["u"], {"u": 2})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    op, rhs, _ = assemble_poisson(lvl, mms)
    return op, rhs


@pytest.fixture(scope="module")
def base_settings_module():
    from dgtpu.settings import Settings, load_params
    s = Settings(load_params())
    s.update_setting("logging.loglevel", "WARNING")
    return s


def test_native_matvec(system):
    op, rhs = system
    ns = native.NativeStencil(op)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(op.shape[1])
    ref = np.asarray(op.matvec(jnp.asarray(x)))
    assert np.abs(ns.matvec(x) - ref).max() < 1e-12 * np.abs(ref).max()


def test_native_gs_matches_scan(system):
    op, rhs = system
    ns = native.NativeStencil(op)
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(op.shape[1])
    x_native = ns.gauss_seidel(np.asarray(rhs), x0, "symmetric", iterations=2)
    x_scan = np.asarray(block_gauss_seidel(op, rhs, jnp.asarray(x0),
                                           direction="symmetric", iterations=2))
    assert np.abs(x_native - x_scan).max() < 1e-11


def test_native_jacobi_matches_batched(system):
    op, rhs = system
    ns = native.NativeStencil(op)
    x0 = np.zeros(op.shape[1])
    x_native = ns.jacobi(np.asarray(rhs), x0, iterations=3, omega=0.8)
    x_jax = np.asarray(block_jacobi(op, rhs, jnp.asarray(x0),
                                    omega=0.8, iterations=3))
    assert np.abs(x_native - x_jax).max() < 1e-11
