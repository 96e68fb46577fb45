"""Multi-device sharding: halo-exchange matvec and sharded multigrid (8 CPU devices)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.geometry import Geometry
from dgtpu.level import GridLevel
from dgtpu.mms import ManufacturedSolution
from dgtpu.models.poisson import assemble_poisson
from dgtpu.ops.transfer import make_transfer
from dgtpu.parallel.halo import (ShardedMultigrid, _matvec_with_halo, AXIS,
                                 make_mesh, reshape_level, vec_to_grid)
from tests.conftest import INPUT_DIR

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(base_settings, p_sol=2):
    base_settings.update_setting("grid.polynomial_degree", 1)
    geom = Geometry(os.path.join(INPUT_DIR, "Rectangle_8X8_nPoly1.xyz"),
                    base_settings)
    lvl = GridLevel(geom, base_settings, ["u"], {"u": p_sol})
    mms = ManufacturedSolution({"u": "sin(pi*x)*sin(pi*y)"}, "Poisson", 1.0)
    lvl.op, rhs, _ = assemble_poisson(lvl, mms)
    return lvl, rhs


def test_sharded_matvec_matches_single_device(base_settings):
    from dgtpu.geometry import generate_rectangle_grid, write_plot3d
    path = os.path.join(INPUT_DIR, "Rectangle_8X8_nPoly1.xyz")
    if not os.path.exists(path):
        write_plot3d(path, *generate_rectangle_grid(8, 8, 1))
    lvl, rhs = _setup(base_settings)
    B = lvl.N_DOF_sol_tot
    blocks = reshape_level(lvl.op, lvl.Ni, lvl.Nj)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(lvl.N * B))
    expect = np.asarray(lvl.op.matvec(x))

    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(8)
    fn = shard_map(_matvec_with_halo, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                   out_specs=P(AXIS), check_rep=False)
    with mesh:
        xg = jax.device_put(vec_to_grid(x, lvl.Ni, lvl.Nj, B),
                            NamedSharding(mesh, P(AXIS)))
        bg = jax.device_put(blocks, NamedSharding(mesh, P(AXIS)))
        out = jax.jit(fn)(bg, xg)
    scale = np.abs(expect).max()
    assert np.abs(np.asarray(out).reshape(-1) - expect).max() < 1e-13 * scale


def test_sharded_multigrid_matches_direct(base_settings):
    lvl, rhs = _setup(base_settings)
    coarse = GridLevel(Geometry(os.path.join(INPUT_DIR, "Rectangle_8X8_nPoly1.xyz"),
                                base_settings), base_settings, ["u"], {"u": 1},
                       sigma=4.0)
    coarse.op, _, _ = assemble_poisson(coarse)
    t = make_transfer("polynomial", p_fine=2, p_coarse=1)
    mg = ShardedMultigrid([coarse, lvl], [t], base_settings, mesh=make_mesh(8))
    u, res, n = mg.solve(rhs)
    assert res < 1e-6
    from dgtpu.solvers.direct import solve_direct
    ud = np.asarray(solve_direct(lvl.op, rhs))
    assert np.abs(np.asarray(u) - ud).max() < 1e-4


def test_dryrun_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
