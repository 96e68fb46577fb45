"""Fused Pallas V-cycle (interpret mode on CPU) vs the XLA multigrid path."""

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.ops.pallas_vcycle import PallasVCycle
from dgtpu.ops.smoothers import element_colors
from dgtpu.solvers.multigrid import MultigridSolver


@pytest.fixture(scope="module")
def flagship():
    import __graft_entry__
    return __graft_entry__._flagship(n=8, p_grid=2, p_sol=2)


@pytest.mark.slow
def test_pallas_vcycle_converges_like_xla(flagship):
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    pv = PallasVCycle([l.op for l in dg.levels], dg.transfers,
                      dg.transfer_types, dg.settings, dims,
                      dtype=jnp.float64, interpret=True)
    colors = [element_colors(l.Ni, l.Nj) for l in dg.levels]
    mg = MultigridSolver([l.op for l in dg.levels], dg.transfers,
                         dg.transfer_types, dg.settings, colors=colors)
    rhs = dg.levels[-1].rhs
    A = dg.levels[-1].op
    r0 = float(jnp.linalg.norm(rhs))

    up = jnp.zeros_like(rhs)
    ux = jnp.zeros_like(rhs)
    for _ in range(8):
        up = pv(rhs, up)
        ux = mg.v_cycle(len(dg.levels), rhs, ux)
    rp = float(jnp.linalg.norm(rhs - A.matvec(up))) / r0
    rx = float(jnp.linalg.norm(rhs - A.matvec(ux))) / r0
    assert rp < 1e-6
    assert rp == pytest.approx(rx, rel=0.2)
    assert np.abs(np.asarray(up - ux)).max() < 1e-6


def test_rolled_ops_match_gather(flagship):
    from dgtpu.ops import rolled
    dg = flagship
    lvl = dg.levels[-1]
    op = lvl.op
    Ni, Nj, B = lvl.Ni, lvl.Nj, lvl.N_DOF_sol_tot
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.shape[1]))
    blocks_r = rolled.to_rolled(op, Ni, Nj)
    mv_roll = rolled.matvec(blocks_r, x.reshape(Nj, Ni, B)).reshape(-1)
    mv_gather = op.matvec(x)
    scale = float(jnp.abs(mv_gather).max())
    assert float(jnp.abs(mv_roll - mv_gather).max()) < 1e-13 * scale


def test_color_split_ops_match_masked(flagship):
    """The gather-free color-split layout reproduces the masked rolled ops
    (same math, half the traffic per color pass)."""
    import jax.numpy as jnp
    from dgtpu.ops import rolled

    dg = flagship
    lvl = dg.levels[-1]
    Ni, Nj, B = lvl.Ni, lvl.Nj, lvl.N_DOF_sol_tot
    blocks = rolled.to_rolled(lvl.op, Ni, Nj)
    from dgtpu.ops.linalg import host_inv
    Dinv = host_inv(blocks[:, :, 0])
    masks = rolled.color_masks(Nj, Ni, blocks.dtype)
    even = rolled.parity_mask(Nj, blocks.dtype)
    bc, dc = rolled.pack_operator_colors(blocks, Dinv)

    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((Nj, Ni, B)))
    rhs = jnp.asarray(rng.standard_normal((Nj, Ni, B)))

    # pack/unpack round trip
    u0, u1 = rolled.pack_colors(u, even)
    assert np.allclose(np.asarray(rolled.unpack_colors(u0, u1, even)),
                       np.asarray(u))

    # matvec parity
    r_ref = rolled.matvec(blocks, u)
    r0, r1 = rolled.matvec_split(bc, (u0, u1), even)
    r_split = rolled.unpack_colors(r0, r1, even)
    scale = np.abs(np.asarray(r_ref)).max()
    assert np.abs(np.asarray(r_split - r_ref)).max() < 1e-13 * scale

    # sweep parity (4 color passes)
    u_m = rolled.rb_gs_sweeps_masked(blocks, Dinv, rhs, u, masks, 4)
    rc = rolled.pack_colors(rhs, even)
    s0, s1 = rolled.rb_gs_sweeps_split(bc, dc, rc, (u0, u1), even, 4)
    u_s = rolled.unpack_colors(s0, s1, even)
    scale = np.abs(np.asarray(u_m)).max()
    assert np.abs(np.asarray(u_s - u_m)).max() < 1e-13 * scale
