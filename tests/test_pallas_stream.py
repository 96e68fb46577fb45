"""Streamed-smoother hybrid V-cycle vs the fully-fused SoA cycle.

StreamedVCycle must be numerically identical to SoAVCycle (same red-black
update math, blocks streamed instead of VMEM-resident), including O-grid
periodic wrap and the fused-subtree handoff.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.ops.pallas_soa import SoAVCycle
from dgtpu.ops.pallas_stream import StreamedLevel, StreamedVCycle, \
    _soa2_to_vec, _vec_to_soa2


@pytest.fixture(scope="module")
def flagship():
    import __graft_entry__
    return __graft_entry__._flagship(n=8, p_grid=2, p_sol=2)


def test_streamed_level_matches_soa_smoother(flagship):
    """Streamed half-sweeps == the fused path's _soa_smooth, chunked."""
    dg = flagship
    lvl = dg.levels[-1]
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                   dg.transfer_types, dg.settings, dims,
                   dtype=jnp.float64, interpret=True)
    flat, rebuild = sv._flat_consts()
    consts = rebuild(flat)
    k = len(dims) - 1
    rhs = lvl.rhs
    nj, ni = dims[k]
    B = lvl.op.blocks.shape[-1]
    # force multiple chunks (nh=4, chunk_lanes=8 -> 4 chunks of 8 lanes);
    # resident_budget=0 pins the chunk-streaming kernel (the default would
    # hold this tiny operand VMEM-resident and skip the chunk logic)
    st = StreamedLevel(lvl.op, nj, ni, dtype=jnp.float64, interpret=True,
                       chunk_lanes=8, align=4, resident_budget=0)
    assert st.n_chunks > 1 and not st.sweep_resident
    r01s = _vec_to_soa2(rhs, nj, ni, B)
    u01s = _vec_to_soa2(jnp.ones_like(rhs), nj, ni, B)
    out_stream = st.half_sweeps(4)(r01s, u01s)

    # the VMEM-resident sweep kernel (one operand fetch per application)
    # must be bit-identical to the streamed one
    st_r = StreamedLevel(lvl.op, nj, ni, dtype=jnp.float64, interpret=True,
                         chunk_lanes=8, align=4)
    assert st_r.sweep_resident
    out_res = st_r.half_sweeps(4)(r01s, u01s)
    assert float(jnp.abs(out_res - out_stream).max()) == 0.0
    r01 = sv._to_soa(rhs)
    u01 = sv._to_soa(jnp.ones_like(rhs))
    ref = sv._soa_smooth(k, consts[0][k], (r01[0], r01[1]),
                         (u01[0], u01[1]), 2)
    d0 = float(jnp.abs(out_stream[0] - ref[0]).max())
    d1 = float(jnp.abs(out_stream[1] - ref[1]).max())
    assert max(d0, d1) < 1e-13

    # residual parity
    res = st.residual()(r01s, out_stream)
    rr = sv._soa_residual(k, consts[0][k], (r01[0], r01[1]),
                          (out_stream[0], out_stream[1]))
    assert float(jnp.abs(res[0] - rr[0]).max()) < 1e-12
    assert float(jnp.abs(res[1] - rr[1]).max()) < 1e-12


def test_matvec_color_matches_full_matvec(flagship):
    """matvec_color(c) == matvec()[c] — the color-restricted kernel used
    by the streamed Stokes pressure passes (half the D-block traffic)."""
    dg = flagship
    lvl = dg.levels[-1]
    nj, ni = lvl.Nj, lvl.Ni
    B = lvl.op.blocks.shape[-1]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(nj * ni * B))
    for kw in (dict(), dict(chunk_lanes=8, align=4)):   # single + multi chunk
        st = StreamedLevel(lvl.op, nj, ni, dtype=jnp.float64,
                           interpret=True, **kw)
        x01 = _vec_to_soa2(x, nj, ni, B)
        full = st.matvec()(x01)
        for c in (0, 1):
            only = st.matvec_color(c)(x01)
            assert float(jnp.abs(only - full[c]).max()) < 1e-13, (kw, c)


def test_streamed_vcycle_matches_fused(flagship):
    """Hybrid cycle (streamed top + fused subtree) == fully-fused cycle."""
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    ops = [l.op for l in dg.levels]
    sv = SoAVCycle(ops, dg.transfers, dg.transfer_types, dg.settings,
                   dims, dtype=jnp.float64, interpret=True)
    fused = sv.build_xla()
    # tiny budget: only the coarsest levels fuse, the top level streams
    hv = StreamedVCycle(ops, dg.transfers, dg.transfer_types, dg.settings,
                        dims, dtype=jnp.float64, interpret=True,
                        vmem_budget=2 * 1024 * 1024, chunk_lanes=8)
    assert hv.cut < hv.n_lev
    hybrid = hv.build()
    rhs = dg.levels[-1].rhs
    uf = uh = jnp.zeros_like(rhs)
    for _ in range(3):
        uf = fused(rhs, uf)
        uh = hybrid(rhs, uh)
    scale = float(jnp.abs(uf).max())
    assert float(jnp.abs(uh - uf).max()) / scale < 1e-12
    op = dg.levels[-1].op
    r = float(jnp.linalg.norm(rhs - op.matvec(uh)) / jnp.linalg.norm(rhs))
    assert r < 5e-2


def test_streamed_fmg_guess(flagship):
    """StreamedVCycle.build_fmg: the hybrid FMG guess lands well below the
    zero iterate (fused subtree FMG + one streamed cycle per upper level)."""
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    ops = [l.op for l in dg.levels]
    hv = StreamedVCycle(ops, dg.transfers, dg.transfer_types, dg.settings,
                        dims, dtype=jnp.float64, interpret=True,
                        vmem_budget=2 * 1024 * 1024, chunk_lanes=8)
    assert hv.cut < hv.n_lev
    hv.build()
    fmg = hv.build_fmg()
    rhs = dg.levels[-1].rhs
    u0 = fmg(rhs)
    op = dg.levels[-1].op
    r = float(jnp.linalg.norm(rhs - op.matvec(u0)) / jnp.linalg.norm(rhs))
    assert r < 0.1, f"streamed FMG guess too weak: {r}"


def test_streamed_level_ogrid_periodic():
    """Periodic i-wrap (O-grid) survives chunking."""
    from dgtpu.api import DGFEM
    from dgtpu.settings import Settings, load_params
    params = load_params()
    params["grid"]["filename"] = "CircleInCircle_4X4_nPoly2.xyz"
    params["grid"]["polynomial degree"] = 2
    params["grid"]["O grid"] = True
    params["grid"]["circular"] = True
    params["solution"]["u"]["polynomial degree"] = 2
    params["problem"]["SIP penalty parameter multiplier"] = 2
    params["solver"]["multigrid"]["polynomial coarsening"]["levels"]["u"] = "1,2"
    params["visualization"]["export"] = False
    params["logging"]["loglevel"] = "ERROR"
    s = Settings(params)
    s.solver.method = "multigrid"
    s.update_setting("solver.discretization", "dg")
    dg = DGFEM(settings=s, solve_multigrid=True)
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    sv = SoAVCycle([l.op for l in dg.levels], dg.transfers,
                   dg.transfer_types, dg.settings, dims,
                   dtype=jnp.float64, interpret=True)
    flat, rebuild = sv._flat_consts()
    consts = rebuild(flat)
    k = len(dims) - 1
    lvl = dg.levels[-1]
    st = StreamedLevel(lvl.op, dims[k][0], dims[k][1], dtype=jnp.float64,
                       interpret=True, chunk_lanes=4, align=2,
                       resident_budget=0)
    assert st.periodic and st.n_chunks > 1 and not st.sweep_resident
    rhs = lvl.rhs
    B = lvl.op.blocks.shape[-1]
    r01 = _vec_to_soa2(rhs, dims[k][0], dims[k][1], B)
    u01 = _vec_to_soa2(jnp.zeros_like(rhs), dims[k][0], dims[k][1], B)
    out = st.half_sweeps(4)(r01, u01)
    rs = sv._to_soa(rhs)
    us = sv._to_soa(jnp.zeros_like(rhs))
    ref = sv._soa_smooth(k, consts[0][k], (rs[0], rs[1]), (us[0], us[1]), 2)
    assert float(jnp.abs(out[0] - ref[0]).max()) < 1e-13
    assert float(jnp.abs(out[1] - ref[1]).max()) < 1e-13

    # resident sweep kernel honors the periodic wrap identically
    st_r = StreamedLevel(lvl.op, dims[k][0], dims[k][1], dtype=jnp.float64,
                         interpret=True, chunk_lanes=4, align=2)
    assert st_r.periodic and st_r.sweep_resident
    out_r = st_r.half_sweeps(4)(r01, u01)
    assert float(jnp.abs(out_r - out).max()) == 0.0

    # the color-restricted matvec honors the periodic wrap too
    full = st.matvec()(out)
    for c in (0, 1):
        only = st.matvec_color(c)(out)
        assert float(jnp.abs(only - full[c]).max()) < 1e-13, c
