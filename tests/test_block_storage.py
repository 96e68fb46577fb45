"""bf16 sweep-block storage (performance.block_storage: bfloat16).

The streamed hybrid's half-sweep operand may be stored in bfloat16 and
upconverted in-register (``ops/pallas_stream.StreamedLevel``).  Residuals
and transfers stay f32, so the narrowed smoother perturbs the iteration
but not what a defect-driven sweep converges toward; these tests pin that
the wiring reaches the kernels and that contraction survives.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dgtpu.ops.pallas_stream import StreamedLevel, StreamedVCycle, \
    _vec_to_soa2


@pytest.fixture(scope="module")
def flagship():
    import __graft_entry__
    return __graft_entry__._flagship(n=8, p_grid=2, p_sol=2)


def test_bf16_half_sweeps_approximate_f32(flagship):
    dg = flagship
    lvl = dg.levels[-1]
    nj, ni = lvl.Nj, lvl.Ni
    B = lvl.op.blocks.shape[-1]
    kw = dict(dtype=jnp.float32, interpret=True, chunk_lanes=8, align=4)
    st32 = StreamedLevel(lvl.op, nj, ni, **kw)
    st16 = StreamedLevel(lvl.op, nj, ni, block_storage="bfloat16", **kw)
    assert st16.A_sweep.dtype == jnp.bfloat16
    assert st16.A_res.dtype == jnp.float32          # residuals stay f32
    rhs = jnp.asarray(np.asarray(lvl.rhs), jnp.float32)
    r01 = _vec_to_soa2(rhs, nj, ni, B)
    u01 = jnp.zeros_like(r01)
    out32 = st32.half_sweeps(4)(r01, u01)
    out16 = st16.half_sweeps(4)(r01, u01)
    scale = float(jnp.abs(out32).max())
    rel = float(jnp.abs(out16 - out32).max()) / scale
    assert 0 < rel < 0.05        # bf16 blocks: ~2-3 digit smoother, not equal


def test_bf16_streamed_hybrid_contracts(flagship):
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    ops = [l.op for l in dg.levels]

    def residual_after(cycles, block_storage):
        hv = StreamedVCycle(ops, dg.transfers, dg.transfer_types,
                            dg.settings, dims, dtype=jnp.float32,
                            interpret=True, vmem_budget=2 * 1024 * 1024,
                            chunk_lanes=8, block_storage=block_storage)
        assert hv.cut < hv.n_lev
        one = hv.build()
        rhs = jnp.asarray(np.asarray(dg.levels[-1].rhs), jnp.float32)
        u = jnp.zeros_like(rhs)
        for _ in range(cycles):
            u = one(rhs, u)
        op = dg.levels[-1].op
        r = np.asarray(dg.levels[-1].rhs) - np.asarray(
            op.matvec(jnp.asarray(np.asarray(u))))
        return float(np.linalg.norm(r) / np.linalg.norm(
            np.asarray(dg.levels[-1].rhs)))

    # bf16 runs the smoother in DEFECT form (pallas_stream._smooth), so the
    # cycle's fixed point is the f32 one and contraction stays at the f32
    # rate (direct-form bf16 was measured stalling at ~5e-2 on this exact
    # configuration — the regression this test pins against)
    r16 = residual_after(5, "bfloat16")
    r32 = residual_after(5, "float32")
    assert r16 < 1e-3                      # contracting like a V-cycle
    assert r16 < 10 * max(r32, 1e-7)       # and near the f32 rate


def test_bf16_plumbs_through_stokes_stream():
    """StreamedStokesVCycle narrows only the velocity sweep operand."""
    import os

    from dgtpu.geometry import Geometry
    from dgtpu.level import GridLevel
    from dgtpu.mms import ManufacturedSolution
    from dgtpu.models.stokes import assemble_stokes
    from dgtpu.ops.pallas_stokes_stream import StreamedStokesLevel
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
    assemble_stokes(lvl, mms)
    st = StreamedStokesLevel(lvl, dtype=jnp.float32, interpret=True,
                             block_storage="bfloat16")
    assert st.A_s.A_sweep.dtype == jnp.bfloat16
    assert st.A_s.A_res.dtype == jnp.float32
    assert st.G_s.A_sweep is None and st.D_s.A_sweep is None


def test_bf16_res_storage_contracts_to_preconditioner_quality(flagship):
    """res_storage='bfloat16' (the all-bf16 streamed variant) narrows the
    residual/matvec operand too: the cycle's fixed point is perturbed
    ~kappa*2^-8 so it cannot reach f32 floors, but it must still contract
    well past 1e-2 in 5 cycles — its role is the inner preconditioner of
    the mixed-precision refinement."""
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    ops = [l.op for l in dg.levels]
    hv = StreamedVCycle(ops, dg.transfers, dg.transfer_types, dg.settings,
                        dims, dtype=jnp.float32, interpret=True,
                        vmem_budget=2 * 1024 * 1024, chunk_lanes=8,
                        block_storage="bfloat16", res_storage="bfloat16")
    assert hv.streams[hv.n_lev - 1].A_res.dtype == jnp.bfloat16
    one = hv.build()
    rhs = jnp.asarray(np.asarray(dg.levels[-1].rhs), jnp.float32)
    u = jnp.zeros_like(rhs)
    for _ in range(5):
        u = one(rhs, u)
    op = dg.levels[-1].op
    r5 = float(jnp.linalg.norm(rhs - op.matvec(u).astype(jnp.float32))
               / jnp.linalg.norm(rhs))
    # measured stall ~1.7e-2: the bf16 residual perturbs every level's
    # coarse correction, flooring the cycle 3 orders above the f32 paths
    # — which is why bench.py does NOT offer this variant (as the refined
    # inner preconditioner it would cost more outer rounds than the
    # traffic cut saves); the capability stays for explicit opt-in
    assert r5 < 5e-2, r5


def test_streamed_hbm_bytes_model(flagship):
    """hbm_bytes_per_cycle: positive, storage-dtype aware, and
    resident-mode aware (one operand fetch per application instead of one
    per half-sweep)."""
    dg = flagship
    dims = [(l.Nj, l.Ni) for l in dg.levels]
    ops = [l.op for l in dg.levels]

    def make(resident_budget=0, **kw):
        return StreamedVCycle(ops, dg.transfers, dg.transfer_types,
                              dg.settings, dims, dtype=jnp.float32,
                              interpret=True,
                              vmem_budget=2 * 1024 * 1024, chunk_lanes=8,
                              resident_budget=resident_budget, **kw)

    # streaming regime (resident off): every half-sweep re-reads blocks
    b_f32 = make().hbm_bytes_per_cycle()
    b_bf16 = make(block_storage="bfloat16").hbm_bytes_per_cycle()
    b_all = make(block_storage="bfloat16",
                 res_storage="bfloat16").hbm_bytes_per_cycle()
    assert 0 < b_all < b_f32
    # bf16 defect form trades narrower sweeps for EXTRA f32 residual
    # streams, so it is below f32 but above the all-bf16 variant
    assert b_all < b_bf16 < b_f32
    # each half-sweep re-reads one color's blocks: total must exceed one
    # full read of the finest level's sweep operand
    s = make().streams[len(dims) - 1]
    assert b_f32 > s.A_sweep.nbytes

    # resident regime: the sweep operand is fetched once per application,
    # so the accounted traffic drops strictly below the streamed figure
    hv_r = make(resident_budget=80 * 1024 * 1024)
    assert all(s.sweep_resident for s in hv_r.streams.values())
    b_res = hv_r.hbm_bytes_per_cycle()
    assert 0 < b_res < b_f32
    hv_r16 = make(resident_budget=80 * 1024 * 1024,
                  block_storage="bfloat16")
    assert 0 < hv_r16.hbm_bytes_per_cycle() < b_bf16
