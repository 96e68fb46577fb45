"""HBM-streamed SoA smoother/residual kernels + the hybrid V-cycle.

The fused V-cycles (``ops/pallas_soa.py``) keep every operator VMEM-resident
— impossible beyond ~32x32 elements at p=5.  At larger sizes the *vectors*
are still tiny (u at 64x64 p=5 is 0.6 MB) while the *blocks* are tens of
MB, so this module streams the blocks: a ``pallas_call`` whose grid runs
``(half_sweep, chunk)`` sequentially (TPU grids execute in order on one
core), keeping the state vector in a revisited VMEM output while Mosaic's
pipeline machinery double-buffers the per-chunk block DMA.  One kernel
launch therefore runs ALL red-black half-sweeps of a smoother application
at streaming bandwidth — the update math is bit-identical to
``pallas_soa._soa_smooth``.

``StreamedVCycle`` composes this into a full cycle for big grids: the
coarse sub-hierarchy that fits VMEM runs as one fused ``SoAVCycle``
kernel, levels above it smooth with streamed kernels, and transfers run
as XLA tile reshapes (the dense lane-tensor transfers of the fused path
scale O(N^2) and stop at 32x32).

V-cycle semantics mirror ``dgfem/solver.py:141-207``; streaming structure
is TPU-native with no reference counterpart.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dgtpu.utils.jitting import const_jit
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgtpu.ops import rolled
from dgtpu.ops.pallas_soa import _mac


def _pick_chunk(C, nh, target_lanes=512, align=128):
    """Chunk size for streaming: a multiple of lcm(nh, align) dividing C.

    Mosaic requires lane-dimension vector stores to be 128-aligned, so
    multi-chunk streaming needs chunk boundaries (and the halo pad) at
    128-lane multiples (``align=128`` on hardware; interpret-mode tests
    may lower it to exercise the multi-chunk logic on tiny grids).  When
    no such chunk exists the level runs as a single chunk (no padding,
    roll-based neighbor access).
    """
    step = nh * align // np.gcd(nh, align)      # lcm(nh, align)
    best = C                                    # single-chunk fallback
    k = 1
    while k * step <= min(C, target_lanes):
        if C % (k * step) == 0:
            best = k * step
        k += 1
    return best


class StreamedLevel:
    """Streamed smoother/matvec/residual for one stencil in the SoA layout.

    Host-side state, two 5-slot operands so every streamed byte is used:

    * ``A_res``  (2, 5, B_src, B_dst, C): [diag, iL, iR, jL, jR] — the
      residual/matvec operand.
    * ``A_sweep`` (2, 5, B, B, C): [Dinv, iL, iR, jL, jR] — the half-sweep
      operand (square blocks only).  With ``block_storage='bfloat16'`` it
      is stored in bf16 and upconverted in-register per MAC: the smoother
      is a preconditioner, so narrowing its blocks perturbs the iteration
      but leaves residuals/transfers (and hence what the cycle converges
      toward) in full f32 — and cuts the sweep-dominated HBM traffic ~40%
      (bf16 tiles pad (36->48) sublanes vs f32's (36->40), so the byte
      ratio is 0.6, not 0.5).

    Rectangular stencils (the Stokes G/D components) carry no sweep
    operand and only support ``matvec``.
    """

    def __init__(self, op, nj, ni, dtype=jnp.float32, interpret=False,
                 chunk_lanes=512, align=128, with_dinv=None,
                 block_storage=None, res_storage=None,
                 resident_budget=80 * 1024 * 1024):
        from dgtpu.ops.linalg import host_inv
        if ni % 2:
            raise ValueError("StreamedLevel needs an even Ni")
        self.nj, self.ni = nj, ni
        self.nh = nh = ni // 2
        self.C = C = nj * nh
        self.dtype = dtype
        self.interpret = interpret
        rb = rolled.to_rolled(op, ni, nj)
        br, bc = rb.shape[-2], rb.shape[-1]     # block (rows=dst, cols=src)
        self.B_dst, self.B_src = br, bc
        self.B = bc                             # legacy name (square case)
        if with_dinv is None:
            with_dinv = br == bc
        if with_dinv and br != bc:
            raise ValueError("a diagonal inverse needs square blocks")
        self.with_dinv = with_dinv
        S = 6 if with_dinv else 5
        if with_dinv:
            dinv = host_inv(rb[:, :, 0])
            pair_b, pair_d = rolled.pack_operator_colors(
                np.asarray(rb), np.asarray(dinv))
        else:
            pair_b, pair_d = rolled.pack_operator_colors(np.asarray(rb))
        A_all = np.zeros((2, S, bc, br, C), np.float64)
        for c in range(2):
            x = np.asarray(pair_b[c])                      # (nj, nh, 5, a, b)
            A_all[c, :5] = (np.transpose(x, (2, 4, 3, 0, 1))
                            .reshape(5, bc, br, C))
            if with_dinv:
                d = np.asarray(pair_d[c])                  # (nj, nh, a, b)
                A_all[c, 5] = (np.transpose(d, (3, 2, 0, 1))
                               .reshape(br, br, C))
        self.A_res = jnp.asarray(A_all[:, :5].astype(np.dtype(dtype)))
        # res_storage='bfloat16': narrow the residual/matvec operand too.
        # Unlike the sweep operand this perturbs the cycle's fixed point
        # (the restriction residual drives the coarse correction), so the
        # stand-alone cycle stalls near kappa * 2^-8 relative — use ONLY
        # where the cycle is a preconditioner inside an outer f64/df32
        # defect loop (mixed refinement), where it just trades a slightly
        # weaker inner contraction for ~40% less residual-stream traffic.
        if (res_storage in ("bfloat16", "bf16") and dtype == jnp.float32):
            self.A_res = self.A_res.astype(jnp.bfloat16)
        if with_dinv:
            sweep = np.concatenate([A_all[:, 5:6], A_all[:, 1:5]], axis=1)
            self.A_sweep = jnp.asarray(sweep.astype(np.dtype(dtype)))
            if (block_storage in ("bfloat16", "bf16")
                    and dtype == jnp.float32):
                self.A_sweep = self.A_sweep.astype(jnp.bfloat16)
        else:
            self.A_sweep = None
        lanes_j = np.repeat(np.arange(nj), nh)
        lanes_ip = np.tile(np.arange(nh), nj)
        m = np.stack([lanes_j % 2 == 0, lanes_ip == 0, lanes_ip == nh - 1])
        self.masks = jnp.asarray(m.astype(np.dtype(dtype))[:, None, :])
        nbr = np.asarray(op.nbr)
        msk = np.asarray(op.mask)
        self.periodic = bool(ni > 1 and msk[0, 1] and nbr[0, 1] == ni - 1)
        self.Lc = _pick_chunk(C, nh, chunk_lanes, align)
        self.n_chunks = C // self.Lc
        # halo pad: 0 for the single-chunk (roll-based) path; otherwise the
        # smallest align-multiple >= nh so every store/load offset is
        # 128-lane aligned (a Mosaic requirement for lane-dim vector stores)
        self.ph = 0 if self.n_chunks == 1 else \
            ((nh + align - 1) // align) * align
        # VMEM-resident sweep operand: when BOTH colors' padded sweep
        # blocks fit ``resident_budget``, the half-sweep kernel takes the
        # operand as one un-gridded VMEM input — fetched from HBM ONCE per
        # pallas_call instead of once per half-sweep.  An n-half-sweep
        # application's operator traffic drops n-fold (the r4 64x64
        # measurement: the streamed hybrid already ran at ~95% of the HBM
        # roofline, so the remaining win is moving fewer bytes, not
        # prefetching them sooner).  bf16 sweep storage is what makes the
        # 64x64 p=5 operand fit (70.8 MB padded vs 141.6 f32).
        self.sweep_resident = (
            self.A_sweep is not None
            and self._sweep_operand_bytes() <= resident_budget)

    def _sweep_operand_bytes(self):
        """Padded HBM/VMEM footprint of the full (2-color) sweep operand."""
        if self.A_sweep is None:
            return 0
        it = self.A_sweep.dtype.itemsize
        tile = 16 if it == 2 else 8
        pad_br = ((self.B_dst + tile - 1) // tile) * tile
        return it * 2 * 5 * self.B_src * pad_br * self.C

    def to_device(self, device):
        self.A_res = jax.device_put(self.A_res, device)
        if self.A_sweep is not None:
            self.A_sweep = jax.device_put(self.A_sweep, device)
        self.masks = jax.device_put(self.masks, device)
        return self

    # -- shared in-kernel math ------------------------------------------------
    #
    # Multi-chunk path: state lattices carry a ph-lane ZERO halo on both
    # ends (ph = 128-aligned >= nh), chunk lanes live at padded offset
    # ph + i*Lc.  Window loads and chunk stores then sit on 128-lane
    # boundaries (Mosaic's alignment requirement); the +/-nh j-neighbor
    # shifts are lane ROTATES of the window followed by an aligned static
    # slice.  The zero halo is exactly the zero-shift convention of
    # pallas_soa (boundary rows hit zero blocks anyway).  i-neighbors are
    # within-chunk rolls (chunks are row-aligned, so rows never straddle a
    # chunk edge).  Single-chunk path: no padding, whole-lattice rolls —
    # identical to the fused kernel's neighbor access.

    def _chunk_fields(self, state_ref, other, start, mask_chunk,
                      single=None):
        """(center, roll+, roll-, jL, jR, even-mask) for the chunk at
        lane offset ``start`` (int32 tracer) of color ``other``.

        ``single=True`` forces the whole-lattice (unpadded, roll-based)
        path regardless of ``n_chunks`` — the resident-sweep kernel keeps
        its state unchunked even when the residual/matvec kernels of the
        same level stream in chunks."""
        nh, Lc, ph = self.nh, self.Lc, self.ph
        me, mrs, mre = mask_chunk[0], mask_chunk[1], mask_chunk[2]
        if single is None:
            single = self.n_chunks == 1
        if single:
            o = state_ref[other]
            jL = jnp.roll(o, nh, axis=1)
            jR = jnp.roll(o, -nh, axis=1)
        else:
            win = state_ref[other, :, pl.dslice(start, Lc + 2 * ph)]
            o = win[:, ph:ph + Lc]
            jL = jnp.roll(win, nh, axis=1)[:, ph:ph + Lc]
            jR = jnp.roll(win, -nh, axis=1)[:, ph:ph + Lc]
        roll_p = jnp.roll(o, 1, axis=1)
        roll_m = jnp.roll(o, -1, axis=1)
        if self.periodic:
            roll_p = (1.0 - mrs) * roll_p + mrs * jnp.roll(o, 1 - nh, axis=1)
            roll_m = (1.0 - mre) * roll_m + mre * jnp.roll(o, nh - 1, axis=1)
        return o, roll_p, roll_m, jL, jR, me

    def _fields_for_color(self, c_is0, o, roll_p, roll_m, jL, jR, me):
        """Color-dependent i-neighbor blend (pallas_soa._nbr_fields)."""
        iL0 = me * roll_p + (1.0 - me) * o
        iR0 = me * o + (1.0 - me) * roll_m
        iL1 = me * o + (1.0 - me) * roll_p
        iR1 = me * roll_m + (1.0 - me) * o
        iL = jnp.where(c_is0, iL0, iL1)
        iR = jnp.where(c_is0, iR0, iR1)
        return iL, iR, jL, jR

    # -- kernels --------------------------------------------------------------

    def _pad(self, s01):
        if self.ph == 0:
            return s01
        return jnp.pad(s01, ((0, 0), (0, 0), (self.ph, self.ph)))

    def half_sweeps(self, n_half):
        """Build fn(rhs01, u01) running n_half red-black half-sweeps.

        rhs01/u01: (2, B, C) stacked color lattices.  One pallas_call.
        Two DMA regimes, identical math:

        * resident (``sweep_resident``): the whole 2-color sweep operand
          is an un-gridded VMEM input — one HBM fetch per *application*,
          state kept whole-lattice (roll-based neighbors); grid
          (n_half/2, color).
        * streamed: grid (n_half/2, color, chunk); each half-sweep
          re-streams its color's blocks chunk by chunk (operands beyond
          the VMEM budget).
        """
        assert self.with_dinv, "half_sweeps needs the diagonal inverse slot"
        B, C, Lc, nh = self.B, self.C, self.Lc, self.nh
        n_chunks = self.n_chunks
        resident = self.sweep_resident

        def kernel(rhs_ref, u_ref, mask_ref, A_ref, state_ref):
            # grid (n_pass, color[, chunk]): color as its own grid dim
            # keeps every BlockSpec index_map a plain identity (a computed
            # rem index lowered as an s64 scalar operand the X64-rewrite
            # pass cannot handle)
            h = pl.program_id(0)
            c = pl.program_id(1)
            if resident:
                i = None
                start = jnp.int32(0)
                first = (h == 0) & (c == 0)
            else:
                i = pl.program_id(2)
                # all lane-offset arithmetic in int32 (Mosaic rejects int64)
                start = i * jnp.int32(Lc)
                first = (h == 0) & (c == 0) & (i == 0)

            @pl.when(first)
            def _init():
                state_ref[...] = u_ref[...]

            single = resident or n_chunks == 1
            # single path: static full slices — the dynamic-offset form
            # would need Mosaic to prove i*Lc = 0 (mod 128), which it
            # cannot when Lc is unaligned (tiny grids; the smoke gate's
            # 4x4 hierarchy caught this)
            if single:
                mask_chunk = mask_ref[...]
            else:
                mask_chunk = mask_ref[:, :, pl.dslice(start, Lc)]
            fields = self._chunk_fields(state_ref, jnp.int32(1) - c,
                                        start, mask_chunk, single=single)
            iL, iR, jL, jR = self._fields_for_color(c == 0, *fields)
            # sweep-operand slot order [Dinv, iL, iR, jL, jR]; _mac
            # upconverts bf16-stored blocks to the f32 state in-register.
            # resident: dynamic color index into the full VMEM operand
            # (same mechanism as state_ref[other]); streamed: the color's
            # blocks arrive as this grid step's (1, 5, B, B, Lc) block.
            A = A_ref[c] if resident else A_ref[0]
            off = (_mac(A[1], iL) + _mac(A[2], iR)
                   + _mac(A[3], jL) + _mac(A[4], jR))
            rhs_c = rhs_ref[c] if single \
                else rhs_ref[c, :, pl.dslice(start, Lc)]
            unew = _mac(A[0], rhs_c - off)
            if single:
                state_ref[c] = unew
            else:
                state_ref[c, :, pl.dslice(jnp.int32(self.ph) + start, Lc)] = unew

        assert n_half % 2 == 0, "half-sweeps come in red/black pairs"
        vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
        ph = 0 if resident else self.ph
        if resident:
            grid = (n_half // 2, 2)
            a_spec = vfull                     # one fetch per application
            out_spec = pl.BlockSpec((2, B, C), lambda h, c: (0, 0, 0))
        else:
            grid = (n_half // 2, 2, n_chunks)
            a_spec = pl.BlockSpec((1, 5, B, B, Lc),
                                  lambda h, c, i: (c, 0, 0, 0, i))
            out_spec = pl.BlockSpec((2, B, C + 2 * ph),
                                    lambda h, c, i: (0, 0, 0))
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                vfull,                                     # rhs (2, B, C)
                vfull,                                     # u0 padded
                vfull,                                     # masks (3, 1, C)
                a_spec,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((2, B, C + 2 * ph),
                                           self.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def fn(rhs01, u01):
            # trace the gridded pallas_call with x64 disabled on the f32
            # hardware path: under jax_enable_x64 the TPU lowering injects
            # an s64 scalar operand that XLA's X64-rewriting pass cannot
            # handle.  The f64 interpret/test path keeps x64 on.
            u_in = u01 if resident else self._pad(u01)
            if self.dtype == jnp.float32:
                with jax.enable_x64(False):
                    out = call(rhs01, u_in, self.masks, self.A_sweep)
            else:
                out = call(rhs01, u_in, self.masks, self.A_sweep)
            return out if resident else out[:, :, self.ph:self.ph + C]

        return fn

    def residual(self):
        """Build fn(rhs01, u01) -> r01, streaming both colors' blocks once."""
        Bs, Bd = self.B_src, self.B_dst
        C, Lc, nh = self.C, self.Lc, self.nh
        n_chunks = self.n_chunks

        def kernel(rhs_ref, u_ref, mask_ref, A_ref, out_ref):
            c = pl.program_id(0)
            i = pl.program_id(1)
            start = i * jnp.int32(Lc)
            if n_chunks == 1:   # static slices (see half_sweeps)
                mask_chunk = mask_ref[...]
            else:
                mask_chunk = mask_ref[:, :, pl.dslice(start, Lc)]
            fields = self._chunk_fields(u_ref, jnp.int32(1) - c,
                                        start, mask_chunk)
            iL, iR, jL, jR = self._fields_for_color(c == 0, *fields)
            if self.n_chunks == 1:
                u_c = u_ref[c]
            else:
                u_c = u_ref[c, :, pl.dslice(jnp.int32(self.ph) + start, Lc)]
            au = (_mac(A_ref[0, 0], u_c)
                  + _mac(A_ref[0, 1], iL) + _mac(A_ref[0, 2], iR)
                  + _mac(A_ref[0, 3], jL) + _mac(A_ref[0, 4], jR))
            rhs_c = rhs_ref[c] if n_chunks == 1 \
                else rhs_ref[c, :, pl.dslice(start, Lc)]
            out_ref[...] = (rhs_c - au)[None]

        vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(2, n_chunks),
            in_specs=[
                vfull, vfull, vfull,
                # block covers slots 0..4 only: the diagonal-inverse slot
                # (S=6 operators) is never read here, so excluding it from
                # the block shape cuts 1/6 of the streamed traffic free
                pl.BlockSpec((1, 5, Bs, Bd, Lc),
                             lambda c, i: (c, 0, 0, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, Bd, Lc), lambda c, i: (c, 0, i)),
            out_shape=jax.ShapeDtypeStruct((2, Bd, C), self.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def fn(rhs01, u01):
            if self.dtype == jnp.float32:
                with jax.enable_x64(False):
                    return call(rhs01, self._pad(u01), self.masks,
                                self.A_res)
            return call(rhs01, self._pad(u01), self.masks, self.A_res)

        return fn

    def matvec(self):
        """Build fn(x01) -> A @ x01, streaming both colors' blocks once.

        x01: (2, B_src, C) stacked color lattices; result (2, B_dst, C).
        The general streamed stencil application — rectangular blocks
        (the Stokes G/D components) stream through the same grid.
        """
        Bs, Bd = self.B_src, self.B_dst
        C, Lc, nh = self.C, self.Lc, self.nh
        n_chunks = self.n_chunks

        def kernel(x_ref, mask_ref, A_ref, out_ref):
            c = pl.program_id(0)
            i = pl.program_id(1)
            start = i * jnp.int32(Lc)
            if n_chunks == 1:   # static slices (see half_sweeps)
                mask_chunk = mask_ref[...]
            else:
                mask_chunk = mask_ref[:, :, pl.dslice(start, Lc)]
            fields = self._chunk_fields(x_ref, jnp.int32(1) - c,
                                        start, mask_chunk)
            iL, iR, jL, jR = self._fields_for_color(c == 0, *fields)
            if self.n_chunks == 1:
                x_c = x_ref[c]
            else:
                x_c = x_ref[c, :, pl.dslice(jnp.int32(self.ph) + start, Lc)]
            au = (_mac(A_ref[0, 0], x_c)
                  + _mac(A_ref[0, 1], iL) + _mac(A_ref[0, 2], iR)
                  + _mac(A_ref[0, 3], jL) + _mac(A_ref[0, 4], jR))
            out_ref[...] = au[None]

        vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(2, n_chunks),
            in_specs=[
                vfull, vfull,
                # slots 0..4 only (see residual): skip the Dinv slot's DMA
                pl.BlockSpec((1, 5, Bs, Bd, Lc),
                             lambda c, i: (c, 0, 0, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, Bd, Lc), lambda c, i: (c, 0, i)),
            out_shape=jax.ShapeDtypeStruct((2, Bd, C), self.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def fn(x01):
            if self.dtype == jnp.float32:
                with jax.enable_x64(False):
                    return call(self._pad(x01), self.masks, self.A_res)
            return call(self._pad(x01), self.masks, self.A_res)

        return fn

    def matvec_color(self, color):
        """Build fn(x01) -> (A @ x01)[color], streaming ONLY that color's
        blocks — half the operator traffic of ``matvec``.

        For consumers that use a single output color per pass (the
        composed DG matvec inside the streamed distributive-GS pressure
        solve applies D to one color's rows per half-pass): the input
        still carries both color lattices (the stencil's off-diagonal
        neighbors live on the opposite color), but the other color's
        blocks are never DMA'd.  ``color`` is static (the BlockSpec
        index map must select the streamed blocks at trace time).
        """
        Bs, Bd = self.B_src, self.B_dst
        C, Lc = self.C, self.Lc
        n_chunks = self.n_chunks
        color = int(color)

        def kernel(x_ref, mask_ref, A_ref, out_ref):
            i = pl.program_id(0)
            start = i * jnp.int32(Lc)
            if n_chunks == 1:   # static slices (see half_sweeps)
                mask_chunk = mask_ref[...]
            else:
                mask_chunk = mask_ref[:, :, pl.dslice(start, Lc)]
            fields = self._chunk_fields(x_ref, 1 - color, start, mask_chunk)
            iL, iR, jL, jR = self._fields_for_color(color == 0, *fields)
            if self.n_chunks == 1:
                x_c = x_ref[color]
            else:
                x_c = x_ref[color, :,
                            pl.dslice(jnp.int32(self.ph) + start, Lc)]
            au = (_mac(A_ref[0, 0], x_c)
                  + _mac(A_ref[0, 1], iL) + _mac(A_ref[0, 2], iR)
                  + _mac(A_ref[0, 3], jL) + _mac(A_ref[0, 4], jR))
            out_ref[...] = au

        vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            in_specs=[
                vfull, vfull,
                pl.BlockSpec((1, 5, Bs, Bd, Lc),
                             lambda i: (color, 0, 0, 0, i)),
            ],
            out_specs=pl.BlockSpec((Bd, Lc), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((Bd, C), self.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def fn(x01):
            if self.dtype == jnp.float32:
                with jax.enable_x64(False):
                    return call(self._pad(x01), self.masks, self.A_res)
            return call(self._pad(x01), self.masks, self.A_res)

        return fn


def _vec_to_soa2(v, nj, ni, B):
    """(N*B,) -> (2, B, C) stacked color lattices."""
    nh = ni // 2
    ev = rolled.parity_mask(nj, v.dtype)
    u0, u1 = rolled.pack_colors(v.reshape(nj, ni, B), ev)
    return jnp.stack([u0.reshape(nj * nh, B).T, u1.reshape(nj * nh, B).T])


def _soa2_to_vec(s, nj, ni, B):
    nh = ni // 2
    ev = rolled.parity_mask(nj, s.dtype)
    a = s[0].T.reshape(nj, nh, B)
    b = s[1].T.reshape(nj, nh, B)
    return rolled.unpack_colors(a, b, ev).reshape(-1)


class StreamedVCycle:
    """Hybrid V-cycle for grids beyond VMEM residency.

    Levels whose fused-hierarchy footprint fits ``vmem_budget`` run as one
    fused SoAVCycle kernel (the coarse sub-hierarchy); levels above it
    smooth/residual with streamed kernels and transfer via XLA tile
    reshapes.  Interface matches SoAVCycle.build(): one_cycle(rhs, u).
    """

    def __init__(self, ops, transfers, types, settings, dims,
                 dtype=jnp.float32, interpret=False,
                 vmem_budget=96 * 1024 * 1024, chunk_lanes=512,
                 block_storage=None, res_storage=None,
                 resident_budget=80 * 1024 * 1024):
        from dgtpu.ops.pallas_soa import SoAVCycle
        if block_storage is None:
            block_storage = str(getattr(getattr(settings, "performance", None),
                                        "block_storage", "float32"))
        self.block_storage = block_storage
        self.res_storage = res_storage
        self.dtype = dtype
        self.dims = list(dims)
        self.transfers = transfers
        self.types = types
        self.n_lev = len(ops)
        self.cycle_type = str(getattr(settings.solver.multigrid,
                                      "cycle_type", "V")).upper()
        if self.cycle_type not in ("V", "W"):
            # F-cycles (and anything else) run on the generic XLA path
            # (solvers/multigrid.py) -- error early instead of silently
            # degrading to V
            raise NotImplementedError(
                f"the streamed hybrid implements V and W, not "
                f"{self.cycle_type!r}")
        # fused-subtree cut: the deepest prefix of levels whose padded SoA
        # footprint — blocks, Dinv, masks, the O(cells^2) geometric
        # transfer tensors and the dense coarse inverse — fits the budget.
        # The estimate is SoAVCycle's own (the single source of truth with
        # the builder), so the cut can never admit a subtree the fused
        # kernel could not actually hold.
        cut = 0
        for k in range(1, self.n_lev):      # always stream the finest level
            est = SoAVCycle.estimated_vmem_bytes(
                ops[:k], dims[:k], transfers[:k - 1], dtype=dtype)
            if est > vmem_budget:
                break
            cut = k
        if cut < 1:
            raise ValueError("even the coarsest level exceeds the VMEM budget")
        self.cut = cut
        self.sub = SoAVCycle(ops[:cut], transfers[:cut - 1], types[:cut - 1],
                             settings, dims[:cut], dtype=dtype,
                             interpret=interpret)
        self.streams = {}
        for k in range(cut, self.n_lev):
            nj, ni = dims[k]
            self.streams[k] = StreamedLevel(ops[k], nj, ni, dtype=dtype,
                                            interpret=interpret,
                                            chunk_lanes=chunk_lanes,
                                            block_storage=block_storage,
                                            res_storage=res_storage,
                                            resident_budget=resident_budget)
        self._cfg = {}
        for t in set(types):
            node = getattr(settings.solver.multigrid, f"{t}_coarsening")
            self._cfg[t] = (int(node.pre_smoother.iterations),
                            int(node.post_smoother.iterations))
        # geometric tile transfer matrices (XLA path, PallasVCycle layout)
        self.R, self.P = [], []
        for t in transfers:
            if t.kind == "geometric":
                B = t.R.shape[1] // 4
                self.R.append(jnp.stack(
                    [t.R[:, k * B:(k + 1) * B] for k in range(4)]).astype(dtype))
                self.P.append(jnp.stack(
                    [t.P[k * B:(k + 1) * B, :] for k in range(4)]).astype(dtype))
            else:
                self.R.append(t.R.astype(dtype))
                self.P.append(t.P.astype(dtype))
        self._kern = {}

    def to_device(self, device):
        self.sub.to_device(device)
        for s in self.streams.values():
            s.to_device(device)
        self.R = [jax.device_put(r, device) for r in self.R]
        self.P = [jax.device_put(p, device) for p in self.P]
        return self

    def _restrict(self, k, r):
        from dgtpu.ops.pallas_vcycle import _tile_restrict
        t = self.transfers[k]
        nj_c, ni_c = self.dims[k]
        if t.kind == "penalty":
            return r
        B = r.shape[-1] if r.ndim == 3 else None
        if t.kind == "geometric":
            return _tile_restrict(r, self.R[k], nj_c, ni_c)
        return jax.lax.dot_general(r, self.R[k], (((2,), (1,)), ((), ())),
                                   preferred_element_type=r.dtype)

    def _prolong(self, k, e):
        from dgtpu.ops.pallas_vcycle import _tile_prolong
        t = self.transfers[k]
        nj_c, ni_c = self.dims[k]
        if t.kind == "penalty":
            return e
        if t.kind == "geometric":
            return _tile_prolong(e, self.P[k], nj_c, ni_c)
        return jax.lax.dot_general(e, self.P[k], (((2,), (1,)), ((), ())),
                                   preferred_element_type=e.dtype)

    def _level_kernels(self, k):
        if k not in self._kern:
            s = self.streams[k]
            pre, post = self._cfg[self.types[k - 1]]
            self._kern[k] = (s.half_sweeps(4 * pre), s.half_sweeps(4 * post),
                             s.residual())
        return self._kern[k]

    def _smooth(self, fn, res_fn, r01, u01, zero_guess):
        """Apply a streamed smoother kernel.

        f32 storage: direct form (``fn(r01, u01)``, bit-identical to the
        fused kernel).  bf16 storage: DEFECT form — the narrowed blocks
        only ever see the f32 residual, so the smoother's fixed point (and
        hence what the cycle converges toward) is untouched; direct-form
        bf16 measurably stalls the cycle near kappa * 2^-8 relative
        (tests/test_block_storage.py pins the defect form at the f32
        contraction rate).  ``zero_guess`` skips the residual stream when
        the incoming iterate is identically zero (coarse first visits).
        """
        if self.block_storage not in ("bfloat16", "bf16"):
            return fn(r01, u01)
        d01 = r01 if zero_guess else res_fn(r01, u01)
        return u01 + fn(d01, jnp.zeros_like(u01))

    def _cycle(self, k, rhs, u, zero_guess=False):
        """rhs/u: (Nj, Ni, B) rolled layout at streamed levels."""
        if k < self.cut:
            flat = rhs.reshape(-1)
            out = self.sub._fn(flat, u.reshape(-1))
            return out.reshape(rhs.shape)
        nj, ni = self.dims[k]
        B = rhs.shape[-1]
        s = self.streams[k]
        pre_fn, post_fn, res_fn = self._level_kernels(k)
        r01 = _vec_to_soa2(rhs.reshape(-1), nj, ni, B)
        u01 = _vec_to_soa2(u.reshape(-1), nj, ni, B)
        u01 = self._smooth(pre_fn, res_fn, r01, u01, zero_guess)
        res01 = res_fn(r01, u01)
        r_roll = _soa2_to_vec(res01, nj, ni, B).reshape(nj, ni, B)
        r_c = self._restrict(k - 1, r_roll)
        e_c = self._cycle(k - 1, r_c, jnp.zeros_like(r_c), zero_guess=True)
        if self.cycle_type == "W" and k - 1 > 0:
            # revisit the coarse level; at the fused-subtree boundary
            # (k - 1 < cut) this re-invokes the whole fused sub-cycle with
            # the first visit's result as the initial guess, so the hybrid
            # W-cycle visits every level twice like SoAVCycle/MultigridSolver
            # (the coarsest level itself is never revisited, matching both)
            e_c = self._cycle(k - 1, r_c, e_c)
        corr = self._prolong(k - 1, e_c)
        u01 = u01 + _vec_to_soa2(corr.reshape(-1), nj, ni, B)
        u01 = self._smooth(post_fn, res_fn, r01, u01, zero_guess=False)
        return _soa2_to_vec(u01, nj, ni, B).reshape(nj, ni, B)

    def hbm_bytes_per_cycle(self):
        """Actual HBM operator traffic of ONE hybrid cycle.

        Counts what the kernels really DMA (tile-padded, storage-dtype
        aware): every half-sweep streams one color's 5 sweep slots, every
        residual/matvec streams both colors' 5 A_res slots, the bf16
        defect-form smoother adds its extra residual streams, and each
        fused-subtree invocation reads its padded operand set once.
        The bench's generic stencil model undercounts the symmetric
        red-black sweep 2x (2 color passes/iteration vs the actual 4
        half-sweeps) — this is the per-impl honest figure."""
        def pad_sub(b, itemsize):
            t = 16 if itemsize == 2 else 8
            return ((b + t - 1) // t) * t

        bf16_defect = self.block_storage in ("bfloat16", "bf16")
        sub_bytes = self.sub.hbm_bytes_per_invocation()

        def level_visit_bytes(k, zero_guess):
            s = self.streams[k]
            pre, post = self._cfg[self.types[k - 1]]
            it_sw = s.A_sweep.dtype.itemsize
            sweep_half = it_sw * 5 * s.B * pad_sub(s.B, it_sw) * s.C
            if s.sweep_resident:
                # one whole-operand fetch per half_sweeps application
                # (pre kernel + post kernel), however many half-sweeps
                # each runs — the point of the resident mode
                sweep_total = 2 * s._sweep_operand_bytes()
            else:
                sweep_total = 4 * (pre + post) * sweep_half
            it_res = s.A_res.dtype.itemsize
            res_full = (it_res * 2 * 5 * s.B_src
                        * pad_sub(s.B_dst, it_res) * s.C)
            n_res = 1                        # the cycle's own residual
            if bf16_defect:                  # defect-form extra residuals
                n_res += (0 if zero_guess else 1) + 1
            return sweep_total + n_res * res_full

        def rec(k, zero_guess):
            if k < self.cut:
                return sub_bytes
            total = level_visit_bytes(k, zero_guess)
            total += rec(k - 1, True)
            if self.cycle_type == "W" and k - 1 > 0:
                total += rec(k - 1, False)
            return total

        return rec(self.n_lev - 1, False)

    def build(self):
        if self.sub._fn is None:
            self.sub.build()
        nj, ni = self.dims[-1]

        @const_jit
        def one_cycle(rhs, u):
            B = rhs.size // (nj * ni)
            r = rhs.astype(self.dtype).reshape(nj, ni, B)
            x = u.astype(self.dtype).reshape(nj, ni, B)
            out = self._cycle(self.n_lev - 1, r, x)
            return out.reshape(rhs.shape)

        self._fn = one_cycle
        return one_cycle

    def build_fmg(self, finest_cycle=None):
        """fmg(rhs) -> u0: FMG guess through the hybrid hierarchy.

        The fused subtree contributes its own (XLA) FMG pass; the streamed
        levels above it restrict the rhs down and run one cycle per level
        on the way back up.  One-shot per solve, so the streamed kernels
        (already built for the cycle) are reused but no new Mosaic kernel
        is compiled.  ``finest_cycle`` is accepted for interface parity
        with the fused builders and ignored: the finest-level FMG cycle
        here already runs the streamed Pallas kernels."""
        del finest_cycle
        if self.sub._fn is None:
            self.sub.build()
        # the subtree's cut-level FMG cycle runs its fused kernel (already
        # built above) instead of the XLA graph
        sub_fmg = self.sub.build_fmg(finest_cycle=self.sub._fn)
        nj, ni = self.dims[-1]

        @const_jit
        def fmg(rhs):
            B = rhs.size // (nj * ni)
            r = rhs.astype(self.dtype).reshape(nj, ni, B)
            rhss = [r]
            for k in range(self.n_lev - 1, self.cut - 1, -1):
                rhss.append(self._restrict(k - 1, rhss[-1]))
            rhss = rhss[::-1]               # level cut-1 first
            u = sub_fmg(rhss[0].reshape(-1)).reshape(rhss[0].shape)
            for i, k in enumerate(range(self.cut, self.n_lev)):
                u = self._prolong(k - 1, u)
                u = self._cycle(k, rhss[i + 1], u)
            return u.reshape(rhs.shape)

        return fmg
