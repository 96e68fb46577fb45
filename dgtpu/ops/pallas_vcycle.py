"""The whole multigrid V-cycle as ONE fused Pallas TPU kernel.

At the reference's scales every multigrid level fits comfortably in VMEM
(flagship 8x8 p=5 Poisson: ~2 MB of f32 operator blocks across all levels),
so the entire cycle — pre-smooths, residual, restriction, recursion, coarse
dense solve, prolongation, post-smooths — compiles to a single kernel with
zero HBM roundtrips and zero inter-op launch gaps.  This is the
speed-of-light implementation of the BASELINE north-star metric; the XLA
multi-op path (solvers/multigrid.py) remains the reference implementation.

Restrictions: p-/penalty-/geometric transfers (as in the flagship configs);
red-black smoothing; float32 or float64 (f64 emulated on TPU).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgtpu.ops import rolled
from dgtpu.ops.linalg import host_inv, host_lu_inverse


class PallasVCycle:
    """Builds the fused kernel from an assembled hierarchy.

    Parameters mirror MultigridSolver; smoothing is red-black with the
    configured pre/post iteration counts per transfer type.
    """

    def __init__(self, ops, transfers, types, settings, dims,
                 dtype=jnp.float32, interpret=False):
        """``dims``: [(Nj, Ni)] per level, coarsest first."""
        self.settings = settings
        self.types = types
        self.transfers = transfers
        self.dtype = dtype
        self.interpret = interpret
        self.n_lev = len(ops)
        self.dims = list(dims)
        self.blocks = [rolled.to_rolled(op, self.dims[k][1], self.dims[k][0])
                       .astype(dtype) for k, op in enumerate(ops)]
        self.Dinv = [host_inv(b[:, :, 0]).astype(dtype) for b in self.blocks]
        self.colors = [rolled.checkerboard(nj, ni) for nj, ni in self.dims]
        self.coarse_inv = host_lu_inverse(ops[0].to_dense()).astype(dtype)
        self._cfg = {}
        for t in set(types):
            node = getattr(settings.solver.multigrid, f"{t}_coarsening")
            self._cfg[t] = (int(node.pre_smoother.iterations),
                            int(node.post_smoother.iterations))
        self.R = [t.R.astype(dtype) for t in transfers]
        self.P = [t.P.astype(dtype) for t in transfers]
        self._fn = None

    # ---- value-level cycle (runs inside the kernel) -------------------------

    def _restrict(self, k, R, r):
        """Transfer k sits between level k+1 (fine) and k (coarse); r is the
        fine-level (Nj, Ni, B) residual field."""
        t = self.transfers[k]
        nj_c, ni_c = self.dims[k]
        if t.kind == "penalty":
            return r
        if t.kind == "polynomial":
            return jax.lax.dot_general(r, R, ((( 2,), (1,)), ((), ())),
                                        preferred_element_type=r.dtype)
        if t.kind == "geometric":
            B = r.shape[-1]
            v = r.reshape(nj_c, 2, ni_c, 2, B).transpose(0, 2, 1, 3, 4)
            v = v.reshape(nj_c, ni_c, 4 * B)
            return jax.lax.dot_general(v, R, (((2,), (1,)), ((), ())),
                                        preferred_element_type=v.dtype)
        raise NotImplementedError(t.kind)

    def _prolong(self, k, P, e):
        t = self.transfers[k]
        nj_c, ni_c = self.dims[k]
        if t.kind == "penalty":
            return e
        if t.kind == "polynomial":
            return jax.lax.dot_general(e, P, (((2,), (1,)), ((), ())),
                                        preferred_element_type=e.dtype)
        if t.kind == "geometric":
            v = jax.lax.dot_general(e, P, (((2,), (1,)), ((), ())),
                                    preferred_element_type=e.dtype)   # (nj_c, ni_c, 4B)
            B = v.shape[-1] // 4
            v = v.reshape(nj_c, ni_c, 2, 2, B).transpose(0, 2, 1, 3, 4)
            return v.reshape(nj_c * 2, ni_c * 2, B)
        raise NotImplementedError(t.kind)

    def _cycle(self, k, consts, rhs, u):
        blocks, Dinv, colors, Rs, Ps, coarse_inv = consts
        if k == 0:
            nj, ni = self.dims[0]
            B = rhs.shape[-1]
            e = coarse_inv @ rhs.reshape(-1)
            return e.reshape(nj, ni, B)
        pre, post = self._cfg[self.types[k - 1]]
        b, d, c = blocks[k], Dinv[k], colors[k]
        u = rolled.rb_gs_sweeps(b, d, rhs, u, c, 2 * pre)
        r = rhs - rolled.matvec(b, u)
        r_c = self._restrict(k - 1, Rs[k - 1], r)
        e_c = self._cycle(k - 1, consts, r_c, jnp.zeros_like(r_c))
        u = u + self._prolong(k - 1, Ps[k - 1], e_c)
        u = rolled.rb_gs_sweeps(b, d, rhs, u, c, 2 * post)
        return u

    # ---- kernel construction -------------------------------------------------

    def build(self):
        n_lev = self.n_lev
        n_tr = n_lev - 1
        # inputs: rhs, u, blocks x L, Dinv x L, colors x L, R x (L-1),
        #         P x (L-1), coarse_inv
        n_inputs = 2 + 3 * n_lev + 2 * n_tr + 1

        def kernel(*refs):
            rhs_ref, u_ref = refs[0], refs[1]
            off = 2
            blocks = [refs[off + k][:] for k in range(n_lev)]; off += n_lev
            Dinv = [refs[off + k][:] for k in range(n_lev)]; off += n_lev
            colors = [refs[off + k][:] for k in range(n_lev)]; off += n_lev
            Rs = [refs[off + k][:] for k in range(n_tr)]; off += n_tr
            Ps = [refs[off + k][:] for k in range(n_tr)]; off += n_tr
            coarse_inv = refs[off][:]
            out_ref = refs[-1]
            consts = (blocks, Dinv, colors, Rs, Ps, coarse_inv)
            out_ref[:] = self._cycle(n_lev - 1, consts, rhs_ref[:], u_ref[:])

        nj, ni = self.dims[-1]
        B = self.blocks[-1].shape[-1]
        out_shape = jax.ShapeDtypeStruct((nj, ni, B), self.dtype)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

        call = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[vspec] * n_inputs,
            out_specs=vspec,
            interpret=self.interpret,
        )

        consts = (*self.blocks, *self.Dinv, *self.colors,
                  *self.R, *self.P, self.coarse_inv)

        @jax.jit
        def one_cycle(rhs, u):
            rhs = rhs.reshape(nj, ni, B).astype(self.dtype)
            u = u.reshape(nj, ni, B).astype(self.dtype)
            out = call(rhs, u, *consts)
            return out.reshape(-1)

        self._fn = one_cycle
        return one_cycle

    def __call__(self, rhs, u):
        if self._fn is None:
            self.build()
        return self._fn(rhs, u)
