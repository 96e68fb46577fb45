"""Multi-chip element-domain decomposition via shard_map + halo exchange.

The reference is strictly single-process (SURVEY §2: no parallelism of any
kind); this module is the new first-class scaling capability.  The element
grid is decomposed along the j-direction over a 1D ``jax.sharding.Mesh``
axis: each device owns a contiguous band of element rows.  The only
communication in the math is the nearest-neighbor face coupling of the
5-point block stencil, which becomes a one-row halo exchange via
``lax.ppermute`` riding the ICI; p-/penalty-multigrid transfers are
element-local and need no communication at all (SURVEY §5 table).

Data layout per level (j-sharded on axis 0):

    blocks : (Nj, Ni, 5, B, B)   stencil slots [self, iL, iR, jL, jR]
    vecs   : (Nj, Ni, B)

i-direction neighbors are intra-shard rolls (periodic wrap is exact for
O-grids; for Dirichlet topologies the wrapped blocks are zero so the roll is
harmless).  Smoothers in sharded mode are red-black colored (each color is
one batched update + halo refresh) — the documented parallel deviation from
the reference's lexicographic sweeps.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "x"


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def reshape_level(op, Ni, Nj):
    """StencilOperator -> j-sharded layout (Nj, Ni, 5, B, B)."""
    n, s, br, bc = op.blocks.shape
    assert n == Ni * Nj and s == 5
    return op.blocks.reshape(Nj, Ni, 5, br, bc)


def vec_to_grid(v, Ni, Nj, B):
    return v.reshape(Nj, Ni, B)


def grid_to_vec(g):
    return g.reshape(-1)


# -- inside-shard_map kernels (operate on local blocks, explicit halos) ------


def _halo_exchange(u_local):
    """Fetch the j-neighbor boundary rows from adjacent shards.

    Returns (row_above, row_below) of shape (Ni, B); zeros at the physical
    ends of the mesh (the corresponding stencil blocks are zero there).
    """
    n_dev = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    up = jax.lax.ppermute(u_local[-1], AXIS,
                          [(d, (d + 1) % n_dev) for d in range(n_dev)])
    down = jax.lax.ppermute(u_local[0], AXIS,
                            [(d, (d - 1) % n_dev) for d in range(n_dev)])
    zero = jnp.zeros_like(up)
    up = jnp.where(idx == 0, zero, up)             # no shard above the first
    down = jnp.where(idx == n_dev - 1, zero, down)
    return up, down


def _local_matvec(blocks, u, halo_up, halo_down):
    """Stencil matvec on the local band given j-halos (roll-based, no gathers)."""
    u_jL = jnp.concatenate([halo_up[None], u[:-1]], axis=0)
    u_jR = jnp.concatenate([u[1:], halo_down[None]], axis=0)
    u_iL = jnp.roll(u, 1, axis=1)
    u_iR = jnp.roll(u, -1, axis=1)
    out = jnp.einsum("jiab,jib->jia", blocks[:, :, 0], u)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 1], u_iL)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 2], u_iR)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 3], u_jL)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 4], u_jR)
    return out


def _matvec_with_halo(blocks, u):
    up, down = _halo_exchange(u)
    return _local_matvec(blocks, u, up, down)


def _local_offdiag(blocks, u):
    up, down = _halo_exchange(u)
    u_jL = jnp.concatenate([up[None], u[:-1]], axis=0)
    u_jR = jnp.concatenate([u[1:], down[None]], axis=0)
    u_iL = jnp.roll(u, 1, axis=1)
    u_iR = jnp.roll(u, -1, axis=1)
    out = jnp.einsum("jiab,jib->jia", blocks[:, :, 1], u_iL)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 2], u_iR)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 3], u_jL)
    out += jnp.einsum("jiab,jib->jia", blocks[:, :, 4], u_jR)
    return out


def _rb_gs_sweep(blocks, Dinv, rhs, u, colors, n_pass=2):
    """Red-black block-GS sweep; colors (Nj_local, Ni) 0/1."""
    for _ in range(n_pass):
        for c in (0, 1):
            off = _local_offdiag(blocks, u)
            unew = jnp.einsum("jiab,jib->jia", Dinv, rhs - off)
            u = jnp.where((colors == c)[:, :, None], unew, u)
    return u


def _block_jacobi_sweep(blocks, Dinv, rhs, u, omega=0.8):
    off = _local_offdiag(blocks, u)
    unew = jnp.einsum("jiab,jib->jia", Dinv, rhs - off)
    return omega * unew + (1 - omega) * u


def _pnorm2(x):
    """Global size-normalized L2 norm across shards."""
    s = jax.lax.psum(jnp.sum(x * x), AXIS)
    n = jax.lax.psum(jnp.asarray(x.size, x.dtype), AXIS)
    return jnp.sqrt(s / n)


class ShardedMultigrid:
    """Sharded Poisson multigrid over a 1D device mesh.

    Supports per-element transfers (p- and penalty-coarsening) which are
    communication-free, with red-black GS smoothing and a replicated coarse
    dense solve (one all_gather per V-cycle visit of the coarsest level).
    """

    def __init__(self, levels, transfers, settings, mesh=None,
                 pre_iters=2, post_iters=1):
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.devices.size
        self.Ni = levels[0].Ni
        self.Nj = levels[0].Nj
        if self.Nj % n_dev:
            raise ValueError(f"Nj={self.Nj} must divide over {n_dev} devices")
        for t in transfers:
            if t.kind not in ("polynomial", "penalty"):
                raise NotImplementedError(
                    "sharded multigrid supports element-local (p/penalty) transfers")
        self.levels = levels
        self.pre_iters, self.post_iters = pre_iters, post_iters
        self.blocks = [reshape_level(l.op, self.Ni, self.Nj) for l in levels]
        from dgtpu.ops.linalg import host_inv
        self.Dinv = [host_inv(b[:, :, 0]) for b in self.blocks]
        self.R = [t.R for t in transfers]
        self.Pr = [t.P for t in transfers]
        from dgtpu.ops.linalg import host_lu_inverse
        self.coarse_inv = host_lu_inverse(levels[0].op.to_dense())
        i = jnp.arange(self.Ni)[None, :]
        j = jnp.arange(self.Nj)[:, None]
        self.colors = ((i + j) % 2).astype(jnp.int32)
        self.tol = settings.solver.multigrid.tolerance
        self.max_cycles = int(settings.solver.multigrid.max_cycles)
        self._built = None

    def _v_cycle(self, k, data, rhs, u):
        blocks, Dinv, colors, coarse_inv, R, Pr = data
        if k == 0:
            # replicated coarse solve: gather the full coarse residual
            r_full = jax.lax.all_gather(rhs, AXIS, axis=0, tiled=True)
            e_full = (coarse_inv @ r_full.reshape(-1)).reshape(r_full.shape)
            n_dev = jax.lax.axis_size(AXIS)
            idx = jax.lax.axis_index(AXIS)
            nj_loc = rhs.shape[0]
            return jax.lax.dynamic_slice_in_dim(e_full, idx * nj_loc, nj_loc, 0)
        b = blocks[k]
        u = _rb_gs_sweep(b, Dinv[k], rhs, u, colors, n_pass=2 * self.pre_iters)
        r = rhs - _matvec_with_halo(b, u)
        r_c = jnp.einsum("ab,jib->jia", R[k - 1], r)
        e_c = self._v_cycle(k - 1, data, r_c, jnp.zeros_like(r_c))
        u = u + jnp.einsum("ab,jib->jia", Pr[k - 1], e_c)
        u = _rb_gs_sweep(b, Dinv[k], rhs, u, colors, n_pass=2 * self.post_iters)
        return u

    def build(self):
        """Construct the jitted sharded solve function."""
        shard_map = jax.shard_map
        mesh = self.mesh
        n_lev = len(self.levels)
        spec = P(AXIS)
        data_specs = (tuple(P(AXIS) for _ in self.blocks),
                      tuple(P(AXIS) for _ in self.Dinv),
                      P(AXIS), P(), tuple(P() for _ in self.R),
                      tuple(P() for _ in self.Pr))
        tol, max_cycles = self.tol, self.max_cycles

        def solve_local(blocks, Dinv, colors, coarse_inv, R, Pr, rhs, u0):
            data = (blocks, Dinv, colors, coarse_inv, R, Pr)
            res0 = _pnorm2(rhs - _matvec_with_halo(blocks[-1], u0))

            def cond(state):
                n, u, res = state
                return (n < max_cycles) & (res >= tol) & jnp.isfinite(res)

            def body(state):
                n, u, res = state
                u = self._v_cycle(n_lev - 1, data, rhs, u)
                res = _pnorm2(rhs - _matvec_with_halo(blocks[-1], u)) / res0
                return n + 1, u, res

            n0 = jnp.asarray(0, dtype=jnp.int32)
            one = jnp.asarray(1.0, dtype=rhs.dtype)
            n, u, res = jax.lax.while_loop(cond, body, (n0, u0, one))
            return u, res, n

        fn = shard_map(solve_local, mesh=mesh,
                       in_specs=data_specs + (spec, spec),
                       out_specs=(spec, P(), P()),
                       check_vma=False)
        self._built = jax.jit(fn)
        return self._built

    def solve(self, rhs_vec, u0_vec=None):
        B = self.levels[-1].N_DOF_sol_tot
        rhs = vec_to_grid(rhs_vec, self.Ni, self.Nj, B)
        u0 = (vec_to_grid(u0_vec, self.Ni, self.Nj, B) if u0_vec is not None
              else jnp.zeros_like(rhs))
        if self._built is None:
            self.build()
        with self.mesh:
            sh = NamedSharding(self.mesh, P(AXIS))
            rhs = jax.device_put(rhs, sh)
            u0 = jax.device_put(u0, sh)
            args = (tuple(self.blocks), tuple(self.Dinv), self.colors,
                    self.coarse_inv, tuple(self.R), tuple(self.Pr))
            u, res, n = self._built(*args, rhs, u0)
        return grid_to_vec(u), float(res), int(n)
