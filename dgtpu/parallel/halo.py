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


class ShardColorPack:
    """Per-color packed off-diagonal data for the sharded red-black sweep.

    Counterpart of ``ops.smoothers.ColorPack``: each color pass reads only
    its own rows' off-diagonal blocks (~1/2.5 of the stencil traffic) with
    the same update math.  Requires an even number of element rows per
    shard so the local checkerboard pattern is identical on every shard —
    then the index sets are shard-invariant compile-time constants and only
    the packed blocks/Dinv arrays are sharded (leading dim in shard order).
    """

    def __init__(self, blocks, Dinv, nj_loc, Ni):
        import numpy as np
        blocks = np.asarray(blocks)          # (Nj, Ni, 5, B, B), host
        Dinv = np.asarray(Dinv)
        Nj = blocks.shape[0]
        n_dev = Nj // nj_loc
        B = blocks.shape[-1]
        lj, li = np.meshgrid(np.arange(nj_loc), np.arange(Ni), indexing="ij")
        local_color = (lj + li) % 2          # same on every shard (nj_loc even)
        b6 = blocks.reshape(n_dev, nj_loc, Ni, 5, B, B)
        d6 = Dinv.reshape(n_dev, nj_loc, Ni, B, B)
        self.idx, self.off_nbr, self.off_blocks, self.Dinv = [], [], [], []
        ext_ni = Ni                           # u_ext rows: [halo_up, u..., halo_down]
        for c in (0, 1):
            sel = local_color == c
            ljc, lic = lj[sel], li[sel]
            # flat index into the local (nj_loc, Ni) grid
            self.idx.append(jnp.asarray(ljc * Ni + lic, dtype=jnp.int32))
            # neighbor flat indices into the (nj_loc + 2, Ni) extended grid
            # (row 0 = halo_up, row nj_loc + 1 = halo_down); i wraps like the
            # roll-based matvec (wrapped blocks are zero on Dirichlet grids)
            iL = (ljc + 1) * ext_ni + (lic - 1) % Ni
            iR = (ljc + 1) * ext_ni + (lic + 1) % Ni
            jL = ljc * ext_ni + lic
            jR = (ljc + 2) * ext_ni + lic
            self.off_nbr.append(jnp.asarray(
                np.stack([iL, iR, jL, jR], axis=1), dtype=jnp.int32))
            ob = b6[:, ljc, lic, 1:]          # (n_dev, nc, 4, B, B)
            self.off_blocks.append(jnp.asarray(ob.reshape(-1, 4, B, B)))
            self.Dinv.append(jnp.asarray(
                d6[:, ljc, lic].reshape(-1, B, B)))

    def tree(self):
        return (tuple(self.off_blocks), tuple(self.Dinv))


def _rb_gs_sweep_packed(pack_consts, off_blocks, Dinv_c, rhs, u, n_pass=2):
    """Color-packed sharded sweep; halos refreshed before each color pass."""
    idx, off_nbr = pack_consts
    nj_loc, ni, B = u.shape
    rhs_flat = rhs.reshape(-1, B)
    for _ in range(n_pass):
        for c in (0, 1):
            up, down = _halo_exchange(u)
            u_ext = jnp.concatenate([up[None], u, down[None]], axis=0)
            u_nbr = u_ext.reshape(-1, B)[off_nbr[c]]       # (nc, 4, B)
            off = jnp.einsum("nsab,nsb->na", off_blocks[c], u_nbr)
            unew = jnp.einsum("nab,nb->na", Dinv_c[c], rhs_flat[idx[c]] - off)
            u = u.reshape(-1, B).at[idx[c]].set(unew).reshape(nj_loc, ni, B)
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

    Supports p-/penalty-coarsening (element-local, communication-free
    transfers) and geometric (h) coarsening: the 2x2 agglomeration is
    shard-local because each device owns whole coarse-element rows — the
    transfer needs no communication either, provided every level's Nj
    divides over the mesh.  Smoothing is red-black GS; the coarsest level
    is a replicated dense solve (one all_gather per visit).
    """

    def __init__(self, levels, transfers, settings, mesh=None,
                 pre_iters=2, post_iters=1):
        self.mesh = mesh if mesh is not None else make_mesh()
        n_dev = self.mesh.devices.size
        self.dims = [(l.Ni, l.Nj) for l in levels]
        self.Ni, self.Nj = self.dims[-1]
        for (ni, nj) in self.dims:
            if nj % n_dev:
                raise ValueError(f"Nj={nj} must divide over {n_dev} devices")
        for t in transfers:
            if t.kind not in ("polynomial", "penalty", "geometric"):
                raise NotImplementedError(
                    "sharded multigrid supports p/penalty/geometric transfers "
                    f"(got {t.kind})")
        self.levels = levels
        self.transfer_meta = [(t.kind, getattr(t, "cf_f", 1)) for t in transfers]
        self.pre_iters, self.post_iters = pre_iters, post_iters
        self.blocks = [reshape_level(l.op, ni, nj)
                       for l, (ni, nj) in zip(levels, self.dims)]
        from dgtpu.ops.linalg import host_inv
        self.Dinv = [host_inv(b[:, :, 0]) for b in self.blocks]
        # color-packed sweeps (possible when the local band has an even
        # number of rows so the checkerboard is shard-invariant)
        self.pack_host = []
        for (ni, nj), b, d in zip(self.dims, self.blocks, self.Dinv):
            nj_loc = nj // n_dev
            self.pack_host.append(ShardColorPack(b, d, nj_loc, ni)
                                  if nj_loc % 2 == 0 else None)
        self._pack_consts = [(tuple(p.idx), tuple(p.off_nbr))
                             if p is not None else None
                             for p in self.pack_host]
        self.R = [t.R for t in transfers]
        self.Pr = [t.P for t in transfers]
        from dgtpu.ops.linalg import host_lu_inverse
        self.coarse_inv = host_lu_inverse(levels[0].op.to_dense())
        self.colors = []
        for (ni, nj) in self.dims:
            i = jnp.arange(ni)[None, :]
            j = jnp.arange(nj)[:, None]
            self.colors.append(((i + j) % 2).astype(jnp.int32))
        self.tol = settings.solver.multigrid.tolerance
        self.max_cycles = int(settings.solver.multigrid.max_cycles)
        self._built = None

    def _restrict(self, k, r):
        """Level k residual -> level k-1 rhs (shard-local)."""
        kind, cf = self.transfer_meta[k - 1]
        if kind == "geometric":
            nj_loc, ni, B = r.shape
            rows = r.reshape(nj_loc // cf, cf, ni // cf, cf, B)
            rows = rows.transpose(0, 2, 1, 3, 4).reshape(
                nj_loc // cf, ni // cf, cf * cf * B)
            return jnp.einsum("ab,jib->jia", self.R[k - 1], rows)
        return jnp.einsum("ab,jib->jia", self.R[k - 1], r)

    def _prolong(self, k, e_c):
        """Level k-1 correction -> level k (shard-local)."""
        kind, cf = self.transfer_meta[k - 1]
        v = jnp.einsum("ab,jib->jia", self.Pr[k - 1], e_c)
        if kind == "geometric":
            njc_loc, nic, _ = e_c.shape
            B = v.shape[2] // (cf * cf)
            v = v.reshape(njc_loc, nic, cf, cf, B).transpose(0, 2, 1, 3, 4)
            return v.reshape(njc_loc * cf, nic * cf, B)
        return v

    def _smooth(self, k, data, rhs, u, n_pass):
        blocks, Dinv, colors, coarse_inv, packs = data
        pc = self._pack_consts[k]
        if pc is not None:
            return _rb_gs_sweep_packed(pc, packs[k][0], packs[k][1],
                                       rhs, u, n_pass=n_pass)
        return _rb_gs_sweep(blocks[k], Dinv[k], rhs, u, colors[k],
                            n_pass=n_pass)

    def _v_cycle(self, k, data, rhs, u):
        blocks, Dinv, colors, coarse_inv, packs = data
        if k == 0:
            # replicated coarse solve: gather the full coarse residual
            r_full = jax.lax.all_gather(rhs, AXIS, axis=0, tiled=True)
            e_full = (coarse_inv @ r_full.reshape(-1)).reshape(r_full.shape)
            n_dev = jax.lax.axis_size(AXIS)
            idx = jax.lax.axis_index(AXIS)
            nj_loc = rhs.shape[0]
            return jax.lax.dynamic_slice_in_dim(e_full, idx * nj_loc, nj_loc, 0)
        u = self._smooth(k, data, rhs, u, 2 * self.pre_iters)
        r = rhs - _matvec_with_halo(blocks[k], u)
        r_c = self._restrict(k, r)
        e_c = self._v_cycle(k - 1, data, r_c, jnp.zeros_like(r_c))
        u = u + self._prolong(k, e_c)
        u = self._smooth(k, data, rhs, u, 2 * self.post_iters)
        return u

    def build(self):
        """Construct the jitted sharded solve function."""
        shard_map = jax.shard_map
        mesh = self.mesh
        n_lev = len(self.levels)
        spec = P(AXIS)
        pack_specs = tuple(
            (tuple(P(AXIS) for _ in p.off_blocks),
             tuple(P(AXIS) for _ in p.Dinv)) if p is not None else ((), ())
            for p in self.pack_host)
        data_specs = (tuple(P(AXIS) for _ in self.blocks),
                      tuple(P(AXIS) for _ in self.Dinv),
                      tuple(P(AXIS) for _ in self.colors), P(), pack_specs)
        tol, max_cycles = self.tol, self.max_cycles

        def solve_local(blocks, Dinv, colors, coarse_inv, packs, rhs, u0):
            data = (blocks, Dinv, colors, coarse_inv, packs)
            res0 = _pnorm2(rhs - _matvec_with_halo(blocks[-1], u0))
            hist0 = jnp.full((max_cycles + 1,), jnp.nan, dtype=rhs.dtype)

            def cond(state):
                n, u, res, hist = state
                return (n < max_cycles) & (res >= tol) & jnp.isfinite(res)

            def body(state):
                n, u, res, hist = state
                hist = hist.at[n].set(res)
                u = self._v_cycle(n_lev - 1, data, rhs, u)
                res = _pnorm2(rhs - _matvec_with_halo(blocks[-1], u)) / res0
                return n + 1, u, res, hist

            n0 = jnp.asarray(0, dtype=jnp.int32)
            one = jnp.asarray(1.0, dtype=rhs.dtype)
            n, u, res, hist = jax.lax.while_loop(cond, body,
                                                 (n0, u0, one, hist0))
            hist = hist.at[n].set(res)
            return u, res, n, hist

        fn = shard_map(solve_local, mesh=mesh,
                       in_specs=data_specs + (spec, spec),
                       out_specs=(spec, P(), P(), P()),
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
            packs = tuple(p.tree() if p is not None else ((), ())
                          for p in self.pack_host)
            args = (tuple(self.blocks), tuple(self.Dinv), tuple(self.colors),
                    self.coarse_inv, packs)
            u, res, n, hist = self._built(*args, rhs, u0)
        hist = np.asarray(hist)
        self.history = [float(r) for r in hist[np.isfinite(hist)]]
        return grid_to_vec(u), float(res), int(n)
