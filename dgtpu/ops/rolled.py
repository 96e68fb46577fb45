"""Roll-layout stencil operations.

The gather-based StencilOperator is the general representation; on TPU the
structured element grid allows a gather-free layout::

    blocks : (Nj, Ni, 5, B, B)    vectors : (Nj, Ni, B)

where the i-neighbors are circular rolls along axis 1 and the j-neighbors
shifts along axis 0 (zero halos at physical boundaries — the corresponding
blocks are zero, so rolls are harmless even for Dirichlet topologies, and
exact for O-grid wrap).  These value-level functions are shared by the
single-chip fast path, the Pallas fused V-cycle, and the shard_map halo
version (which replaces the j-shifts with ppermute exchanges).
"""

import jax.numpy as jnp


def bmv(blocks, u):
    """Batched block matvec (..., a, b) x (..., b) -> (..., a).

    Written as broadcast-multiply-reduce rather than dot_general: at these
    block sizes the contraction is VPU-bound either way, and Mosaic (Pallas
    TPU) does not lower multi-batch-dim tpu.matmul.
    """
    return jnp.sum(blocks * u[..., None, :], axis=-1)


def to_rolled(op, Ni, Nj):
    """StencilOperator blocks -> (Nj, Ni, 5, B, B)."""
    n, s, br, bc = op.blocks.shape
    assert n == Ni * Nj and s == 5
    return op.blocks.reshape(Nj, Ni, 5, br, bc)


def vec_to_rolled(v, Ni, Nj, B):
    return v.reshape(Nj, Ni, B)


def _shift_j(u, up):
    """Neighbor fields in the j direction with zero halos."""
    zero = jnp.zeros_like(u[:1])
    if up:
        return jnp.concatenate([zero, u[:-1]], axis=0)     # j-1 neighbor values
    return jnp.concatenate([u[1:], zero], axis=0)          # j+1


def neighbor_fields(u):
    """(u_iL, u_iR, u_jL, u_jR) for a (Nj, Ni, B) field."""
    return (jnp.roll(u, 1, axis=1), jnp.roll(u, -1, axis=1),
            _shift_j(u, True), _shift_j(u, False))


def matvec(blocks, u):
    u_iL, u_iR, u_jL, u_jR = neighbor_fields(u)
    out = bmv(blocks[:, :, 0], u)
    out += bmv(blocks[:, :, 1], u_iL)
    out += bmv(blocks[:, :, 2], u_iR)
    out += bmv(blocks[:, :, 3], u_jL)
    out += bmv(blocks[:, :, 4], u_jR)
    return out


def offdiag_matvec(blocks, u):
    u_iL, u_iR, u_jL, u_jR = neighbor_fields(u)
    out = bmv(blocks[:, :, 1], u_iL)
    out += bmv(blocks[:, :, 2], u_iR)
    out += bmv(blocks[:, :, 3], u_jL)
    out += bmv(blocks[:, :, 4], u_jR)
    return out


def checkerboard(Nj, Ni, dtype=jnp.int32):
    j = jnp.arange(Nj)[:, None]
    i = jnp.arange(Ni)[None, :]
    return ((i + j) % 2).astype(dtype)


def rb_gs_sweeps(blocks, Dinv, rhs, u, colors, n_color_passes):
    """n_color_passes red/black half-sweeps (2 per symmetric GS iteration)."""
    for _ in range(n_color_passes):
        for c in (0, 1):
            off = offdiag_matvec(blocks, u)
            unew = bmv(Dinv, rhs - off)
            u = jnp.where((colors == c)[:, :, None], unew, u)
    return u


def color_masks(Nj, Ni, dtype):
    """Float checkerboard masks (2, Nj, Ni, 1) — the Mosaic-friendly color
    select (integer compare + where does not lower in Pallas TPU)."""
    import numpy as np
    cb = np.asarray(checkerboard(Nj, Ni))
    return jnp.asarray(np.stack([(cb == 0), (cb == 1)])
                       .astype(np.dtype(dtype))[:, :, :, None])


def rb_gs_sweeps_masked(blocks, Dinv, rhs, u, masks, n_color_passes):
    """rb_gs_sweeps with precomputed float masks (Pallas-safe)."""
    for _ in range(n_color_passes):
        for c in (0, 1):
            off = offdiag_matvec(blocks, u)
            unew = bmv(Dinv, rhs - off)
            u = masks[c] * unew + (1.0 - masks[c]) * u
    return u


def jacobi_sweeps(blocks, Dinv, rhs, u, n, omega=0.8):
    for _ in range(n):
        off = offdiag_matvec(blocks, u)
        unew = bmv(Dinv, rhs - off)
        u = omega * unew + (1 - omega) * u
    return u
