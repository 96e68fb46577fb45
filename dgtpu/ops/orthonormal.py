"""Per-element Gram-Schmidt orthonormalization on the physical element.

Reference: ``problem.orthonormal_on_physical_element`` — when enabled, every
element's modal basis is re-orthonormalized against the *physical* inner
product ``<f, g>_e = int_e f g dx = sum_q w_q J_e(q) f g``
(interpolation.py:202-219, wired per element at element.py:33-43 and per
face side at face.py:43-59; Poisson/'u' only, as the reference notes).

The reference runs a per-element Python modified-GS; here the recursion over
modes stays (B is small and the recursion is inherently sequential) but each
step is batched over all N elements at once.  The result is a per-element
change-of-basis ``V_e_new = V_table @ W_e * n_e`` so every Vandermonde table
turns into an (N, nq, B) tensor.

Fidelity note: the reference's accumulated ``weights`` matrix drops the
second-order cross terms of the MGS recursion (interpolation.py:213 adds the
coefficient against the *orthogonalized* column into the slot of the
*original* column), and then applies the exact running values for the volume
Vandermonde but the approximate matrix for derivatives/traces
(element.py:38-43) — a slightly inconsistent discretization.  We apply the
same (approximate) transform to *every* table, which is a consistent change
of basis: the discrete solution is bit-identical to the standard-basis one,
and the per-element mass matrix is identity up to the same O(delta^2) the
reference achieves on its trace tables.
"""

import jax.numpy as jnp
import numpy as np


def gram_schmidt_weights(V, wJ, eps=1e-16):
    """Batched modified Gram-Schmidt on the columns of V under diag(wJ_e).

    ``V``: (nq, B) shared basis values at volume quadrature; ``wJ``: (N, nq)
    per-element weights (w_2d * J_e).  Returns (weights, norms):
    ``weights`` (N, B, B) upper-triangular combination matrix, ``norms``
    (N, B), such that the orthonormalized values are
    ``(V @ weights_e) * norms_e``  — matching interpolation.py:202-219
    including its eps regularization.
    """
    V = np.asarray(V)
    wJ = np.asarray(wJ)
    N = wJ.shape[0]
    B = V.shape[1]
    Vo = np.broadcast_to(V, (N,) + V.shape).copy()     # (N, nq, B)
    weights = np.zeros((N, B, B))
    for i in range(B):
        weights[:, i, i] = 1.0
        for j in range(i):
            num = np.einsum("nq,nq,nq->n", Vo[:, :, i], Vo[:, :, j], wJ)
            den = np.einsum("nq,nq,nq->n", Vo[:, :, j], Vo[:, :, j], wJ) + eps
            w = -num / den
            Vo[:, :, i] += w[:, None] * Vo[:, :, j]
            weights[:, j, i] += w
    norms = 1.0 / np.sqrt(
        np.einsum("nqb,nqb,nq->nb", Vo, Vo, wJ) + eps)
    return jnp.asarray(weights), jnp.asarray(norms)


class ElementBasis:
    """Per-element basis transform applied lazily to any Vandermonde table.

    ``apply(V_table)`` maps a shared (nq, B) table to the per-element
    (N, nq, B) tensor ``V @ W_e * n_e`` (element.py:41-43 semantics: the same
    volume-derived weights/norms re-express every trace/derivative table).
    """

    def __init__(self, level, gt=None, var="u"):
        gt = gt if gt is not None else level.gt
        q = level.quad
        V = q.V_sol_int[var][var]
        wJ = np.asarray(gt[var]["e"]["J"]) * np.asarray(q.w_int_2d[var])[None, :]
        self.weights, self.norms = gram_schmidt_weights(V, wJ)

    def apply(self, table):
        table = jnp.asarray(table)
        return jnp.einsum("qb,nbc->nqc", table, self.weights) * self.norms[:, None, :]


def element_bases(level, gt=None, vars=("u",)):
    """{var: ElementBasis} for every requested solution variable, cached on
    ``level.element_basis``; None when the setting is off.

    Central construction point so operator-cache hits (which skip assembly)
    still leave the transform available to error evaluation / VTK export.
    The reference builds the u-basis transform in the Element ctor
    (element.py:33-43) and leaves Stokes explicitly unimplemented
    ("not yet transformed to multiple variables u,v,p"); here each variable
    gets its own transform under its own quadrature's physical inner
    product, so the Stokes path is supported too.
    """
    s = level.settings
    if not getattr(s.problem, "orthonormal_on_physical_element", False):
        level.element_basis = None
        return None
    cached = getattr(level, "element_basis", None) or {}
    if not all(v in cached for v in vars):
        cached = dict(cached)
        for v in vars:
            if v not in cached:
                cached[v] = ElementBasis(level, gt=gt, var=v)
        level.element_basis = cached
    return level.element_basis
