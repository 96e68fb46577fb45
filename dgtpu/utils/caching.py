"""Assembled-operator caching (reference: pickle caches in ``cache/``).

The reference pickles initialized grids and assembled systems keyed by
problem/size/p/sigma/coarsening in the filename and validates by
settings-dict equality (grid.py:96-148, discrete_system.py:29-50; README
flags pickle as a known limitation).  Here the assembled operator tensors
are stored as ``.npz`` (portable, no code execution on load) with a JSON
settings fingerprint, same key scheme, same validation semantics.

Every level of the hierarchy is cacheable (the reference caches each
``Grid``/``DiscreteSystem`` it builds), for both Poisson and Stokes.  The
fingerprint covers the grid/solution/problem sections *and* the per-level
assembly inputs (sigma, gamma, P_sol, discretization) — sigma in
particular is derived from ``solver.multigrid.penalty parameter
coarsening.multipliers``, so changing the multipliers must invalidate the
cache even though the three sections are unchanged.
"""

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np


def _fingerprint(level):
    settings = level.settings
    relevant = {k: settings.to_dict().get(k)
                for k in ("grid", "solution", "problem")}
    # per-level assembly inputs not derivable from the three sections
    relevant["_level"] = {
        "sigma": float(level.sigma),
        "gamma": float(level.gamma) if level.gamma is not None else None,
        "P_sol": {k: int(v) for k, v in level.P_sol.items()},
        "discretization": level.discretization,
        "coarsening_factor": level.coarsening_factor,
    }
    blob = json.dumps(relevant, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def cache_key(level, problem_type):
    p_sol = "_".join(f"p{v}{level.P_sol[v]}" for v in sorted(level.P_sol))
    sigma = f"{float(level.sigma):g}".replace(".", "_")
    name = (f"discrete_system_{problem_type}_{level.Ni}X{level.Nj}"
            f"_nPoly{level.P_grid}_{p_sol}_sigma{sigma}")
    if level.discretization != "dg":
        name += f"_{level.discretization}"
    if problem_type == "Stokes":
        name += f"_{level.settings.solution.ordering}"
    if level.settings.grid.circular:
        name += "_circle"
    if level.coarsening_factor:
        name += f"_coarsened_{level.coarsening_factor}"
    return name


def _repo_cache_dir(sub):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, "cache", sub)
    os.makedirs(path, exist_ok=True)
    return path


def cache_dir():
    return _repo_cache_dir("discrete_system")


def _atomic_savez(path, **payload):
    """Write the npz to a temp file in the same directory, then rename.

    ``os.replace`` is atomic on POSIX, so a concurrent reader (parallel
    pytest workers, a dryrun sharing the cache with an in-flight bench)
    sees either the old file or the complete new one — never a truncated
    zip that makes ``np.load`` raise mid-solve."""
    # the tmp name must keep the .npz suffix: np.savez appends it otherwise
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _cache_path(level, problem_type):
    return os.path.join(cache_dir(), cache_key(level, problem_type) + ".npz")


def _with_fingerprint(level, payload):
    payload["fingerprint"] = np.frombuffer(
        _fingerprint(level).encode(), dtype=np.uint8)
    return payload


def _load_validated(level, problem_type):
    """The npz dict, or None on miss / fingerprint mismatch."""
    if not level.settings.caching.enabled:
        return None
    path = _cache_path(level, problem_type)
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path)
    except Exception:
        # corrupt/legacy partial write: treat as a miss and reassemble
        return None
    stored = bytes(data["fingerprint"]).decode()
    if stored != _fingerprint(level):
        # settings changed since the cache was written — same validation
        # failure mode as the reference's settings-equality asserts
        return None
    return data


def save_operator(level, problem_type, op, rhs, inv_mass=None):
    if not level.settings.caching.enabled:
        return None
    path = _cache_path(level, problem_type)
    payload = _with_fingerprint(level, {
        "blocks": np.asarray(op.blocks),
        "nbr": np.asarray(op.nbr),
        "mask": np.asarray(op.mask),
    })
    if rhs is not None:
        payload["rhs"] = np.asarray(rhs)
    if inv_mass is not None:
        payload["inv_mass"] = np.asarray(inv_mass)
    _atomic_savez(path, **payload)
    return path


def load_operator(level, problem_type):
    """Returns (op, rhs, inv_mass) or None on miss/fingerprint mismatch."""
    data = _load_validated(level, problem_type)
    if data is None:
        return None
    from dgtpu.ops.stencil import StencilOperator
    op = StencilOperator(jnp.asarray(data["blocks"]),
                         jnp.asarray(data["nbr"]), jnp.asarray(data["mask"]))
    rhs = jnp.asarray(data["rhs"]) if "rhs" in data else None
    inv_mass = jnp.asarray(data["inv_mass"]) if "inv_mass" in data else None
    return op, rhs, inv_mass


def _grid_cache_dir():
    return _repo_cache_dir("grid")


def _grid_key(x, y, Ni, Nj, p_grid, tag):
    """Content-addressed key: the node-coordinate hash IS the fingerprint
    (reference grid.py:96-148 pickles initialized grids and validates by
    settings equality; hashing the coordinates subsumes that for the
    geometry-only arrays cached here)."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(x).tobytes())
    h.update(np.ascontiguousarray(y).tobytes())
    return f"{tag}_{Ni}X{Nj}_nPoly{p_grid}_{h.hexdigest()[:16]}"


def load_element_coords(settings, x, y, Ni, Nj, p_grid, tag="el_coords"):
    """Cached per-element nodal coordinates (X, Y) or None."""
    if not settings.caching.enabled:
        return None
    path = os.path.join(_grid_cache_dir(),
                        _grid_key(x, y, Ni, Nj, p_grid, tag) + ".npz")
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path)
        return data["X"], data["Y"]
    except Exception:
        # corrupt/legacy partial write: recompute (the next save replaces it)
        return None


def save_element_coords(settings, x, y, Ni, Nj, p_grid, X, Y,
                        tag="el_coords"):
    if not settings.caching.enabled:
        return None
    path = os.path.join(_grid_cache_dir(),
                        _grid_key(x, y, Ni, Nj, p_grid, tag) + ".npz")
    _atomic_savez(path, X=np.asarray(X), Y=np.asarray(Y))
    return path


def save_stokes_parts(level, A_blocks, D_blocks, G_blocks, rhs_local, epsilon):
    """Cache the ordering-independent Stokes pieces (pre-pin, local-order rhs).

    The pressure pin and the global/local operator layout are cheap to
    rebuild at load; the expensive einsum assembly and the sympy Epsilon
    integral are what's stored (reference: discrete_system.py:29-50 caches
    the assembled system per problem).
    """
    if not level.settings.caching.enabled:
        return None
    path = _cache_path(level, "Stokes")
    payload = _with_fingerprint(level, {
        "A_blocks": np.asarray(A_blocks),
        "D_blocks": np.asarray(D_blocks),
        "G_blocks": np.asarray(G_blocks),
        "nbr": np.asarray(level.nbr),
        "mask": np.asarray(level.nbr_mask),
    })
    if rhs_local is not None:
        payload["rhs_local"] = np.asarray(rhs_local)
    if epsilon is not None:
        payload["epsilon"] = np.asarray(epsilon)
    _atomic_savez(path, **payload)
    return path


def load_stokes_parts(level):
    """(A_blocks, D_blocks, G_blocks, rhs_local, epsilon) or None."""
    data = _load_validated(level, "Stokes")
    if data is None:
        return None
    rhs = jnp.asarray(data["rhs_local"]) if "rhs_local" in data else None
    eps = float(data["epsilon"]) if "epsilon" in data else None
    return (jnp.asarray(data["A_blocks"]), jnp.asarray(data["D_blocks"]),
            jnp.asarray(data["G_blocks"]), rhs, eps)
