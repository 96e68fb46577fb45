"""Assembled-operator caching (reference: pickle caches in ``cache/``).

The reference pickles initialized grids and assembled systems keyed by
problem/size/p/sigma/coarsening in the filename and validates by
settings-dict equality (grid.py:96-148, discrete_system.py:29-50; README
flags pickle as a known limitation).  Here the assembled operator tensors
are stored as ``.npz`` (portable, no code execution on load) with a JSON
settings fingerprint, same key scheme, same validation semantics.
"""

import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np


def _fingerprint(settings):
    relevant = {k: settings.to_dict().get(k)
                for k in ("grid", "solution", "problem")}
    blob = json.dumps(relevant, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def cache_key(level, problem_type):
    name = f"discrete_system_{problem_type}_{level.Ni}X{level.Nj}" \
           f"_nPoly{level.P_grid}_pSol{level.P_sol['u']}"
    if level.settings.grid.circular:
        name += "_circle"
    if level.coarsening_factor:
        name += f"_coarsened_{level.coarsening_factor}"
    return name


def cache_dir():
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(repo, "cache", "discrete_system")
    os.makedirs(path, exist_ok=True)
    return path


def save_operator(level, problem_type, op, rhs, inv_mass=None):
    if not level.settings.caching.enabled:
        return None
    path = os.path.join(cache_dir(), cache_key(level, problem_type) + ".npz")
    payload = {
        "blocks": np.asarray(op.blocks),
        "nbr": np.asarray(op.nbr),
        "mask": np.asarray(op.mask),
        "fingerprint": np.frombuffer(
            _fingerprint(level.settings).encode(), dtype=np.uint8),
    }
    if rhs is not None:
        payload["rhs"] = np.asarray(rhs)
    if inv_mass is not None:
        payload["inv_mass"] = np.asarray(inv_mass)
    np.savez(path, **payload)
    return path


def load_operator(level, problem_type):
    """Returns (op, rhs, inv_mass) or None on miss/fingerprint mismatch."""
    if not level.settings.caching.enabled:
        return None
    path = os.path.join(cache_dir(), cache_key(level, problem_type) + ".npz")
    if not os.path.exists(path):
        return None
    data = np.load(path)
    stored = bytes(data["fingerprint"]).decode()
    if stored != _fingerprint(level.settings):
        # settings changed since the cache was written — same validation
        # failure mode as the reference's settings-equality asserts
        return None
    from dgtpu.ops.stencil import StencilOperator
    op = StencilOperator(jnp.asarray(data["blocks"]),
                         jnp.asarray(data["nbr"]), jnp.asarray(data["mask"]))
    rhs = jnp.asarray(data["rhs"]) if "rhs" in data else None
    inv_mass = jnp.asarray(data["inv_mass"]) if "inv_mass" in data else None
    return op, rhs, inv_mass
