"""Device-placement policy.

Setup (geometry, assembly, factorizations) always runs on the host CPU
backend: it executes once, is dominated by many small eager ops, and on a
tunneled TPU every eager dispatch would pay a remote compile.  The solver
hot loops are then explicitly placed on the accelerator by moving the
operator pytrees (StencilOperator / StokesGlobalOperator / TransferOp) and
vectors; jit follows the committed inputs.
"""

import jax


def cpu_device():
    return jax.devices("cpu")[0]


def default_compute_device(settings=None):
    """The device the solve should run on ('auto' = default backend)."""
    name = "auto"
    if settings is not None:
        perf = getattr(settings, "performance", None)
        name = getattr(perf, "device", "auto") if perf else "auto"
    if name == "auto":
        return jax.devices()[0]
    return jax.devices(name)[0]


def put_tree(tree, device):
    """device_put every jax array leaf of a pytree / plain object."""
    if tree is None:
        return None
    return jax.device_put(tree, device)


def put_transfer(t, device):
    t.R = jax.device_put(t.R, device)
    t.P = jax.device_put(t.P, device)
    return t


def setup_scope():
    """Context manager placing eager setup computation on the host CPU."""
    return jax.default_device(cpu_device())
