"""Device-placement policy.

Setup (geometry, assembly, factorizations) always runs on the host CPU
backend: it executes once, is dominated by many small eager ops, and on a
tunneled TPU every eager dispatch would pay a remote compile.  The solver
hot loops are then explicitly placed on the accelerator by moving the
operator pytrees (StencilOperator / StokesGlobalOperator / TransferOp) and
vectors; jit follows the committed inputs.
"""

import json
import os
import subprocess
import sys
import time

import jax


def _probe_cache_path(require):
    """Disk location of the backend-probe memo (repo cache/ dir)."""
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "cache",
        f"backend_probe_{require or 'default'}.json")


def backend_reachable(timeout_s=420, require=None, cache_ttl_s=1200):
    """True if default-backend initialization completes, probed safely.

    Remote-accelerator plugins (the experimental axon TPU tunnel) block
    inside C++ backend initialization for minutes and then abort when
    their transport is down — not cleanly catchable in-process.  The
    probe runs in a killable subprocess; ``require='tpu'`` additionally
    demands that platform.  On plain-CPU machines this returns True
    quickly (unless ``require`` says otherwise).

    The result is memoized on disk for ``cache_ttl_s`` (the subprocess is
    a *full* remote backend bring-up — measured 333 s when the tunnel is
    up and the whole ``timeout_s`` when it is down — and bench/entry/CLI
    each launch fresh processes back to back).  Pass ``cache_ttl_s=0`` to
    force a live probe.
    """
    cache = _probe_cache_path(require)
    if cache_ttl_s:
        try:
            with open(cache) as f:
                memo = json.load(f)
            if time.time() - float(memo["ts"]) < cache_ttl_s:
                return bool(memo["ok"])
        except (OSError, ValueError, KeyError):
            pass

    code = "import jax; d = jax.devices()"
    if require:
        code += f"; assert d[0].platform == '{require}'"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        ok = r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        ok = False

    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        tmp = f"{cache}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"ts": time.time(), "ok": ok}, f)
        os.replace(tmp, cache)
    except OSError:  # read-only checkout: the probe still works, uncached
        pass
    return ok


_BACKEND_PROBE = None     # process-wide memo: the tunnel state won't flip
                          # between solves within one CLI invocation


def ensure_reachable_backend(logger=None):
    """Fall back to the CPU backend when the default one is unreachable.

    Returns True if the default backend is usable, False after falling
    back.  Call BEFORE any JAX API touches the backend.  No-op when a
    platform is already pinned (tests' conftest, the CLI ``--backend``
    flag): an explicit choice is trusted, and the subprocess probe would
    check the UNPINNED default — wrong and slow."""
    global _BACKEND_PROBE
    # the remote plugin registers itself into jax_platforms ('axon,cpu')
    # even when nothing pinned a platform, so "is a platform set" cannot
    # distinguish an explicit choice; probe exactly when the remote
    # plugin would be tried first, trust everything else (tests pin
    # 'cpu'; a local TPU initializes without a transport)
    platforms = str(jax.config.jax_platforms or "")
    if not platforms.startswith("axon"):
        return True
    if _BACKEND_PROBE is None:
        _BACKEND_PROBE = backend_reachable()
    if _BACKEND_PROBE:
        return True
    if logger is not None:
        logger.warning("default JAX backend unreachable (remote tunnel "
                       "down?); falling back to CPU")
    jax.config.update("jax_platforms", "cpu")
    return False


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
