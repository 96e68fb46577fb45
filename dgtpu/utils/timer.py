"""Wall-clock timing (context manager + decorator), reference ``utils/timer.py``.

Adds ``block`` support: on accelerator backends timing a traced computation
requires ``jax.block_until_ready`` on its outputs; callers pass the result
through :func:`synchronize` before reading ``elapsed()``.
"""

import time
from functools import wraps

import jax


def synchronize(x):
    """Block until all device computations producing ``x`` are done."""
    return jax.block_until_ready(x)


class Timer:
    def __init__(self, logger=None):
        self.logger = logger
        self._t0 = None
        self._t1 = None

    def __enter__(self):
        self._t0 = time.perf_counter_ns()
        return self

    def __exit__(self, *exc):
        self._t1 = time.perf_counter_ns()
        return False

    def elapsed(self):
        """Elapsed seconds between enter and exit (or now if still running)."""
        t1 = self._t1 if self._t1 is not None else time.perf_counter_ns()
        return (t1 - self._t0) / 1e9

    def timeit(self, fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            with self as t:
                out = fn(*args, **kwargs)
            if self.logger:
                self.logger.debug(f"{fn.__name__} took {t.elapsed():.4g} seconds")
            return out
        return wrapper
