"""Unit tests for dgtpu.utils.jitting.const_jit.

const_jit is the compile-model linchpin: every internal jit boundary
(multigrid solve loops, fused Pallas cycles, refinement drivers) now routes
through it so that closure-captured operator hierarchies become runtime
parameters instead of HLO literal constants (see dgtpu/utils/jitting.py for
the why).  These tests pin its contract: numerics identical to jax.jit,
closure constants hoisted out of the lowered module, trace caching per
argument signature, and pytree outputs preserved.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgtpu.utils.jitting import const_jit


def test_matches_jax_jit_numerics():
    A = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)))

    def f(x):
        return A @ x + jnp.sin(x)

    x = jnp.linspace(0.0, 1.0, 16)
    np.testing.assert_allclose(const_jit(f)(x), jax.jit(f)(x), rtol=0, atol=0)


def test_closure_constants_become_parameters():
    # a large closure-captured array must NOT appear as a literal in the
    # lowered HLO text — that is the entire point of the wrapper
    big = jnp.asarray(np.arange(4096, dtype=np.float64).reshape(64, 64))

    def f(x):
        return big @ x

    cj = const_jit(f)
    x = jnp.ones((64,))
    hlo = cj.lower(x).as_text()
    # baked literals dominate the HLO text size; hoisted ones don't
    baked = jax.jit(f).lower(x).as_text()
    assert len(hlo) < len(baked), (len(hlo), len(baked))
    np.testing.assert_allclose(cj(x), f(x))


def test_trace_cache_per_signature():
    calls = []

    def f(x):
        calls.append(1)
        return x * 2.0

    cj = const_jit(f)
    cj(jnp.ones((4,)))
    # note: jnp.full((4,), 3.0) would be weak-typed — a *different* signature
    # (jax.jit retraces there too), so scale a non-weak array instead
    cj(jnp.ones((4,)) * 3.0)
    assert len(calls) == 1  # same signature: one trace
    cj(jnp.ones((8,)))
    assert len(calls) == 2  # new shape: retrace


def test_pytree_inputs_and_outputs():
    def f(pair, scale):
        a, b = pair
        return {"sum": a + b, "scaled": (a * scale, b * scale)}

    cj = const_jit(f)
    a, b = jnp.ones((3,)), jnp.arange(3.0)
    out = cj((a, b), jnp.float64(2.0))
    np.testing.assert_allclose(out["sum"], a + b)
    np.testing.assert_allclose(out["scaled"][0], a * 2.0)
    np.testing.assert_allclose(out["scaled"][1], b * 2.0)


def test_while_loop_with_captured_operator():
    # the shape every solver driver uses: a while_loop closing over an
    # operator, wrapped in const_jit
    A = jnp.eye(8) * 0.5

    def run(rhs):
        def cond(state):
            u, n = state
            return n < 10

        def body(state):
            u, n = state
            return u + (rhs - A @ u), n + 1

        u, n = jax.lax.while_loop(cond, body, (jnp.zeros_like(rhs), 0))
        return u, n

    rhs = jnp.ones((8,))
    u, n = const_jit(run)(rhs)
    u2, n2 = jax.jit(run)(rhs)
    np.testing.assert_allclose(u, u2)
    assert int(n) == int(n2) == 10
