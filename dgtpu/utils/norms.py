"""Error / residual norms with the reference's size-normalized convention.

The reference defines ``Lp = (sum(|d|^p)/n)^(1/p)`` (``utils/helpers.py:16-26``)
— note the division by the element count — and all logged residuals and MMS
errors use it.  Implemented for both numpy and jax arrays.
"""

import jax.numpy as jnp


def lp_norm(delta, p=2):
    """Size-normalized Lp norm: ``(sum(|delta|**p)/delta.size)**(1/p)``."""
    delta = jnp.asarray(delta)
    return (jnp.sum(jnp.abs(delta) ** p) / delta.size) ** (1.0 / p)


def residual_norm(operator, u, rhs, p=2):
    """``Lp(rhs - A @ u)`` for any object with a ``matvec``."""
    return lp_norm(rhs - operator.matvec(u), p)
