"""Core autograd ops: straight-through rounding, bounded max, reparam.

Behavioral spec from the reference (semantics only, fresh implementation):
  * ste_round — `round(x)` forward, identity gradient
    (/root/reference/src/compress/ops/ops.py:20-34)
  * lower_bound — `max(x, bound)` forward; gradient passes through when
    `x >= bound` or when the incoming gradient pushes x upward (g < 0)
    (/root/reference/src/compress/ops/bound_ops.py:21-27)
  * nonneg_reparam — `lower_bound(x, b)^2 - pedestal` with
    pedestal = (2^-18)^2, b = sqrt(minimum + pedestal)
    (/root/reference/src/compress/ops/parametrizers.py:32-49)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

REPARAM_OFFSET = 2.0**-18
PEDESTAL = REPARAM_OFFSET**2


def ste_round(x: jax.Array) -> jax.Array:
    """Round with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@jax.custom_vjp
def lower_bound(x: jax.Array, bound) -> jax.Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def nonneg_reparam(x: jax.Array, minimum: float = 0.0) -> jax.Array:
    """Map an unconstrained parameter to a non-negative value (>= minimum)."""
    bound = (minimum + PEDESTAL) ** 0.5
    out = lower_bound(x, bound)
    return out * out - PEDESTAL


def nonneg_init(x: jax.Array) -> jax.Array:
    """Inverse of :func:`nonneg_reparam` for parameter initialization."""
    return jnp.sqrt(jnp.maximum(x + PEDESTAL, PEDESTAL))
