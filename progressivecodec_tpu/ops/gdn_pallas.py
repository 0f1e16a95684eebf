"""Fused GDN Pallas kernel: square -> MXU matmul -> rsqrt -> scale.

SURVEY.md §7.1 marks GDN as the fused-kernel candidate: the XLA path
materializes x^2 and the norm tensor in HBM between ops; this kernel keeps
the whole y = x * (beta + (x^2) @ gamma^T)^(-+1/2) chain in VMEM per tile.
Forward is Pallas; backward recomputes in plain XLA (cheap relative to
fwd) via custom_vjp.

Used when `use_pallas_gdn(True)` is enabled and the array is TPU-resident;
falls back to the jnp path otherwise (CPU tests run the kernel in
interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_ENABLED = False


def use_pallas_gdn(on: bool = True):
    global _ENABLED
    _ENABLED = on


def pallas_gdn_enabled() -> bool:
    return _ENABLED


def _kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    norm = (
        jnp.dot(x * x, gamma_ref[:], preferred_element_type=jnp.float32)
        + beta_ref[:]
    )
    if inverse:
        out_ref[:] = x * jnp.sqrt(norm)
    else:
        out_ref[:] = x * jax.lax.rsqrt(norm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gdn_fused(x2d, gamma_t, beta, inverse: bool, interpret: bool):
    """x2d: (M, C) f32; gamma_t: (C, C) already transposed so that
    norm = (x^2) @ gamma_t + beta; beta: (C,)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2d.shape
    tile_m = 512 if m % 512 == 0 else (256 if m % 256 == 0 else m)
    grid = (m // tile_m,)
    return pl.pallas_call(
        functools.partial(_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, gamma_t, beta)


def _fwd(x2d, gamma_t, beta, inverse, interpret):
    out = gdn_fused(x2d, gamma_t, beta, inverse, interpret)
    return out, (x2d, gamma_t, beta)


def _bwd(inverse, interpret, res, g):
    # plain-XLA recompute backward: norm = x^2 @ Gt + beta
    x, gamma_t, beta = res
    norm = jnp.dot(x * x, gamma_t, preferred_element_type=jnp.float32) + beta
    if inverse:
        s = jnp.sqrt(norm)
        # y = x * s ; dy/dx = s + x * (x @ sym term)
        dx_direct = g * s
        dnorm = g * x * (0.5 / s)
    else:
        r = jax.lax.rsqrt(norm)
        dx_direct = g * r
        dnorm = g * x * (-0.5 * r / norm)
    # norm_j = sum_k x_k^2 Gt[k, j] + beta_j
    dx_norm = 2.0 * x * jnp.dot(dnorm, gamma_t.T, preferred_element_type=jnp.float32)
    dgamma_t = jnp.dot((x * x).T, dnorm, preferred_element_type=jnp.float32)
    dbeta = jnp.sum(dnorm, axis=0)
    return dx_direct + dx_norm, dgamma_t, dbeta


gdn_fused.defvjp(_fwd, _bwd)


def gdn_apply_fused(x, gamma, beta, inverse: bool, interpret: bool = False):
    """NHWC wrapper: x (B,H,W,C), gamma (C_out, C_in) as in layers.GDN."""
    b, h, w, c = x.shape
    x2d = x.reshape(-1, c).astype(jnp.float32)
    out = gdn_fused(x2d, gamma.T.astype(jnp.float32), beta.astype(jnp.float32), inverse, interpret)
    return out.reshape(b, h, w, c)
