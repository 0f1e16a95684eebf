"""Fused GDN Pallas kernel vs the jnp reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.ops.gdn_pallas import gdn_apply_fused, gdn_fused
from progressivecodec_tpu.ops.math import nonneg_reparam


def _reference(x, gamma, beta, inverse):
    norm = jnp.einsum("bhwj,oj->bhwo", x * x, gamma) + beta
    return x * jnp.sqrt(norm) if inverse else x * jax.lax.rsqrt(norm)


def test_gdn_fused_matches_reference(rng):
    b, h, w, c = 2, 4, 8, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    gamma = jnp.asarray(0.1 * np.eye(c, dtype=np.float32) + 0.01 * rng.random((c, c)).astype(np.float32))
    beta = jnp.asarray(1.0 + rng.random(c).astype(np.float32))
    for inverse in (False, True):
        got = gdn_apply_fused(x, gamma, beta, inverse, interpret=True)
        ref = _reference(x, gamma, beta, inverse)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6)


def test_gdn_fused_gradients(rng):
    m, c = 8, 128
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    gt = jnp.asarray((0.1 * np.eye(c) + 0.01 * rng.random((c, c))).astype(np.float32))
    beta = jnp.asarray(1.0 + rng.random(c).astype(np.float32))

    def f_fused(x, gt, beta):
        return jnp.sum(gdn_fused(x, gt, beta, False, True) ** 2)

    def f_ref(x, gt, beta):
        norm = jnp.dot(x * x, gt) + beta
        return jnp.sum((x * jax.lax.rsqrt(norm)) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, gt, beta)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, gt, beta)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
