"""Image quality metrics: PSNR and MS-SSIM, pure JAX.

The reference relies on pytorch_msssim (training/step.py metrics); this is
a fresh implementation of the standard MS-SSIM (Wang et al. 2003): 5
scales, 11x11 Gaussian window sigma 1.5, weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333], K=(0.01, 0.03).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2(x: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise valid-mode 2D filter; x NHWC.

    precision=HIGHEST is load-bearing: at TPU default precision this conv
    runs in bf16, and SSIM's variance terms E[x^2]-mu^2 are catastrophic
    cancellations — bf16's 8 mantissa bits turned the round-4 ladder's
    ms_ssim_db column into noise (7.5 <-> 52.8 dB swings on identical
    images) while PSNR, a plain mean, was immune.
    """
    c = x.shape[-1]
    k = win.shape[0]
    w = jnp.tile(win[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def _ssim_pair(x, y, win, max_val):
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _filter2(x, win)
    mu_y = _filter2(y, win)
    sxx = _filter2(x * x, win) - mu_x**2
    syy = _filter2(y * y, win) - mu_y**2
    sxy = _filter2(x * y, win) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ms_ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """a, b: (B,H,W,C) in [0, max_val]; returns scalar MS-SSIM."""
    win = jnp.asarray(_gaussian_kernel())
    x = a.astype(jnp.float32)
    y = b.astype(jnp.float32)
    vals = []
    for i, w in enumerate(_MSSSIM_WEIGHTS):
        ssim, cs = _ssim_pair(x, y, win, max_val)
        if i == len(_MSSSIM_WEIGHTS) - 1:
            vals.append(jnp.maximum(ssim, 0.0) ** w)
        else:
            vals.append(jnp.maximum(cs, 0.0) ** w)
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    return jnp.prod(jnp.stack(vals))


def ms_ssim_db(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """-10 log10(1 - MS-SSIM) — the dB form used in the reference's eval
    (step.py:351)."""
    v = ms_ssim(a, b, max_val)
    return -10.0 * jnp.log10(jnp.maximum(1.0 - v, 1e-12))
