"""MS-SSIM oracle cross-validation (VERDICT round-2 weak #7).

utils/metrics.ms_ssim is a fresh Wang-2003 implementation and a headline
BASELINE metric; a wrong normalization would silently corrupt it.  This
vendors the standard math independently in torch f64 (depthwise conv2d,
valid padding, 2x2 mean pool between scales — the pytorch_msssim
formulation the reference uses, training/step.py metrics) and compares on
natural-statistics images at several degradation levels.

Acceptance: |delta MS-SSIM| <= 1e-4 across 10 images x 3 degradations.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from progressivecodec_tpu.utils.metrics import ms_ssim, psnr

torch.set_default_dtype(torch.float64)

_WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def _torch_gaussian_win(size=11, sigma=1.5):
    g = torch.exp(-0.5 * ((torch.arange(size) - size // 2) / sigma) ** 2)
    g = g / g.sum()
    return torch.outer(g, g)


def torch_ms_ssim(x, y, max_val=1.0):
    """x, y: (B, C, H, W) f64 — independent Wang-2003 implementation."""
    win = _torch_gaussian_win()
    c = x.shape[1]
    w = win[None, None].repeat(c, 1, 1, 1)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    vals = []
    for i, weight in enumerate(_WEIGHTS):
        mu_x = F.conv2d(x, w, groups=c)
        mu_y = F.conv2d(y, w, groups=c)
        sxx = F.conv2d(x * x, w, groups=c) - mu_x**2
        syy = F.conv2d(y * y, w, groups=c) - mu_y**2
        sxy = F.conv2d(x * y, w, groups=c) - mu_x * mu_y
        cs = (2 * sxy + c2) / (sxx + syy + c2)
        ssim = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
        if i == len(_WEIGHTS) - 1:
            vals.append(torch.clamp(ssim.mean(), min=0.0) ** weight)
        else:
            vals.append(torch.clamp(cs.mean(), min=0.0) ** weight)
            x = F.avg_pool2d(x, 2)
            y = F.avg_pool2d(y, 2)
    out = torch.ones(())
    for v in vals:
        out = out * v
    return float(out)


def _natural_image(rng, h=256, w=256):
    """1/f-statistics image: lowpass-filtered noise, normalized to [0,1]."""
    noise = rng.standard_normal((h, w, 3))
    fx = np.fft.fftfreq(h)[:, None]
    fy = np.fft.fftfreq(w)[None, :]
    amp = 1.0 / np.maximum(np.sqrt(fx**2 + fy**2), 1.0 / max(h, w))
    img = np.real(np.fft.ifft2(np.fft.fft2(noise, axes=(0, 1)) * amp[..., None], axes=(0, 1)))
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)


def test_ms_ssim_matches_torch_oracle(rng):
    degradations = [0.01, 0.05, 0.15]
    max_err = 0.0
    for k in range(10):
        img = _natural_image(rng)
        sigma = degradations[k % 3]
        noisy = np.clip(
            img + sigma * rng.standard_normal(img.shape).astype(np.float32), 0, 1
        )
        ours = float(ms_ssim(jnp.asarray(img[None]), jnp.asarray(noisy[None])))
        ref = torch_ms_ssim(
            torch.from_numpy(img[None]).permute(0, 3, 1, 2).double(),
            torch.from_numpy(noisy[None]).permute(0, 3, 1, 2).double(),
        )
        max_err = max(max_err, abs(ours - ref))
    assert max_err <= 1e-4, f"MS-SSIM deviates from oracle by {max_err}"


def test_psnr_definition(rng):
    img = _natural_image(rng, 64, 64)
    noisy = np.clip(img + 0.1 * rng.standard_normal(img.shape).astype(np.float32), 0, 1)
    ours = float(psnr(jnp.asarray(img[None]), jnp.asarray(noisy[None])))
    mse = float(np.mean((img.astype(np.float64) - noisy.astype(np.float64)) ** 2))
    assert abs(ours - 10 * np.log10(1.0 / mse)) < 1e-3


def test_ms_ssim_stable_under_low_matmul_precision(rng):
    """Round-4 regression (VERDICT weak #2): on TPU the depthwise SSIM
    filters ran at default precision (bf16 inputs on the MXU), and the
    variance cancellation E[x^2]-mu^2 produced garbage ms_ssim_db (7.5 <->
    52.8 dB swings).  _filter2 now pins Precision.HIGHEST; under a forced
    low default_matmul_precision the metric must match the default-mode
    value closely.  (CPU analog of the TPU bf16 matmul mode.)"""
    import jax

    img = _natural_image(rng)
    noisy = np.clip(
        img + 0.05 * rng.standard_normal(img.shape).astype(np.float32), 0, 1
    )
    a, b = jnp.asarray(img[None]), jnp.asarray(noisy[None])
    ref = float(ms_ssim(a, b))
    with jax.default_matmul_precision("bfloat16"):
        low = float(jax.jit(ms_ssim)(a, b))
    assert abs(ref - low) < 1e-4, (ref, low)
