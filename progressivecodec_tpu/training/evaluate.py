"""Real-codec evaluation: compress -> decompress -> metrics per quality.

Behavioral spec: /root/reference/src/compress/training/step.py:277-404
(compress_with_ac): pad to /64, run the real coder at each quality in
pr_list, bpp from actual stream lengths, PSNR + MS-SSIM(dB), timings.
TPU-first: compress and decompress are each one device program; batching
over images instead of a per-image Python loop when shapes agree.
"""

from __future__ import annotations

import time
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.models.codec import Codec
from progressivecodec_tpu.ops.conv import pad_image, unpad_image
from progressivecodec_tpu.utils.metrics import psnr, ms_ssim_db


def evaluate_codec(
    codec: Codec,
    images: Iterable[np.ndarray],
    pr_list: Sequence[float] = (0.0, 10.0),
    mask_pol: str | None = None,
    verify_stream: bool = True,
) -> dict:
    """images: iterable of HWC float arrays in [0,1].

    Returns {"bpp": [per quality], "psnr": [...], "ms_ssim_db": [...],
    "enc_time": [...], "dec_time": [...], "n_images": int}.
    """
    k = len(pr_list)
    acc = {
        "bpp": np.zeros(k),
        "psnr": np.zeros(k),
        "ms_ssim_db": np.zeros(k),
        "enc_time": np.zeros(k),
        "dec_time": np.zeros(k),
    }
    n = 0
    for img in images:
        x = jnp.asarray(img, jnp.float32)[None]
        x_pad, pads = pad_image(x, 64)
        num_pixels = x.shape[1] * x.shape[2]
        for j, q in enumerate(pr_list):
            t0 = time.perf_counter()
            data = codec.compress(x_pad, quality=q, mask_pol=mask_pol)
            enc_t = time.perf_counter() - t0

            t0 = time.perf_counter()
            out = codec.decompress(data)
            x_hat = jax.block_until_ready(out["x_hat"])
            dec_t = time.perf_counter() - t0
            if verify_stream and not bool(out["stream_ok"]):
                raise RuntimeError(f"stream integrity failure at q={q}")

            x_hat = unpad_image(x_hat, pads)
            acc["bpp"][j] += data["num_bytes"] * 8.0 / num_pixels
            acc["psnr"][j] += float(psnr(x, x_hat))
            acc["ms_ssim_db"][j] += float(ms_ssim_db(x, x_hat))
            acc["enc_time"][j] += enc_t
            acc["dec_time"][j] += dec_t
        n += 1
    if n == 0:
        raise ValueError("no images")
    return {**{key: (v / n).tolist() for key, v in acc.items()}, "n_images": n}


def entropy_estimate_eval(
    codec: Codec,
    images: Iterable[np.ndarray],
    pr_list: Sequence[float] = (0.0, 10.0),
    mask_pol: str | None = None,
    lmbda_list: Sequence[float] | None = None,
) -> dict:
    """Likelihood-based bpp + PSNR (valid_epoch/test_epoch analog,
    step.py:153-267) — the cross-check partner of evaluate_codec.

    When lmbda_list is given, also returns "loss": the reference's
    validation criterion (step.py:187-189 — ScalableRateDistortionLoss on
    a single-quality forward reduces to bpp + 255^2 * mean(lmbda) * mse,
    loss.py:108-135) averaged over pr_list and images.  train.py:327-333
    steps ReduceLROnPlateau on exactly this scalar.
    """
    import math

    k = len(pr_list)
    bpp = np.zeros(k)
    ps = np.zeros(k)
    mses = np.zeros(k)
    n = 0
    for img in images:
        x = jnp.asarray(img, jnp.float32)[None]
        x_pad, pads = pad_image(x, 64)
        num_pixels = x.shape[1] * x.shape[2]
        denom = -math.log(2) * num_pixels
        for j, q in enumerate(pr_list):
            out = codec.forward_single_quality(x_pad, q, mask_pol)
            lik = out["likelihoods"]
            bpp[j] += float(
                jnp.sum(jnp.log(lik["y"])) / denom + jnp.sum(jnp.log(lik["z"])) / denom
            )
            x_hat = unpad_image(out["x_hat"], pads)
            ps[j] += float(psnr(x, x_hat))
            mses[j] += float(jnp.mean((x - x_hat) ** 2))
        n += 1
    result = {"bpp": (bpp / n).tolist(), "psnr": (ps / n).tolist(), "n_images": n}
    if lmbda_list is not None:
        lm = float(np.mean(lmbda_list))
        result["loss"] = float(np.mean(bpp / n + 255.0**2 * lm * (mses / n)))
    return result
