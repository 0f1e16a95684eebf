"""Rate-distortion losses.

Behavioral spec: /root/reference/src/compress/training/loss.py — the exact
bpp accounting of ScalableRateDistortionLoss (loss.py:90-135): per-level
MSE vector weighted by lmbda_list; bpp = scalable + base + L*hyper where L
is the number of reconstruction levels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def scalable_rate_distortion_loss(output: dict, target: jax.Array, lmbda_list) -> dict:
    """output: dict from the progressive forward (x_hat stacked (L,B,H,W,3),
    likelihoods y/y_prog/z); target: (B,H,W,3)."""
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    denom = -math.log(2) * num_pixels
    lmbda = jnp.asarray(lmbda_list, dtype=jnp.float32)

    x_hat = output["x_hat"]
    levels = x_hat.shape[0]
    extend = jnp.broadcast_to(target[None], x_hat.shape)
    mse = jnp.mean((extend - x_hat) ** 2, axis=(1, 2, 3, 4))  # (levels,)

    lik = output["likelihoods"]
    bpp_hyper = jnp.sum(jnp.log(lik["z"])) / denom
    bpp_base = jnp.sum(jnp.log(lik["y"])) / denom
    if "y_prog" in lik:
        bpp_scalable = jnp.sum(jnp.log(lik["y_prog"])) / denom
    else:
        bpp_scalable = 0.0
    bpp_loss = bpp_scalable + bpp_base + levels * bpp_hyper

    loss = bpp_loss + (255.0**2) * jnp.mean(lmbda * mse)
    return {
        "loss": loss,
        "bpp_loss": bpp_loss,
        "bpp_base": bpp_base,
        "bpp_scalable": bpp_scalable,
        "bpp_hyper": bpp_hyper,
        "mse": mse,
    }


def rate_distortion_loss(output: dict, target: jax.Array, lmbda: float) -> dict:
    """Plain single-rate RD loss (loss.py:57-76) for the WACNN anchor."""
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    denom = -math.log(2) * num_pixels
    bpp = sum(jnp.sum(jnp.log(l)) / denom for l in output["likelihoods"].values())
    mse = jnp.mean((output["x_hat"] - target) ** 2)
    loss = lmbda * (255.0**2) * mse + bpp
    return {"loss": loss, "bpp_loss": bpp, "mse": mse}


def distortion_loss(output: dict, target: jax.Array) -> dict:
    """MSE-only objective (loss.py:410-454) used for decoder fine-tune."""
    x_hat = output["x_hat"]
    if x_hat.ndim == target.ndim + 1:
        extend = jnp.broadcast_to(target[None], x_hat.shape)
        mse = jnp.mean((extend - x_hat) ** 2)
    else:
        mse = jnp.mean((x_hat - target) ** 2)
    return {"loss": (255.0**2) * mse, "mse": mse}


def latent_loss(y_hat: jax.Array, y_ref: jax.Array) -> dict:
    """Frobenius latent-matching (loss.py:463-523) for REM training."""
    diff = jnp.sum((y_hat - y_ref) ** 2, axis=(1, 2, 3))
    loss = jnp.mean(jnp.sqrt(diff + 1e-12))
    return {"loss": loss}


def mask_rate_distortion_loss(output: dict, target: jax.Array, lmbda: float) -> dict:
    """Mask-training RD loss (loss.py:6-53): MSE of the LAST reconstruction
    level only + scalable bpp (hyper counted once)."""
    b, h, w, _ = target.shape
    num_pixels = b * h * w
    denom = -math.log(2) * num_pixels
    x_hat = output["x_hat"]
    last = x_hat[-1] if x_hat.ndim == target.ndim + 1 else x_hat
    mse = jnp.mean((last - target) ** 2)
    lik = output["likelihoods"]
    bpp_hyper = jnp.sum(jnp.log(lik["z"])) / denom
    if "y_prog" in lik:
        bpp_scalable = jnp.sum(jnp.log(lik["y_prog"])) / denom
        bpp_loss = bpp_scalable + bpp_hyper
    else:
        bpp_loss = jnp.sum(jnp.log(lik["y"])) / denom * 0.0 + bpp_hyper
    loss = bpp_loss + (255.0**2) * lmbda * mse
    return {"loss": loss, "bpp_loss": bpp_loss, "mse": mse}


def _kd_terms(output: dict, target: jax.Array, teacher_enh, teacher_base=None) -> dict:
    """Latent knowledge-distillation MSE terms vs frozen teacher encoders
    (loss.py:163-181).  `teacher_*` are callables target -> latent."""
    out = {}
    y_hat = output["y_hat"]
    y_enh = y_hat[1] if isinstance(y_hat, (list, tuple)) else y_hat
    out["kd_enh"] = jnp.mean((y_enh - teacher_enh(target)) ** 2)
    if teacher_base is not None:
        y_base = y_hat[0] if isinstance(y_hat, (list, tuple)) else output["y_base"]
        out["kd_base"] = jnp.mean((y_base - teacher_base(target)) ** 2)
    return out


def scalable_distilled_rate_distortion_loss(
    output: dict,
    target: jax.Array,
    lmbda_list,
    teacher_enh,
    teacher_base=None,
    gamma: float = 0.5,
) -> dict:
    """RD loss + latent distillation (loss.py:140-232): the scalable RD
    objective plus gamma-weighted teacher-latent MSE terms."""
    out = scalable_rate_distortion_loss(output, target, lmbda_list)
    kd = _kd_terms(output, target, teacher_enh, teacher_base)
    out.update(kd)
    lm = jnp.asarray(lmbda_list, jnp.float32)
    loss = out["loss"] + kd["kd_enh"] * (lm[-1] * gamma)
    if teacher_base is not None:
        loss = loss + kd["kd_base"] * (lm[0] * gamma)
    out["loss"] = loss
    return out


def distilled_rate_loss(
    output: dict, target: jax.Array, lmbda_list, teacher_enh
) -> dict:
    """Rate + distillation only (loss.py:237-316)."""
    out = scalable_rate_distortion_loss(output, target, lmbda_list)
    kd = _kd_terms(output, target, teacher_enh)
    lm = jnp.asarray(lmbda_list, jnp.float32)
    out.update(kd)
    out["loss"] = out["bpp_loss"] + (255.0**2) * lm[-1] * kd["kd_enh"]
    return out


def scalable_distilled_distortion_loss(
    output: dict,
    target: jax.Array,
    lmbda_list,
    teacher_enh,
    teacher_base=None,
    gamma: float = 0.5,
) -> dict:
    """gamma * RD + (1-gamma) * distillation (loss.py:320-405)."""
    out = scalable_rate_distortion_loss(output, target, lmbda_list)
    kd = _kd_terms(output, target, teacher_enh, teacher_base)
    out.update(kd)
    if teacher_base is not None:
        out["loss"] = gamma * out["loss"] + (1 - gamma) * (kd["kd_enh"] + kd["kd_base"])
    else:
        out["loss"] = gamma * out["loss"] + (1 - gamma) * kd["kd_enh"]
    return out


def rate_loss(output: dict, target_shape, levels: int) -> dict:
    """Rate-only objective (loss.py:527-567)."""
    b, h, w = target_shape[0], target_shape[1], target_shape[2]
    denom = -math.log(2) * (b * h * w)
    lik = output["likelihoods"]
    bpp = jnp.sum(jnp.log(lik["y"])) / denom + levels * jnp.sum(jnp.log(lik["z"])) / denom
    if "y_prog" in lik:
        bpp = bpp + jnp.sum(jnp.log(lik["y_prog"])) / denom
    return {"loss": bpp, "bpp_loss": bpp}
