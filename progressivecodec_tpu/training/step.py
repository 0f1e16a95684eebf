"""Functional train/eval steps.

Behavioral spec: /root/reference/src/compress/training/step.py:28-267
(joint multi-quality forward or sampled single quality, loss backward,
aux optimizer on quantiles, grad clip, entropy-estimated eval bpp).
TPU-first: one pure jit-able step, shardable with jax.sharding.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from progressivecodec_tpu.config import TrainConfig
from progressivecodec_tpu.training.loss import scalable_rate_distortion_loss
from progressivecodec_tpu.training.optim import make_optimizer_scheduled


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(model, rng, train_cfg: TrainConfig, sample_shape=(1, 256, 256, 3)):
    # jit the init: flax init otherwise dispatches each op eagerly, which
    # is pathological on remote-compile backends
    variables = jax.jit(lambda r, x: model.init({"params": r}, x, training=False))(
        rng, jnp.zeros(sample_shape)
    )
    params = variables["params"]
    # scheduled variant so the host-side plateau scheduler (train.py:276's
    # ReduceLROnPlateau analog) can scale lr via optim.set_lr_scale
    tx = make_optimizer_scheduled(train_cfg.lr, train_cfg.aux_lr, train_cfg.clip_max_norm)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(0)), tx


def make_train_step(model, tx, quality=(0, 10), mask_pol: str | None = None) -> Callable:
    """Returns jit-able step(state, batch, rng) -> (state, metrics).

    Joint multi-quality objective (step.py:36-53): forward at the full
    quality ladder; total loss = RD loss + aux loss; quantiles get the aux
    gradient via the optimizer partition (see optim.py).
    """
    lmbda_list = model.cfg.lmbda_list

    def loss_fn(params, batch, rng):
        out, aux = _apply_with_aux(model, params, batch, list(quality), mask_pol, rng)
        losses = scalable_rate_distortion_loss(out, batch, lmbda_list)
        total = losses["loss"] + aux
        metrics = {k: v for k, v in losses.items() if k != "mse"}
        metrics["aux_loss"] = aux
        metrics["mse_first"] = losses["mse"][0]
        metrics["mse_last"] = losses["mse"][-1]
        return total, metrics

    def step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss_total"] = loss
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def _apply_with_aux(model, params, batch, quality, mask_pol, rng):
    """Forward + aux loss in one apply (shares the module context)."""

    def run(m):
        out = m(batch, quality, mask_pol, training=True, rng=rng)
        return out, m.aux_loss()

    return model.apply({"params": params}, method=run)


def make_sampled_train_step(
    model, tx, qualities=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10), mask_pol: str | None = None
):
    """Sampled single-quality training (step.py:55-62): each batch trains
    at one quality drawn from a fixed ladder.  Quality is static under
    jit, so one specialization per ladder entry is pre-built and the host
    picks per batch."""
    import numpy as np

    steps = {
        q: jax.jit(make_train_step(model, tx, quality=(0, q), mask_pol=mask_pol))
        for q in qualities
    }
    host_rng = np.random.default_rng(0)

    def step(state, batch, rng):
        q = qualities[int(host_rng.integers(0, len(qualities)))]
        return steps[q](state, batch, rng)

    return step


def make_eval_step(model, quality: float, mask_pol: str | None = None) -> Callable:
    """Entropy-estimated eval at one quality (step.py:153-212): returns
    bpp estimate, PSNR, MSE on a batch."""

    def step(params, batch):
        out = model.apply(
            {"params": params},
            batch,
            quality,
            mask_pol,
            training=False,
            method=type(model).forward_single_quality,
        )
        b, h, w, _ = batch.shape
        denom = -math.log(2) * (b * h * w)
        lik = out["likelihoods"]
        bpp = jnp.sum(jnp.log(lik["y"])) / denom + jnp.sum(jnp.log(lik["z"])) / denom
        mse = jnp.mean((out["x_hat"] - batch) ** 2)
        psnr = -10.0 * jnp.log10(mse + 1e-12)
        return {"bpp": bpp, "mse": mse, "psnr": psnr, "x_hat": out["x_hat"]}

    return step
