"""Factorized-prior entropy bottleneck (Balle et al. 2018) for the z latent.

Behavioral spec: /root/reference/src/compress/entropy_models/entropy_models.py:293-522.
Per-channel 5-stage monotone MLP CDF; quantile parameters trained by a
separate aux loss; `update()` is a *pure host function* returning CDF
tables (they are recomputed after load, never checkpointed).

TPU-first changes: NHWC (channel-last) layout, the per-channel MLP is a
batched einsum over all channels at once, likelihood math in f32.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.entropy.cdf import batched_pmf_to_cdf
from progressivecodec_tpu.ops.math import lower_bound

_FILTERS = (3, 3, 3, 3)
LIKELIHOOD_BOUND = 1e-9


def _logits_cumulative(params: dict, values: jax.Array, stop_gradient: bool) -> jax.Array:
    """values: (C, 1, N) -> logits (C, 1, N).

    logits = chain of [softplus(matrix_i) @ logits + bias_i ;
    logits += tanh(factor_i) * tanh(logits)] (entropy_models.py:400-419).
    """
    logits = values
    n_layers = len(_FILTERS) + 1
    for i in range(n_layers):
        matrix = params[f"matrix{i}"]
        bias = params[f"bias{i}"]
        if stop_gradient:
            matrix = jax.lax.stop_gradient(matrix)
            bias = jax.lax.stop_gradient(bias)
        logits = jnp.einsum(
            "cij,cjn->cin", jax.nn.softplus(matrix), logits, preferred_element_type=jnp.float32
        )
        logits = logits + bias
        if i < len(_FILTERS):
            factor = params[f"factor{i}"]
            if stop_gradient:
                factor = jax.lax.stop_gradient(factor)
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


class EntropyBottleneck(nn.Module):
    """Learned univariate density; channels along the last axis."""

    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0

    def setup(self):
        filters = (1,) + _FILTERS + (1,)
        scale = self.init_scale ** (1 / (len(_FILTERS) + 1))
        c = self.channels
        params = {}
        for i in range(len(_FILTERS) + 1):
            init = float(np.log(np.expm1(1 / scale / filters[i + 1])))
            params[f"matrix{i}"] = self.param(
                f"matrix{i}",
                lambda k, s, v=init: jnp.full(s, v, jnp.float32),
                (c, filters[i + 1], filters[i]),
            )
            params[f"bias{i}"] = self.param(
                f"bias{i}",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.5, 0.5),
                (c, filters[i + 1], 1),
            )
            if i < len(_FILTERS):
                params[f"factor{i}"] = self.param(
                    f"factor{i}", nn.initializers.zeros, (c, filters[i + 1], 1)
                )
        self._mlp = params
        self.quantiles = self.param(
            "quantiles",
            lambda k, s: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale]), (c, 1, 1)
            ),
            (c, 1, 3),
        )

    def medians(self) -> jax.Array:
        """(C,) per-channel median used for STE rounding of z."""
        return self.quantiles[:, 0, 1]

    def _likelihood(self, values: jax.Array) -> jax.Array:
        """values: (C, 1, N) noisy/rounded samples -> P(v-.5 < Z < v+.5)."""
        lower = _logits_cumulative(self._mlp, values - 0.5, stop_gradient=False)
        upper = _logits_cumulative(self._mlp, values + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))

    def __call__(self, x: jax.Array, *, training: bool, rng: jax.Array | None = None):
        """x: (B, H, W, C) -> (x_out, likelihoods) same shape.

        Training adds U(-.5, .5) noise; eval rounds around the median
        (entropy_models.py:446-489).
        """
        b, h, w, c = x.shape
        values = x.astype(jnp.float32).transpose(3, 0, 1, 2).reshape(c, 1, -1)
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng for noise")
            outputs = values + jax.random.uniform(rng, values.shape, jnp.float32, -0.5, 0.5)
        else:
            med = self.medians().reshape(c, 1, 1)
            outputs = jnp.round(values - med) + med
        likelihood = self._likelihood(outputs)
        likelihood = lower_bound(likelihood, LIKELIHOOD_BOUND)
        outputs = outputs.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        likelihood = likelihood.reshape(c, b, h, w).transpose(1, 2, 3, 0)
        return outputs.astype(x.dtype), likelihood

    def aux_loss(self) -> jax.Array:
        """Quantile-fitting loss targeting the tail mass (entropy_models.py:395-398)."""
        logits = _logits_cumulative(self._mlp, self.quantiles, stop_gradient=True)
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t])
        return jnp.abs(logits - target).sum()


def build_bottleneck_tables(variables: dict, precision: int = 16) -> dict:
    """Pure host-side `update()`: params -> rANS CDF tables.

    Mirrors EntropyBottleneck.update (entropy_models.py:354-393).  Returns
    {"cdf": (C, L) int32, "cdf_length": (C,), "offset": (C,)} as numpy.
    """
    params = {k: np.asarray(v) for k, v in variables.items()}
    quantiles = params["quantiles"]
    medians = quantiles[:, 0, 1]
    minima = np.clip(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0, None)
    maxima = np.clip(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0, None)
    offset = -minima
    pmf_start = medians - minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length)[None, :] + pmf_start[:, None]  # (C, L)
    c = samples.shape[0]

    # pure-numpy mirror of _logits_cumulative: table building must never
    # touch the accelerator (eager per-op dispatch through remote backends
    # is pathologically slow, and determinism matters more than speed here)
    def np_logits(values):
        logits = values.astype(np.float32)
        for i in range(len(_FILTERS) + 1):
            m = np.asarray(params[f"matrix{i}"], np.float32)
            logits = np.einsum("cij,cjn->cin", np.logaddexp(0.0, m), logits)
            logits = logits + np.asarray(params[f"bias{i}"], np.float32)
            if i < len(_FILTERS):
                f = np.asarray(params[f"factor{i}"], np.float32)
                logits = logits + np.tanh(f) * np.tanh(logits)
        return logits

    vals = samples.reshape(c, 1, -1)
    lower = np_logits(vals - 0.5)
    upper = np_logits(vals + 0.5)
    sign = -np.sign(lower + upper)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    pmf = np.abs(sigmoid(sign * upper) - sigmoid(sign * lower))[:, 0, :]
    tail_mass = sigmoid(lower[:, 0, :1]) + sigmoid(-upper[:, 0, -1:])

    cdf = batched_pmf_to_cdf(pmf, tail_mass, pmf_length, max_length, precision)
    return {
        "cdf": cdf,
        "cdf_length": (pmf_length + 2).astype(np.int32),
        "offset": offset.astype(np.int32),
        "medians": medians.astype(np.float32),
    }
