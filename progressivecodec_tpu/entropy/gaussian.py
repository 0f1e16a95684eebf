"""Scale-indexed Gaussian conditional entropy model for the y latent.

Behavioral spec: /root/reference/src/compress/entropy_models/entropy_models.py:525-666.
Pure functions throughout: likelihood (erfc form), index building
(vectorized count over the scale table == searchsorted), and a host-side
table builder.  Scale math stays f32 so encoder- and decoder-side sigma
agree bit-for-bit (the mask invariant, CHProg_cnn.py:960-968).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from progressivecodec_tpu.entropy.cdf import batched_pmf_to_cdf
from progressivecodec_tpu.ops.math import lower_bound

LIKELIHOOD_BOUND = 1e-9
SCALE_BOUND = 0.11


def standardized_cumulative(x: jax.Array) -> jax.Array:
    """Phi(x) via erfc for numerical precision (entropy_models.py:578-582)."""
    return 0.5 * jax.lax.erfc(-(2**-0.5) * x)


def gaussian_likelihood(
    inputs: jax.Array,
    scales: jax.Array,
    means: jax.Array | None = None,
    scale_bound: float = SCALE_BOUND,
) -> jax.Array:
    """P(v - .5 < Y < v + .5) for Y ~ N(means, scales^2), lower-bounded."""
    values = inputs if means is None else inputs - means
    values = values.astype(jnp.float32)
    scales = lower_bound(scales.astype(jnp.float32), scale_bound)
    values = jnp.abs(values)
    upper = standardized_cumulative((0.5 - values) / scales)
    lower = standardized_cumulative((-0.5 - values) / scales)
    return lower_bound(upper - lower, LIKELIHOOD_BOUND)


def gaussian_forward(
    inputs: jax.Array,
    scales: jax.Array,
    means: jax.Array | None = None,
    *,
    training: bool,
    rng: jax.Array | None = None,
):
    """(outputs, likelihood) — noise quantize in training, round at eval
    (entropy_models.py:645-659)."""
    if training:
        if rng is None:
            raise ValueError("training=True requires rng")
        outputs = inputs + jax.random.uniform(rng, inputs.shape, inputs.dtype, -0.5, 0.5)
    else:
        if means is not None:
            outputs = jnp.round(inputs - means) + means
        else:
            outputs = jnp.round(inputs)
    return outputs, gaussian_likelihood(outputs, scales, means)


def build_indexes(scales: jax.Array, scale_table: jax.Array, scale_bound: float = SCALE_BOUND) -> jax.Array:
    """Per-element CDF row index: count of table entries <= sigma
    (entropy_models.py:661-666), vectorized as a sum of comparisons."""
    scales = lower_bound(scales.astype(jnp.float32), scale_bound)
    table = jnp.asarray(scale_table, dtype=jnp.float32)[:-1]
    # index = (#levels - 1) - sum_s [sigma <= s]
    idx = (len(scale_table) - 1) - jnp.sum(
        scales[..., None] <= table, axis=-1, dtype=jnp.int32
    )
    return idx.astype(jnp.int32)


def build_gaussian_tables(
    scale_table: np.ndarray, tail_mass: float = 1e-9, precision: int = 16
) -> dict:
    """Host-side `update()`: scale table -> rANS CDF tables.

    Mirrors GaussianConditional.update (entropy_models.py:599-624).
    """
    scale_table = np.asarray(scale_table, dtype=np.float64)
    multiplier = -scipy.stats.norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length, dtype=np.int32) - pmf_center[:, None]).astype(
        np.float32
    )
    samples_scale = scale_table.astype(np.float32)[:, None]

    def _cum(x):
        import scipy.special

        return 0.5 * scipy.special.erfc(-(2**-0.5) * x)

    upper = _cum((0.5 - samples) / samples_scale)
    lower = _cum((-0.5 - samples) / samples_scale)
    pmf = upper - lower
    tail = 2 * lower[:, :1]

    cdf = batched_pmf_to_cdf(pmf, tail, pmf_length, max_length, precision)
    return {
        "cdf": cdf,
        "cdf_length": (pmf_length + 2).astype(np.int32),
        "offset": (-pmf_center).astype(np.int32),
        "scale_table": scale_table.astype(np.float32),
    }


class GaussianConditional:
    """Thin stateless namespace bundling table + ops for convenience."""

    def __init__(self, scale_table: np.ndarray, scale_bound: float = SCALE_BOUND, tail_mass: float = 1e-9):
        self.scale_table = np.asarray(scale_table, dtype=np.float32)
        self.scale_bound = float(scale_bound)
        self.tail_mass = float(tail_mass)
        self._tables = None

    def update(self, precision: int = 16) -> dict:
        if self._tables is None:
            self._tables = build_gaussian_tables(self.scale_table, self.tail_mass, precision)
        return self._tables

    def likelihood(self, inputs, scales, means=None):
        return gaussian_likelihood(inputs, scales, means, self.scale_bound)

    def indexes(self, scales):
        return build_indexes(scales, self.scale_table, self.scale_bound)
