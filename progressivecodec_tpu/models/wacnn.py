"""WACNN — the non-progressive window-attention anchor codec.

Behavioral spec: /root/reference/src/compress/models/cnn.py:23-336 (STF/
Zou22-style transforms + ChARM channel-autoregressive slice conditioning).
Functional TPU re-design: the module exposes granular methods so the
compress/decompress orchestrators (models/codec.py) can run the slice loop
statically unrolled under one jit, with entropy coding on device.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.entropy.bottleneck import EntropyBottleneck
from progressivecodec_tpu.entropy.gaussian import gaussian_forward, build_indexes
from progressivecodec_tpu.models.transforms import (
    AnalysisTransform,
    HyperAnalysis,
    HyperSynthesis,
    SliceTransforms,
    SynthesisTransform,
)
from progressivecodec_tpu.ops.math import ste_round


class WACNN(nn.Module):
    """Single-rate anchor model (registry name "cnn"); M=320 by default."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        n, m = cfg.N, cfg.M
        self.num_slices = m // cfg.dim_chunk
        self.g_a = AnalysisTransform(N=n, M=m, name="g_a")
        self.g_s = SynthesisTransform(N=n, M=m, name="g_s")
        self.h_a = HyperAnalysis(N=n, name="h_a")
        self.h_mean_s = HyperSynthesis(out=m, name="h_mean_s")
        self.h_scale_s = HyperSynthesis(out=m, name="h_scale_s")
        self.cc_mean = SliceTransforms(self.num_slices, out=cfg.dim_chunk, name="cc_mean")
        self.cc_scale = SliceTransforms(self.num_slices, out=cfg.dim_chunk, name="cc_scale")
        self.lrp = SliceTransforms(self.num_slices, out=cfg.dim_chunk, name="lrp")
        self.entropy_bottleneck = EntropyBottleneck(channels=n, name="entropy_bottleneck")

    # ---- granular pieces (also used by the codec orchestrators) ----

    def analyze(self, x):
        return self.g_a(x)

    def synthesize(self, y_hat):
        return self.g_s(y_hat)

    def hyper_analyze(self, y):
        return self.h_a(y)

    def hyper_synthesize(self, z_hat):
        return self.h_mean_s(z_hat), self.h_scale_s(z_hat)

    def bottleneck(self, z, training: bool, rng=None):
        return self.entropy_bottleneck(z, training=training, rng=rng)

    def bottleneck_medians(self):
        return self.entropy_bottleneck.medians()

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def slice_params(self, i: int, latent_means, latent_scales, support):
        """(mu, scale) for slice i given decoded support slices."""
        mean_support = jnp.concatenate([latent_means] + support, axis=-1)
        scale_support = jnp.concatenate([latent_scales] + support, axis=-1)
        mu = self.cc_mean(i, mean_support)
        scale = self.cc_scale(i, scale_support)
        return mu, scale, mean_support

    def slice_lrp(self, i: int, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp(i, lrp_support))

    # ---- training forward ----

    def __call__(self, x, *, training: bool = True, rng=None) -> dict[str, Any]:
        cfg = self.cfg
        if training and rng is None:
            raise ValueError("training forward needs an rng")
        rngs = jax.random.split(rng, 2 + self.num_slices) if rng is not None else None

        y = self.g_a(x)
        z = self.h_a(y)
        _, z_likelihoods = self.entropy_bottleneck(
            z, training=training, rng=rngs[0] if training else None
        )
        med = self.entropy_bottleneck.medians()
        z_hat = ste_round(z - med) + med

        latent_means = self.h_mean_s(z_hat)
        latent_scales = self.h_scale_s(z_hat)

        y_slices = jnp.split(y, self.num_slices, axis=-1)
        y_hat_slices = []
        y_likelihood = []
        for i, y_slice in enumerate(y_slices):
            support = y_hat_slices[: min(i, cfg.max_support_slices)]
            mu, scale, mean_support = self.slice_params(i, latent_means, latent_scales, support)
            _, lik = gaussian_forward(
                y_slice, scale, mu, training=training, rng=rngs[2 + i] if training else None
            )
            y_likelihood.append(lik)
            y_hat_slice = ste_round(y_slice - mu) + mu
            y_hat_slice = y_hat_slice + self.slice_lrp(i, mean_support, y_hat_slice)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {
                "y": jnp.concatenate(y_likelihood, axis=-1),
                "z": z_likelihoods,
            },
            "y_hat": y_hat,
        }

    # ---- granular-codec fragments (see models/codec_granular.py) ----

    def codec_hyper_enc(self, y):
        return self.h_a(y)

    def codec_hyper_dec(self, z_hat):
        return self.h_mean_s(z_hat), self.h_scale_s(z_hat)

    def codec_base_params(self, i: int, lm, ls, support, scale_table):
        mu, scale, ms = self.slice_params(i, lm, ls, list(support))
        idx = build_indexes(scale, scale_table, 0.11)
        return mu, scale, idx, ms

    def codec_base_recon(self, i: int, ms, mu, vals):
        y0 = vals.reshape(mu.shape).astype(jnp.float32) + mu
        return y0 + self.slice_lrp(i, ms, y0)

    def codec_base_step(self, j: int, include_prev: bool, lm, ls, support,
                        scale_table, ms_prev, mu_prev, vals_prev):
        """Fused recon(j-1)+params(j) fragment (see progressive.codec_base_step)."""
        y_prev = self.codec_base_recon(j - 1, ms_prev, mu_prev, vals_prev)
        sup = list(support) + ([y_prev] if include_prev else [])
        mu, scale, idx, ms = self.codec_base_params(j, lm, ls, sup, scale_table)
        return y_prev, mu, scale, idx, ms

    def codec_synth(self, which: int, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)

    # ---- eval alias ----

    def forward_single_quality(self, x, quality=0.0, mask_pol=None, *, training=False, rng=None):
        """Quality-agnostic alias so WACNN plugs into the shared Codec/eval
        machinery (single-rate model: quality is ignored)."""
        out = self(x, training=training, rng=rng)
        out["x_hat"] = jnp.clip(out["x_hat"], 0.0, 1.0)
        return out
