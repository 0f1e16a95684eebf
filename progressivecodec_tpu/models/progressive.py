"""ChannelProgressiveWACNN — the paper's channel-progressive codec.

Behavioral spec: /root/reference/src/compress/models/CHProg_cnn.py:30-1198.
M=640 latent split [320, 640]: slices 0-9 base, 10-19 enhancement; the
enhancement layer is masked element-wise by predicted sigma rank so one
trained model + one embedded bitstream serves a continuum of rates.

TPU-first re-design:
  * one jit per (shape, quality): forward, single-quality forward, and the
    real codec paths all trace statically (slice loop unrolled — 20 fixed
    iterations, static shapes, no host sync);
  * compress()/decompress() run the interleaved rANS coder *on device*
    inside the same jit as the transforms (models built on
    coder/rans_device.py) — no GPU->CPU marshalling (the reference round-
    trips every slice through Python lists, entropy_models.py:226-290);
  * the per-image sigma-quantile mask is a batched jnp.quantile
    (layers/masking.py) instead of the reference's Python loop;
  * masked-out elements are skipped by the coder (zero bits) instead of
    being coded as zero symbols (CHProg_cnn.py:828-830).

Encoder/decoder mask reproducibility (CHProg_cnn.py:960-968): sigma is
computed by the same f32 jitted graph on both paths, so masks agree
bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.entropy.bottleneck import EntropyBottleneck
from progressivecodec_tpu.entropy.gaussian import gaussian_forward, build_indexes
from progressivecodec_tpu.layers.masking import (
    channel_mask,
    apply_mask_noise,
    stacked_channel_mask,
)
from progressivecodec_tpu.layers.masking_learnable import LearnableMaskStack
from progressivecodec_tpu.layers.unet import UNet
from progressivecodec_tpu.models.transforms import (
    AnalysisTransform,
    HyperAnalysis,
    HyperSynthesis,
    SliceTransforms,
    SynthesisTransform,
)
from progressivecodec_tpu.layers.blocks import Conv
from progressivecodec_tpu.ops.math import ste_round


class JoinerStack(nn.Module):
    """conv3(64)-GELU-conv3(64)-GELU-conv3(out) merge net (CHProg_cnn.py:117-126)."""

    out: int = 32

    @nn.compact
    def __call__(self, x):
        from progressivecodec_tpu.layers.blocks import gelu

        y = Conv(64, 3, 1, name="conv0")(x)
        y = gelu(y)
        y = Conv(64, 3, 1, name="conv1")(y)
        y = gelu(y)
        return Conv(self.out, 3, 1, name="conv2")(y)


class ChannelProgressiveWACNN(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        n = cfg.N
        d0, d1 = cfg.division_dimension
        if cfg.multiple_encoder:
            self.g_a = [
                AnalysisTransform(N=n, M=d0, name=f"g_a{i}") for i in range(2)
            ]
        else:
            self.g_a_single = AnalysisTransform(N=n, M=d1, name="g_a")
        if cfg.multiple_decoder:
            self.g_s = [
                SynthesisTransform(N=n, M=d0, name=f"g_s{i}") for i in range(2)
            ]
        else:
            # single-decoder variant (the reference CLI default,
            # parser.py:53; CHProg_cnn.py:549,909,1066,1173): ONE shared
            # synthesis decodes both the base latent and the merged
            # enhancement latent (both d0 channels wide)
            self.g_s_shared = SynthesisTransform(N=n, M=d0, name="g_s")
        self.h_a = HyperAnalysis(N=n, name="h_a")
        if cfg.multiple_hyperprior:
            self.h_mean_s = [HyperSynthesis(out=d0, name=f"h_mean_s{i}") for i in range(2)]
            self.h_scale_s = [HyperSynthesis(out=d0, name=f"h_scale_s{i}") for i in range(2)]
        else:
            self.h_mean_s_single = HyperSynthesis(out=d1, name="h_mean_s")
            self.h_scale_s_single = HyperSynthesis(out=d1, name="h_scale_s")
        dc = cfg.dim_chunk
        self.cc_mean = SliceTransforms(cfg.ns0, out=dc, name="cc_mean")
        self.cc_scale = SliceTransforms(cfg.ns0, out=dc, name="cc_scale")
        self.lrp = SliceTransforms(cfg.ns0, out=dc, name="lrp")
        if self._use_stacked_prog():
            # One vmapped bank instead of num_prog_slices unrolled stacks:
            # valid because enhancement slices are mutually independent when
            # support_progressive_slices == 0 (CHProg_cnn.py:377-383) — a
            # ~10x smaller graph and batched MXU matmuls.
            from progressivecodec_tpu.layers.blocks import ConvStack5 as _CS5

            Stacked = nn.vmap(
                _CS5,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=0,
                out_axes=0,
            )
            self.cc_mean_prog = Stacked(out=dc, name="cc_mean_prog")
            self.cc_scale_prog = Stacked(out=dc, name="cc_scale_prog")
            self.lrp_prog = Stacked(out=dc, name="lrp_prog")
        else:
            self.cc_mean_prog = SliceTransforms(cfg.num_prog_slices, out=dc, name="cc_mean_prog")
            self.cc_scale_prog = SliceTransforms(cfg.num_prog_slices, out=dc, name="cc_scale_prog")
            self.lrp_prog = SliceTransforms(cfg.ns0, out=dc, name="lrp_prog")
        self.entropy_bottleneck = EntropyBottleneck(channels=n, name="entropy_bottleneck")
        if "learnable" in cfg.mask_policy:
            self.mask_conv = [
                LearnableMaskStack(out=dc, double_dim=cfg.double_dim, name=f"mask_conv{i}")
                for i in range(cfg.num_prog_slices)
            ]
        if cfg.joiner_policy in ("cond", "channel_cond", "channel_res"):
            self.joiner = [JoinerStack(out=dc, name=f"joiner{i}") for i in range(cfg.ns0)]
        if cfg.u_net_post == 1:
            self.refine = [nn.Sequential([UNet(16), Conv(3, 3, 1)], name="refine")]
        elif cfg.u_net_post == 2:
            self.refine = [
                nn.Sequential([UNet(16), Conv(3, 3, 1)], name=f"refine{i}") for i in range(2)
            ]

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def analyze(self, x):
        """x -> (y, y_slices) with the [base | enhancement] channel split."""
        if self.cfg.multiple_encoder:
            y = jnp.concatenate([self.g_a[0](x), self.g_a[1](x)], axis=-1)
        else:
            y = self.g_a_single(x)
        return y

    def hyper_params(self, z_hat, quality: float):
        """(latent_means, latent_scales), each (B,h,w,d1)."""
        cfg = self.cfg
        if not cfg.multiple_hyperprior:
            return self.h_mean_s_single(z_hat), self.h_scale_s_single(z_hat)
        means = jnp.concatenate([self.h_mean_s[0](z_hat), self.h_mean_s[1](z_hat)], axis=-1)
        scales = jnp.concatenate([self.h_scale_s[0](z_hat), self.h_scale_s[1](z_hat)], axis=-1)
        return means, scales

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    def _synth_net(self, which: int):
        """Decoder dispatch: g_s[which] or the shared single decoder."""
        return self.g_s[which] if self.cfg.multiple_decoder else self.g_s_shared

    def _apply_refine(self, x_hat, index: int):
        cfg = self.cfg
        if cfg.u_net_post == 1:
            return self.refine[0](x_hat)
        if cfg.u_net_post == 2:
            return self.refine[min(index, 1)](x_hat)
        return x_hat

    def merge(self, y_enh_slice, y_base_slice, i: int):
        """Join enhancement into base latent (CHProg_cnn.py:385-393)."""
        if self.cfg.joiner_policy == "res":
            return y_enh_slice + y_base_slice
        c = jnp.concatenate([y_enh_slice, y_base_slice], axis=-1)
        return self.joiner[i](c)

    def _determine_support(self, y_hat_base: list, i: int, prog_entries: list) -> list:
        """[co-located base slice] + up to support_progressive_slices
        previous prog entries (CHProg_cnn.py:377-383)."""
        sps = self.cfg.support_progressive_slices
        base = [y_hat_base[i]]
        if i == 0 or sps == 0:
            return base
        k = min(sps, i)
        return base + prog_entries[i - k : i]

    def _use_stacked_prog(self) -> bool:
        cfg = self.cfg
        return (
            cfg.stack_prog
            and cfg.support_progressive_slices == 0
            and not cfg.all_scalable
            and cfg.joiner_policy == "res"
            and "learnable" not in cfg.mask_policy
        )

    def _prog_params_stacked(self, latent_means, latent_scales, y_hat_base):
        """(mu, scale, mean_support) stacks, each (S, B, h, w, *)."""
        cfg = self.cfg
        d0 = cfg.division_channel
        S = cfg.num_prog_slices
        base_stack = jnp.stack(y_hat_base, axis=0)
        lm = jnp.broadcast_to(
            latent_means[None, ..., d0:], (S,) + latent_means.shape[:-1] + (latent_means.shape[-1] - d0,)
        )
        ls = jnp.broadcast_to(
            latent_scales[None, ..., d0:], (S,) + latent_scales.shape[:-1] + (latent_scales.shape[-1] - d0,)
        )
        mean_support = jnp.concatenate([lm, base_stack], axis=-1)
        scale_support = jnp.concatenate([ls, base_stack], axis=-1)
        mu = self.cc_mean_prog(mean_support)
        scale = self.cc_scale_prog(scale_support)
        return mu, scale, mean_support, base_stack

    def _stack_y_prog(self, y_slices):
        cfg = self.cfg
        parts = []
        for i in range(cfg.num_prog_slices):
            y = y_slices[cfg.ns0 + i]
            if cfg.delta_encode:
                y = y - y_slices[i]
            parts.append(y)
        return jnp.stack(parts, axis=0)

    @staticmethod
    def _unstack_channels(x_stack):
        """(S, B, h, w, dc) -> (B, h, w, S*dc) preserving slice-major
        channel order."""
        s_, b, h, w, dc = x_stack.shape
        return x_stack.transpose(1, 2, 3, 0, 4).reshape(b, h, w, s_ * dc)

    def _base_slice(self, i, latent_means, latent_scales, y_hat_slices):
        """Shared base-slice parameter prediction (cc transforms)."""
        cfg = self.cfg
        d0 = cfg.division_channel
        support = y_hat_slices[: min(i, cfg.max_support_slices)]
        mean_support = jnp.concatenate([latent_means[..., :d0]] + support, axis=-1)
        scale_support = jnp.concatenate([latent_scales[..., :d0]] + support, axis=-1)
        mu = self.cc_mean(i, mean_support)
        scale = self.cc_scale(i, scale_support)
        return mu, scale, mean_support

    def _base_lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp(i, lrp_support))

    def _prog_slice(self, i, latent_means, latent_scales, y_hat_base, mu_total, std_total, prog_slices):
        cfg = self.cfg
        d0 = cfg.division_channel
        sup_mean_src = mu_total if cfg.all_scalable else prog_slices
        sup_std_src = std_total if cfg.all_scalable else prog_slices
        sup_mean = self._determine_support(y_hat_base, i, sup_mean_src)
        sup_std = self._determine_support(y_hat_base, i, sup_std_src)
        mean_support = jnp.concatenate([latent_means[..., d0:]] + sup_mean, axis=-1)
        scale_support = jnp.concatenate([latent_scales[..., d0:]] + sup_std, axis=-1)
        mu = self.cc_mean_prog(i, mean_support)
        scale = self.cc_scale_prog(i, scale_support)
        mut = mu + y_hat_base[i] if cfg.total_mu_rep else mu
        return mu, scale, mut, mean_support

    def _prog_lrp(self, i, mean_support, y_hat_slice):
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        return 0.5 * jnp.tanh(self.lrp_prog(i, lrp_support))

    def _refine_prog_params(
        self, i, quality, mu, scale, mu_b, scale_b, y_b_hat, training, mask_pol
    ):
        """Hook for REM-style (mu, scale) refinement of enhancement slices
        (identity here; overridden by PostRateProcessedNetwork)."""
        return mu, scale

    def _hook_anchor(self, i, y_hat_base, checkpoint_rep):
        """y_b_hat input for the refinement hook: a cascaded checkpoint
        representation when provided (CHProgREM.py:337-372, 541, 613),
        else the decoded base slice."""
        if checkpoint_rep is None:
            return y_hat_base[i]
        dc = self.cfg.dim_chunk
        return checkpoint_rep[..., i * dc : (i + 1) * dc]

    def _mask_for(self, scale, pr, mask_pol, i, y_base_slice=None, cust_map=None):
        """Mask dispatch: parametric policies (conv importance maps,
        masking.py:110-123, 248-259) use the module bank; the rest are the
        pure functions in layers/masking.py.  cust_map: per-slice chunk of
        a gradient-importance map (CHProg_cnn.py:721,823,964) — overrides
        the sigma ranking when given."""
        cfg = self.cfg
        if mask_pol is not None and "learnable" in mask_pol:
            # three-levels-learnable semantics: pr 0 -> none, 2 -> all,
            # else conv importance map, STE-rounded
            if pr == 0:
                return jnp.zeros_like(scale)
            if pr == 2:
                return jnp.ones_like(scale)
            if cfg.double_dim and y_base_slice is not None:
                inp = jnp.concatenate([scale, y_base_slice], axis=-1)
            else:
                inp = scale
            return ste_round(self.mask_conv[i](inp))
        return channel_mask(
            scale, pr=pr, mask_pol=mask_pol, slice_index=i,
            dim_chunk=cfg.dim_chunk, division_channel=cfg.division_channel,
            cust_map=cust_map,
        )

    def _map_slice(self, cust_map, i: int):
        """Per-slice chunk of the importance map (cust_map.chunk analog,
        CHProg_cnn.py:721)."""
        if cust_map is None:
            return None
        dc = self.cfg.dim_chunk
        return cust_map[..., i * dc : (i + 1) * dc]

    def _map_stack(self, cust_map):
        if cust_map is None:
            return None
        dc = self.cfg.dim_chunk
        return jnp.stack(
            [cust_map[..., i * dc : (i + 1) * dc] for i in range(self.cfg.num_prog_slices)],
            axis=0,
        )

    def _z_branch(self, y, training: bool, rng):
        z = self.h_a(y)
        _, z_lik = self.entropy_bottleneck(z, training=training, rng=rng)
        med = self.entropy_bottleneck.medians()
        z_hat = ste_round(z - med) + med
        return z, z_hat, z_lik

    # ------------------------------------------------------------------
    # training forward: all qualities in one pass (CHProg_cnn.py:478-682)
    # ------------------------------------------------------------------

    def __call__(
        self,
        x,
        quality: Sequence[float] | None = None,
        mask_pol: str | None = None,
        *,
        training: bool = True,
        rng=None,
        checkpoint_rep=None,
        cust_map=None,
    ) -> dict[str, Any]:
        cfg = self.cfg
        mask_pol = mask_pol or cfg.mask_policy
        qualities = list(quality) if quality is not None else list(range(cfg.scalable_levels))
        if not qualities or qualities[0] != 0:
            qualities = [0] + qualities
        if training and rng is None:
            raise ValueError("training forward needs rng")
        n_rngs = 1 + cfg.ns1 + len(qualities) * cfg.ns0
        rngs = list(jax.random.split(rng, n_rngs)) if rng is not None else [None] * n_rngs
        rng_i = iter(rngs)

        y = self.analyze(x)
        z, z_hat, z_lik = self._z_branch(y, training, next(rng_i) if training else None)
        latent_means, latent_scales = self.hyper_params(z_hat, 0)

        y_slices = jnp.split(y, cfg.ns1, axis=-1)

        y_hat_base, y_lik_base = [], []
        mu_base_list, std_base_list = [], []
        for i in range(cfg.ns0):
            mu, scale, mean_support = self._base_slice(
                i, latent_means, latent_scales, y_hat_base
            )
            mu_base_list.append(mu)
            std_base_list.append(scale)
            _, lik = gaussian_forward(
                y_slices[i], scale, mu, training=training, rng=next(rng_i) if training else None
            )
            y_lik_base.append(lik)
            y_hat_slice = ste_round(y_slices[i] - mu) + mu
            y_hat_slice = y_hat_slice + self._base_lrp(i, mean_support, y_hat_slice)
            y_hat_base.append(y_hat_slice)

        y_hat_b = jnp.concatenate(y_hat_base, axis=-1)
        x_hat_base = self._apply_refine(self._synth_net(0)(y_hat_b), 0)
        x_hats = [x_hat_base]
        y_lik_prog_all = []
        y_hat_enh = y_hat_b

        for q in qualities[1:]:
            if self._use_stacked_prog():
                y_prog = self._stack_y_prog(y_slices)
                mu, scale, mean_support, base_stack = self._prog_params_stacked(
                    latent_means, latent_scales, y_hat_base
                )
                mask = stacked_channel_mask(
                    scale, pr=q, mask_pol=mask_pol or "point-based-std",
                    dim_chunk=cfg.dim_chunk, division_channel=cfg.division_channel,
                    cust_map=self._map_stack(cust_map),
                )
                mask = apply_mask_noise(mask, False)
                y_m = (y_prog - mu) * mask
                _, lik_stack = gaussian_forward(
                    y_m, scale * mask, None, training=training,
                    rng=next(rng_i) if training else None,
                )
                y_hat_stack = ste_round(y_prog - mu) * mask + mu
                if cfg.residual_before_lrp:
                    y_hat_stack = y_hat_stack + base_stack
                lrp_support = jnp.concatenate([mean_support, y_hat_stack], axis=-1)
                y_hat_stack = y_hat_stack + 0.5 * jnp.tanh(self.lrp_prog(lrp_support))
                if not cfg.residual_before_lrp:
                    y_hat_stack = y_hat_stack + base_stack
                y_hat_enh = self._unstack_channels(y_hat_stack)
                lik_q = [self._unstack_channels(lik_stack)]
            else:
                prog_slices, lik_q = [], []
                mu_total, std_total = [], []
                for i in range(cfg.num_prog_slices):
                    y_slice = y_slices[cfg.ns0 + i]
                    if cfg.delta_encode:
                        y_slice = y_slice - y_slices[i]
                    mu, scale, mut, mean_support = self._prog_slice(
                        i, latent_means, latent_scales, y_hat_base, mu_total, std_total, prog_slices
                    )
                    std_total.append(scale if cfg.support_std else mut)
                    mu_total.append(mut)
                    mu, scale = self._refine_prog_params(
                        i, q, mu, scale, mu_base_list[i], std_base_list[i],
                        self._hook_anchor(i, y_hat_base, checkpoint_rep), training, mask_pol,
                    )

                    mask = self._mask_for(
                        scale, q, mask_pol, i, y_hat_base[i], self._map_slice(cust_map, i)
                    )
                    mask = apply_mask_noise(mask, training and "learnable" in mask_pol)

                    y_m = (y_slice - mu) * mask
                    _, lik = gaussian_forward(
                        y_m, scale * mask, None, training=training,
                        rng=next(rng_i) if training else None,
                    )
                    lik_q.append(lik)
                    y_hat_slice = ste_round(y_slice - mu) * mask + mu
                    if cfg.residual_before_lrp:
                        y_hat_slice = self.merge(y_hat_slice, y_hat_base[i], i)
                    y_hat_slice = y_hat_slice + self._prog_lrp(i, mean_support, y_hat_slice)
                    if not cfg.residual_before_lrp:
                        y_hat_slice = self.merge(y_hat_slice, y_hat_base[i], i)
                    prog_slices.append(y_hat_slice)

                y_hat_enh = jnp.concatenate(prog_slices, axis=-1)
            x_hat_q = self._apply_refine(self._synth_net(1)(y_hat_enh), 1)
            x_hats.append(x_hat_q)
            # the per-quality stream codes base + enhancement (step.py bpp accounting)
            y_lik_prog_all.append(
                jnp.concatenate(y_lik_base + lik_q, axis=-1)[None]
            )

        y_lik_b = jnp.concatenate(y_lik_base, axis=-1)
        if y_lik_prog_all:
            y_lik_prog = jnp.concatenate(y_lik_prog_all, axis=0)
        else:
            y_lik_prog = jnp.ones_like(y_lik_b)
        return {
            "x_hat": jnp.stack(x_hats, axis=0),
            "likelihoods": {"y": y_lik_b, "y_prog": y_lik_prog, "z": z_lik},
            "y_base": y_hat_b,
            "y_prog": y_hat_enh,
        }

    # ------------------------------------------------------------------
    # single-quality eval forward (CHProg_cnn.py:1002-1198)
    # ------------------------------------------------------------------

    def forward_single_quality(
        self, x, quality: float, mask_pol: str | None = None, *, training: bool = False,
        rng=None, checkpoint_rep=None, cust_map=None,
    ) -> dict[str, Any]:
        cfg = self.cfg
        mask_pol = mask_pol or cfg.mask_policy
        y = self.analyze(x)
        z, z_hat, z_lik = self._z_branch(y, training, rng)
        latent_means, latent_scales = self.hyper_params(z_hat, quality)
        y_slices = jnp.split(y, cfg.ns1, axis=-1)

        y_hat_base, y_lik = [], []
        mu_base_list, std_base_list = [], []
        for i in range(cfg.ns0):
            mu, scale, mean_support = self._base_slice(
                i, latent_means, latent_scales, y_hat_base
            )
            mu_base_list.append(mu)
            std_base_list.append(scale)
            _, lik = gaussian_forward(y_slices[i], scale, mu, training=training, rng=rng)
            y_lik.append(lik)
            y_hat_slice = ste_round(y_slices[i] - mu) + mu
            y_hat_slice = y_hat_slice + self._base_lrp(i, mean_support, y_hat_slice)
            y_hat_base.append(y_hat_slice)

        if quality == 0:
            y_hat = jnp.concatenate(y_hat_base, axis=-1)
            x_hat = jnp.clip(self._apply_refine(self._synth_net(0)(y_hat), 0), 0.0, 1.0)
            return {
                "x_hat": x_hat,
                "likelihoods": {"y": jnp.concatenate(y_lik, axis=-1), "z": z_lik},
                "y_hat": y_hat,
                "mu": jnp.concatenate(mu_base_list, axis=-1),
                "std": jnp.concatenate(std_base_list, axis=-1),
            }

        if self._use_stacked_prog():
            y_prog = self._stack_y_prog(y_slices)
            mu_st, scale_st, mean_support, base_stack = self._prog_params_stacked(
                latent_means, latent_scales, y_hat_base
            )
            mu_prog_cat = self._unstack_channels(mu_st)
            std_prog_cat = self._unstack_channels(scale_st)
            mask = stacked_channel_mask(
                scale_st, pr=quality, mask_pol=mask_pol or "point-based-std",
                dim_chunk=cfg.dim_chunk, division_channel=cfg.division_channel,
                cust_map=self._map_stack(cust_map),
            )
            mask = apply_mask_noise(mask, False)
            mask_cat = self._unstack_channels(mask)
            y_m = (y_prog - mu_st) * mask
            _, lik_stack = gaussian_forward(y_m, scale_st * mask, None, training=training, rng=rng)
            y_lik.append(self._unstack_channels(lik_stack))
            y_hat_stack = ste_round(y_prog - mu_st) * mask + mu_st
            if cfg.residual_before_lrp:
                y_hat_stack = y_hat_stack + base_stack
            lrp_support = jnp.concatenate([mean_support, y_hat_stack], axis=-1)
            y_hat_stack = y_hat_stack + 0.5 * jnp.tanh(self.lrp_prog(lrp_support))
            if not cfg.residual_before_lrp:
                y_hat_stack = y_hat_stack + base_stack
            y_hat_p = self._unstack_channels(y_hat_stack)
        else:
            prog_slices = []
            mu_total, std_total = [], []
            mu_prog_list, std_prog_list, mask_list = [], [], []
            for i in range(cfg.num_prog_slices):
                y_slice = y_slices[cfg.ns0 + i]
                if cfg.delta_encode:
                    y_slice = y_slice - y_slices[i]
                mu, scale, mut, mean_support = self._prog_slice(
                    i, latent_means, latent_scales, y_hat_base, mu_total, std_total, prog_slices
                )
                std_total.append(scale if cfg.support_std else mut)
                mu_total.append(mut)
                mu_prog_list.append(mu)
                std_prog_list.append(scale)
                mu, scale = self._refine_prog_params(
                    i, quality, mu, scale, mu_base_list[i], std_base_list[i],
                    self._hook_anchor(i, y_hat_base, checkpoint_rep), training, mask_pol,
                )
                mask = self._mask_for(
                    scale, quality, mask_pol, i, y_hat_base[i], self._map_slice(cust_map, i)
                )
                mask = apply_mask_noise(mask, False)
                mask_list.append(mask)
                y_m = (y_slice - mu) * mask
                _, lik = gaussian_forward(y_m, scale * mask, None, training=training, rng=rng)
                y_lik.append(lik)
                y_hat_slice = ste_round(y_slice - mu) * mask + mu
                if cfg.residual_before_lrp:
                    y_hat_slice = self.merge(y_hat_slice, y_hat_base[i], i)
                y_hat_slice = y_hat_slice + self._prog_lrp(i, mean_support, y_hat_slice)
                if not cfg.residual_before_lrp:
                    y_hat_slice = self.merge(y_hat_slice, y_hat_base[i], i)
                prog_slices.append(y_hat_slice)
            mu_prog_cat = jnp.concatenate(mu_prog_list, axis=-1)
            std_prog_cat = jnp.concatenate(std_prog_list, axis=-1)
            mask_cat = jnp.concatenate(mask_list, axis=-1)
            y_hat_p = jnp.concatenate(prog_slices, axis=-1)
        x_hat = jnp.clip(self._apply_refine(self._synth_net(1)(y_hat_p), 1), 0.0, 1.0)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(y_lik, axis=-1), "z": z_lik},
            "y_hat": y_hat_p,
            "mu": mu_prog_cat,
            "std": std_prog_cat,
            "mask": mask_cat,
            "mu_base": jnp.concatenate(mu_base_list, axis=-1),
            "std_base": jnp.concatenate(std_base_list, axis=-1),
        }

    # ------------------------------------------------------------------
    # granular-codec fragments: small pure methods the GranularCodec jits
    # individually so compress and decompress share executables for every
    # sigma/mu/mask computation (see models/codec_granular.py)
    # ------------------------------------------------------------------

    def codec_hyper_enc(self, y):
        return self.h_a(y)

    def codec_hyper_dec(self, z_hat):
        return self.hyper_params(z_hat, 0)

    def codec_base_params(self, i: int, lm, ls, support, scale_table):
        mu, scale, ms = self._base_slice(i, lm, ls, list(support))
        idx = build_indexes(scale, scale_table, 0.11)
        return mu, scale, idx, ms

    def codec_base_recon(self, i: int, ms, mu, vals):
        y0 = vals.reshape(mu.shape).astype(jnp.float32) + mu
        return y0 + self._base_lrp(i, ms, y0)

    def codec_base_step(self, j: int, include_prev: bool, lm, ls, support,
                        scale_table, ms_prev, mu_prev, vals_prev):
        """Fused fragment: recon of base slice j-1 + params of slice j in ONE
        executable (halves the per-slice dispatch count; both codec sides
        call this same fragment, preserving the shared-executable sigma
        contract).  include_prev is True iff slice j-1 is inside slice j's
        support window (max_support_slices)."""
        y_prev = self.codec_base_recon(j - 1, ms_prev, mu_prev, vals_prev)
        sup = list(support) + ([y_prev] if include_prev else [])
        mu, scale, idx, ms = self.codec_base_params(j, lm, ls, sup, scale_table)
        return y_prev, mu, scale, idx, ms

    def codec_prog_stacked(self, quality: float, mask_pol, lm, ls, y_hat_base, scale_table,
                           cust_map=None):
        mu, scale, ms, base_stack = self._prog_params_stacked(lm, ls, list(y_hat_base))
        mask = stacked_channel_mask(
            scale, pr=quality, mask_pol=mask_pol or "point-based-std",
            dim_chunk=self.cfg.dim_chunk, division_channel=self.cfg.division_channel,
            cust_map=self._map_stack(cust_map),
        )
        keep = jnp.round(mask) > 0.5
        idx = build_indexes(scale, scale_table, 0.11)
        return mu, scale, mask, keep, idx, ms, base_stack

    def codec_prog_recon_stacked(self, ms, mu, vals, keep, base_stack):
        cfg = self.cfg
        y0 = jnp.where(keep, vals.reshape(mu.shape).astype(jnp.float32), 0.0) + mu
        if cfg.residual_before_lrp:
            y0 = y0 + base_stack
        lrp_in = jnp.concatenate([ms, y0], axis=-1)
        y0 = y0 + 0.5 * jnp.tanh(self.lrp_prog(lrp_in))
        if not cfg.residual_before_lrp:
            y0 = y0 + base_stack
        return y0

    def codec_prog_params(
        self, i: int, quality: float, mask_pol, lm, ls, y_hat_base,
        mu_total, std_total, prog_slices, mu_b_i, std_b_i, checkpoint_slice,
        scale_table, cust_map_slice=None,
    ):
        """Unrolled per-slice prog params incl. the refinement hook (REM)
        and the mask — everything whose output feeds index/keep decisions."""
        mu, scale, mut, ms = self._prog_slice(
            i, lm, ls, list(y_hat_base), list(mu_total), list(std_total), list(prog_slices)
        )
        anchor = checkpoint_slice if checkpoint_slice is not None else y_hat_base[i]
        mu, scale = self._refine_prog_params(
            i, quality, mu, scale, mu_b_i, std_b_i, anchor, False, mask_pol
        )
        mask = self._mask_for(scale, quality, mask_pol, i, y_hat_base[i], cust_map_slice)
        keep = jnp.round(mask) > 0.5
        idx = build_indexes(scale, scale_table, 0.11)
        return mu, scale, mut, mask, keep, idx, ms

    def codec_prog_recon(self, i: int, ms, mu, vals, keep, y_b_i):
        cfg = self.cfg
        y0 = jnp.where(keep, vals.reshape(mu.shape).astype(jnp.float32), 0.0) + mu
        if cfg.residual_before_lrp:
            y0 = self.merge(y0, y_b_i, i)
        y0 = y0 + self._prog_lrp(i, ms, y0)
        if not cfg.residual_before_lrp:
            y0 = self.merge(y0, y_b_i, i)
        return y0

    def codec_synth(self, which: int, y_hat):
        return jnp.clip(self._apply_refine(self._synth_net(which)(y_hat), which), 0.0, 1.0)

