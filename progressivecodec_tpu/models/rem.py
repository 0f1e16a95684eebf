"""REM — rate-enhancement module (registry name "rate").

Behavioral spec: /root/reference/src/compress/models/CHProgREM.py:205-467
and layers/postprocessing_network.py:241-314.  Wraps the progressive model
and adds per-slice LatentRateReduction banks — one bank per checkpoint-
quality interval (check_levels, default [0.01, 0.25, 1.75]) — that refine
the predicted (mu, sigma) of enhancement slices between checkpoints, gated
by an attention mask = mask(q) − mask(q_bar).

TPU re-design: implemented as a subclass overriding the progressive
model's `_refine_prog_params` hook, so forward / single-quality /
compress / decompress (including the on-device coder) are inherited
unchanged — the reference duplicates ~900 lines instead
(CHProgREM.py:469-1126).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from progressivecodec_tpu.layers.blocks import Conv
from progressivecodec_tpu.layers.masking import channel_mask, apply_mask_noise
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN


class ResidualBlock(nn.Module):
    """conv3x3 -> LeakyReLU -> conv3x3 -> LeakyReLU + (1x1) skip
    (models/utils.py:59-87)."""

    out: int

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out, 3, 1, name="conv1")(x)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(self.out, 3, 1, name="conv2")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        skip = x if x.shape[-1] == self.out else Conv(self.out, 1, 1, name="skip")(x)
        return y + skip


class LatentRateReduction(nn.Module):
    """Refines enhancement-slice entropy params between checkpoints
    (postprocessing_network.py:241-314)."""

    dim_chunk: int = 32
    mu_std: bool = False
    dimension: str = "big"  # "middle" | "big"

    @nn.compact
    def __call__(self, x_base, params_base, params_enh, att_mask):
        n = self.dim_chunk
        deep = self.dimension == "big"

        def stack(x, widths, name):
            for j, wd in enumerate(widths):
                x = ResidualBlock(wd, name=f"{name}{j}")(x)
            return x

        base_w = [n, n, n] if deep else [n, n]
        f_ent_prog = stack(params_enh, base_w, "enh_ent")
        f_latent = stack(x_base, base_w, "base_rep")
        f_ent_base = stack(params_base, base_w, "base_ent")

        cat = jnp.concatenate([f_latent, f_ent_base, f_ent_prog], axis=-1)
        out_w = 2 * n if self.mu_std else n
        enc_w = [2 * n, 2 * n, 2 * n, out_w] if deep else [2 * n, 2 * n, out_w]
        ret = stack(cat, enc_w, "enc")
        # zero-init output projection: the refiner starts as an exact
        # identity (REM == base model at init), so bank training can only
        # improve RD from the base — a deliberate difference from the
        # reference's default-initialized residual (CHProgREM.py:205-234
        # trains away its own init noise first)
        ret = nn.Dense(out_w, kernel_init=nn.initializers.zeros,
                       name="zero_out")(ret)  # 1x1 conv == channel dense
        return params_enh + ret * att_mask


def find_check_quality(quality: float, check_levels) -> tuple[float, float]:
    """(quality_ref, quality_post) interval bounds (CHProgREM.py:449-467)."""
    cl = list(check_levels)
    if quality <= cl[0]:
        return 0.0, 0.0
    if len(cl) >= 2 and cl[0] < quality <= cl[1]:
        return cl[0], cl[1]
    if len(cl) == 2:
        return cl[1], 10.0
    if len(cl) == 3 and cl[1] < quality <= cl[2]:
        return cl[1], cl[2]
    return cl[-1], 10.0


def _interval_index(quality: float, check_levels) -> int:
    cl = list(check_levels)
    if len(cl) == 1:
        return 0
    if len(cl) == 2:
        return 0 if cl[0] < quality <= cl[1] else 1
    if cl[0] < quality <= cl[1]:
        return 0
    if cl[1] < quality <= cl[2]:
        return 1
    return 2


def escalation_compress(codec, x, quality: float, mask_pol: str | None = None):
    """Cascaded ("escalation") REAL-codec encode (CHProgREM.py:337-372
    semantics on the codec path): one stream per checkpoint level below the
    target quality, each encoded with the previous level's reconstructed
    latent as the refinement anchor, then the target-quality stream.

    The anchor at every level is the codec's own reconstruction — computed
    by the SAME shared executables the decoder will run (and the coder is
    lossless), so encoder and decoder representations are bit-identical.
    Returns {"checkpoints": [container...], "final": container}.
    """
    cl = [q for q in codec.cfg.check_levels if q < quality]
    y = codec._call("analyze", (), x)
    rep = None
    checkpoints = []
    for q in cl:
        d = codec.compress_from_latent(
            y, x.shape, quality=float(q), mask_pol=mask_pol,
            checkpoint_rep=rep, simulate=True,
        )
        rep = d.pop("y_hat")
        d.pop("x_hat", None)
        checkpoints.append(d)
    final = codec.compress_from_latent(
        y, x.shape, quality=float(quality), mask_pol=mask_pol,
        checkpoint_rep=rep, simulate=True,
    )
    return {"checkpoints": checkpoints, "final": final}


def escalation_decompress(codec, data: dict) -> dict:
    """Decoder-side cascade: decode each checkpoint stream (feeding the
    previous reconstruction forward as the refinement anchor, cf.
    decompress_check_rep, CHProgREM.py:891-893), then the final stream."""
    rep = None
    ok = True
    for d in data["checkpoints"]:
        out = codec.decompress_to_latent(d, checkpoint_rep=rep)
        ok = ok and bool(out["stream_ok"])
        rep = out["y_hat"]
    out = codec.decompress(data["final"], checkpoint_rep=rep)
    return {"x_hat": out["x_hat"], "stream_ok": ok and bool(out["stream_ok"]),
            "y_hat": out["y_hat"]}


def extract_checkpoint_representation(model, variables, x, mask_pol: str = "point-based-std"):
    """Cascaded ("escalation") refinement: run the codec at each checkpoint
    quality, feeding the previous level's latent as the refinement anchor
    (CHProgREM.py:337-372).  Returns the final y_hat latent."""
    cl = list(model.cfg.check_levels)
    rep = None
    for q in cl:
        out = model.apply(
            variables, x, float(q), mask_pol, training=False, checkpoint_rep=rep,
            method=type(model).forward_single_quality,
        )
        rep = out["y_hat"]
    return rep


class PostRateProcessedNetwork(ChannelProgressiveWACNN):
    """Progressive model + LatentRateReduction banks ("rate").

    NOTE (flax semantics): `model.init` must be called with
    `quality=init_qualities(cfg)` so every checkpoint-interval bank is
    traced and materialized; a default init would only touch one bank.
    """

    mu_std: bool = False
    dimension: str = "big"

    def _use_stacked_prog(self) -> bool:
        # the per-interval refinement banks index slices individually;
        # keep the unrolled path for the REM variant
        return False

    @staticmethod
    def init_qualities(cfg) -> list:
        """One quality per checkpoint interval (plus base)."""
        cl = list(cfg.check_levels)
        mids = []
        bounds = cl + [10.0]
        for a, b in zip(cl, bounds[1:]):
            mids.append((a + b) / 2)
        return [0.0] + mids

    def setup(self):
        super().setup()
        cfg = self.cfg
        self.post_latent = [
            [
                LatentRateReduction(
                    dim_chunk=cfg.dim_chunk,
                    mu_std=self.mu_std,
                    dimension=self.dimension,
                    name=f"post_latent{k}_{i}",
                )
                for i in range(cfg.ns0)
            ]
            for k in range(len(cfg.check_levels))
        ]

    def _refine_prog_params(
        self, i, quality, mu, scale, mu_b, scale_b, y_b_hat, training, mask_pol
    ):
        cfg = self.cfg
        if quality <= cfg.check_levels[0]:
            return mu, scale
        q_bar, _ = find_check_quality(quality, cfg.check_levels)
        mk = dict(
            mask_pol="point-based-std" if mask_pol in (None,) else mask_pol,
            slice_index=i,
            dim_chunk=cfg.dim_chunk,
            division_channel=cfg.division_channel,
        )
        star = channel_mask(scale, pr=quality, **mk)
        bar = channel_mask(scale, pr=q_bar, **mk)
        att = apply_mask_noise(star - bar, training)
        if self.mu_std:
            att = jnp.concatenate([att, att], axis=-1)
        params_base = jnp.concatenate([mu_b, scale_b], axis=-1)
        params_enh = jnp.concatenate([mu, scale], axis=-1) if self.mu_std else scale
        k = _interval_index(quality, cfg.check_levels)
        out = self.post_latent[k][i](y_b_hat, params_base, params_enh, att)
        if self.mu_std:
            mu, scale = jnp.split(out, 2, axis=-1)
            return mu, scale
        return mu, out
