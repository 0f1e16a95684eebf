"""Standalone post-processing networks.

Behavioral spec: /root/reference/src/compress/layers/postprocessing_network.py
(ResidualBlock :41-70, ResidualBlockSmall :75-105, ResidualBlockGDN :108-131,
LatentPostNet :135-165, PostNet :170-236).  These are auxiliary refinement
nets: LatentPostNet refines a decoded latent conditioned on its entropy
parameters; PostNet refines the reconstructed image (type 0 = flat
residual/attention stack at full resolution, type 1 = a small autoencoder
with a global skip).

TPU notes: all NHWC, channel-mixing convs map to MXU matmuls; full-res
PostNet type 0 is HBM-bandwidth bound so it benefits from bf16 inputs
(params stay f32 via the usual flax promotion).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from progressivecodec_tpu.layers.blocks import Conv, Deconv, GDN, WinNoShiftAttention


class ResidualBlock(nn.Module):
    """conv3x3 -> LeakyReLU -> conv3x3 -> LeakyReLU + (1x1) skip
    (postprocessing_network.py:41-70)."""

    out: int

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out, 3, 1, name="conv1")(x)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(self.out, 3, 1, name="conv2")(y)
        y = jax.nn.leaky_relu(y, 0.01)
        skip = x if x.shape[-1] == self.out else Conv(self.out, 1, 1, name="skip")(x)
        return y + skip


class ResidualBlockSmall(nn.Module):
    """Single conv3x3 -> LeakyReLU + (1x1) skip (postprocessing_network.py:75-105)."""

    out: int

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out, 3, 1, name="conv1")(x)
        y = jax.nn.leaky_relu(y, 0.01)
        skip = x if x.shape[-1] == self.out else Conv(self.out, 1, 1, name="skip")(x)
        return y + skip


class ResidualBlockGDN(nn.Module):
    """conv3x3 -> conv3x3 -> GDN + (1x1) skip (postprocessing_network.py:108-131).

    Note the reference applies the nonlinearity AFTER both convs (unlike
    ResidualBlock), and uses inverse GDN on decoder-side blocks.
    """

    out: int
    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out, 3, 1, name="conv1")(x)
        y = Conv(self.out, 3, 1, name="conv2")(y)
        y = GDN(inverse=self.inverse, name="gdn")(y)
        skip = x if x.shape[-1] == self.out else Conv(self.out, 1, 1, name="skip")(x)
        return y + skip


class LatentPostNet(nn.Module):
    """Latent refinement conditioned on entropy params
    (postprocessing_network.py:135-165): two ResidualBlock branches (latent,
    entropy params) fused by a two-block head, with a global identity skip.
    """

    N: int

    @nn.compact
    def __call__(self, x, entropy_params):
        n = self.N
        f_latent = ResidualBlock(n, name="enc_latent0")(x)
        f_latent = ResidualBlock(n, name="enc_latent1")(f_latent)
        f_ent = ResidualBlock(2 * n, name="enc_ent0")(entropy_params)
        f_ent = ResidualBlock(n, name="enc_ent1")(f_ent)
        y = jnp.concatenate([f_latent, f_ent], axis=-1)
        y = ResidualBlock(2 * n, name="enc0")(y)
        y = ResidualBlock(n, name="enc1")(y)
        return y + x


class PostNet(nn.Module):
    """Image-domain refinement net (postprocessing_network.py:170-236).

    model_type 0: full-resolution GDN residual stack with two window
    attentions (3 -> N ... N -> M -> ... -> 3).
    model_type 1: strided 16x-downsampling autoencoder (conv/GDN mirror of
    the codec's g_a/g_s geometry) with a global additive skip.
    """

    N: int = 128
    M: int = 192
    model_type: int = 0

    @nn.compact
    def __call__(self, x):
        n, m = self.N, self.M
        if self.model_type == 0:
            y = ResidualBlockGDN(n, name="res1")(x)
            y = ResidualBlockGDN(n, name="res2")(y)
            y = WinNoShiftAttention(num_heads=8, window_size=8, shift_size=4, name="attn1")(y)
            y = ResidualBlockGDN(n, name="res3")(y)
            y = ResidualBlockGDN(m, name="res4")(y)
            y = ResidualBlockGDN(n, inverse=True, name="res5")(y)
            y = WinNoShiftAttention(num_heads=8, window_size=8, shift_size=4, name="attn2")(y)
            y = ResidualBlockGDN(n, inverse=True, name="res6")(y)
            y = ResidualBlockGDN(n, inverse=True, name="res7")(y)
            return ResidualBlock(3, name="res8")(y)
        if self.model_type != 1:
            raise ValueError("model_type must be 0 or 1")
        y = Conv(n, 5, 2, name="enc0")(x)
        y = GDN(name="enc_gdn0")(y)
        y = Conv(n, 5, 2, name="enc1")(y)
        y = GDN(name="enc_gdn1")(y)
        y = WinNoShiftAttention(num_heads=8, window_size=8, shift_size=4, name="enc_attn")(y)
        y = Conv(n, 5, 2, name="enc2")(y)
        y = GDN(name="enc_gdn2")(y)
        y = Conv(m, 5, 2, name="enc3")(y)
        y = WinNoShiftAttention(num_heads=8, window_size=4, shift_size=2, name="enc_attn2")(y)

        y = WinNoShiftAttention(num_heads=8, window_size=4, shift_size=2, name="dec_attn")(y)
        y = Deconv(n, 5, 2, name="dec0")(y)
        y = GDN(inverse=True, name="dec_gdn0")(y)
        y = Deconv(n, 5, 2, name="dec1")(y)
        y = GDN(inverse=True, name="dec_gdn1")(y)
        y = WinNoShiftAttention(num_heads=8, window_size=8, shift_size=4, name="dec_attn2")(y)
        y = Deconv(n, 5, 2, name="dec2")(y)
        y = GDN(inverse=True, name="dec_gdn2")(y)
        y = Deconv(3, 5, 2, name="dec3")(y)
        return y + x
