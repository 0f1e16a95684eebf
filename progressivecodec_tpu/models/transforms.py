"""Analysis/synthesis/hyper transform stacks shared by the model family.

Architecture spec: /root/reference/src/compress/models/cnn.py:34-130 and
CHProg_cnn.py:131-284 (geometry, widths, window sizes).  NHWC, bf16-ready;
all channel mixing is MXU matmul-shaped.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax

from progressivecodec_tpu.layers.blocks import (
    Conv,
    Deconv,
    GDN,
    SubpelConv,
    WinNoShiftAttention,
    ConvStack5,
    gelu,
)


class AnalysisTransform(nn.Module):
    """g_a: 4x (conv5 s2 [+ GDN]) with two windowed-attention blocks."""

    N: int = 192
    M: int = 320

    @nn.compact
    def __call__(self, x):
        y = Conv(self.N, 5, 2, name="conv0")(x)
        y = GDN(name="gdn0")(y)
        y = Conv(self.N, 5, 2, name="conv1")(y)
        y = GDN(name="gdn1")(y)
        y = WinNoShiftAttention(num_heads=8, window_size=8, shift_size=4, name="attn0")(y)
        y = Conv(self.N, 5, 2, name="conv2")(y)
        y = GDN(name="gdn2")(y)
        y = Conv(self.M, 5, 2, name="conv3")(y)
        y = WinNoShiftAttention(num_heads=8, window_size=4, shift_size=2, name="attn1")(y)
        return y


class SynthesisTransform(nn.Module):
    """g_s: mirror of g_a with inverse GDN and deconvs."""

    N: int = 192
    M: int = 320
    out: int = 3

    @nn.compact
    def __call__(self, y):
        x = WinNoShiftAttention(num_heads=8, window_size=4, shift_size=2, name="attn0")(y)
        x = Deconv(self.N, 5, 2, name="deconv0")(x)
        x = GDN(inverse=True, name="igdn0")(x)
        x = Deconv(self.N, 5, 2, name="deconv1")(x)
        x = GDN(inverse=True, name="igdn1")(x)
        x = WinNoShiftAttention(num_heads=8, window_size=8, shift_size=4, name="attn1")(x)
        x = Deconv(self.N, 5, 2, name="deconv2")(x)
        x = GDN(inverse=True, name="igdn2")(x)
        x = Deconv(self.out, 5, 2, name="deconv3")(x)
        return x


class HyperAnalysis(nn.Module):
    """h_a: conv3x3 stack, two stride-2 (cnn.py:57-67)."""

    N: int = 192

    @nn.compact
    def __call__(self, y):
        z = Conv(320, 3, 1, name="conv0")(y)
        z = gelu(z)
        z = Conv(288, 3, 1, name="conv1")(z)
        z = gelu(z)
        z = Conv(256, 3, 2, name="conv2")(z)
        z = gelu(z)
        z = Conv(224, 3, 1, name="conv3")(z)
        z = gelu(z)
        z = Conv(self.N, 3, 2, name="conv4")(z)
        return z


class HyperSynthesis(nn.Module):
    """h_mean_s / h_scale_s: subpel-upsampling stack (cnn.py:69-91)."""

    out: int = 320

    @nn.compact
    def __call__(self, z):
        y = Conv(192, 3, 1, name="conv0")(z)
        y = gelu(y)
        y = SubpelConv(224, 2, name="up0")(y)
        y = gelu(y)
        y = Conv(256, 3, 1, name="conv1")(y)
        y = gelu(y)
        y = SubpelConv(288, 2, name="up1")(y)
        y = gelu(y)
        y = Conv(self.out, 3, 1, name="conv2")(y)
        return y


class SliceTransforms(nn.Module):
    """A bank of per-slice ConvStack5 parameter predictors."""

    num: int
    out: int = 32

    def setup(self):
        self.stacks = [ConvStack5(out=self.out, name=f"s{i}") for i in range(self.num)]

    def __call__(self, slice_index: int, x):
        return self.stacks[slice_index](x)
