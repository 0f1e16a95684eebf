"""3-level UNet used by the optional u_net_post image refinement.

Behavioral spec: /root/reference/src/compress/layers/unet.py:70-111
(ConvBlockResidual + SE gates, 4 ResBlocks at the bottleneck, subpel
upsampling), rebuilt NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from progressivecodec_tpu.layers.blocks import Conv
from progressivecodec_tpu.ops.conv import pixel_shuffle


class SELayer(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        w1 = self.param("fc1", nn.initializers.lecun_normal(), (c, c // self.reduction))
        w2 = self.param("fc2", nn.initializers.lecun_normal(), (c // self.reduction, c))
        y = jax.nn.relu(y @ w1)
        y = jax.nn.sigmoid(y @ w2)
        return x * y[:, None, None, :]


class ConvBlockResidual(nn.Module):
    out: int
    se_layer: bool = True

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out, kernel_size=3, stride=1, name="conv1")(x)
        y = jax.nn.leaky_relu(y, 0.01)
        y = Conv(self.out, kernel_size=3, stride=1, name="conv2")(y)
        if self.se_layer:
            y = SELayer(name="se")(y)
        skip = Conv(self.out, kernel_size=1, stride=1, name="up_dim")(x)
        return skip + y


class ResBlock(nn.Module):
    slope: float = 0.0

    @nn.compact
    def __call__(self, x):
        act = (lambda v: jax.nn.relu(v)) if self.slope < 1e-4 else (
            lambda v: jax.nn.leaky_relu(v, self.slope)
        )
        y = act(x)
        y = Conv(x.shape[-1], kernel_size=3, stride=1, name="conv1")(y)
        y = act(y)
        y = Conv(x.shape[-1], kernel_size=3, stride=1, name="conv2")(y)
        return x + y


def _max_pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class SubpelConv1x1(nn.Module):
    out: int
    r: int = 2

    @nn.compact
    def __call__(self, x):
        y = Conv(self.out * self.r**2, kernel_size=1, stride=1, name="conv")(x)
        return pixel_shuffle(y, self.r)


class UNet(nn.Module):
    out_ch: int = 16

    @nn.compact
    def __call__(self, x):
        x1 = ConvBlockResidual(32, name="conv1")(x)
        x2 = _max_pool2(x1)
        x2 = ConvBlockResidual(64, name="conv2")(x2)
        x3 = _max_pool2(x2)
        x3 = ConvBlockResidual(128, name="conv3")(x3)
        for i in range(4):
            x3 = ResBlock(name=f"refine{i}")(x3)
        d3 = SubpelConv1x1(64, name="up3")(x3)
        d3 = jnp.concatenate([x2, d3], axis=-1)
        d3 = ConvBlockResidual(64, name="up_conv3")(d3)
        d2 = SubpelConv1x1(32, name="up2")(d3)
        d2 = jnp.concatenate([x1, d2], axis=-1)
        return ConvBlockResidual(self.out_ch, name="up_conv2")(d2)
