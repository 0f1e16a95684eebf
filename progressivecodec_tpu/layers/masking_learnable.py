"""Parametric (learnable) mask stacks.

Behavioral spec: /root/reference/src/compress/layers/masking.py:110-123
("three-levels-learnable" — the only learnable policy actually dispatched
by the reference's forward; the gamma/nested/quantile variants are
constructed there but never reachable, masking.py:34-108 vs 163-296).
Stack: conv3 -> ReLU -> conv3 s2 -> ReLU -> subpel x2 -> ReLU -> conv3 ->
sigmoid.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from progressivecodec_tpu.layers.blocks import Conv, SubpelConv


class LearnableMaskStack(nn.Module):
    out: int = 32
    double_dim: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = Conv(c, 3, 1, name="conv0")(x)
        y = jax.nn.relu(y)
        y = Conv(c, 3, 2, name="conv1")(y)
        y = jax.nn.relu(y)
        y = SubpelConv(self.out, 2, name="up")(y)
        y = jax.nn.relu(y)
        y = Conv(self.out, 3, 1, name="conv2")(y)
        return jax.nn.sigmoid(y)
