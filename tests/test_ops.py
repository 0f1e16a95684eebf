"""Unit tests for the numerics kernel layer: gradients and torch-parity
of conv geometry (torch CPU is available and used only as an independent
oracle, never at runtime)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from progressivecodec_tpu.ops import (
    ste_round,
    lower_bound,
    nonneg_reparam,
    nonneg_init,
    conv2d,
    deconv2d,
    pixel_shuffle,
    compute_padding,
    pad_image,
    unpad_image,
)


def test_ste_round_forward_and_grad():
    x = jnp.array([0.2, 0.7, -1.4, 2.5])
    np.testing.assert_allclose(ste_round(x), jnp.round(x))
    g = jax.grad(lambda v: (ste_round(v) * jnp.arange(1.0, 5.0)).sum())(x)
    np.testing.assert_allclose(g, np.arange(1.0, 5.0))


def test_lower_bound_grad_semantics():
    # grad passes when x >= bound, or when pushing x up (g < 0)
    x = jnp.array([0.5, 2.0, 0.5, 2.0])
    coeff = jnp.array([1.0, 1.0, -1.0, -1.0])  # dL/dy = coeff
    g = jax.grad(lambda v: (lower_bound(v, 1.0) * coeff).sum())(x)
    # x=0.5 below bound with g>0 -> blocked; g<0 -> passes
    np.testing.assert_allclose(g, [0.0, 1.0, -1.0, -1.0])


def test_nonneg_reparam_roundtrip():
    vals = jnp.array([0.0, 0.1, 1.0, 3.0])
    raw = nonneg_init(vals)
    back = nonneg_reparam(raw)
    np.testing.assert_allclose(back, vals, atol=1e-6)


@pytest.mark.parametrize("k,stride,hw", [(5, 2, 32), (3, 1, 16), (5, 2, 30), (3, 2, 16)])
def test_conv2d_matches_torch(rng, k, stride, hw):
    cin, cout = 6, 8
    x = rng.standard_normal((2, hw, hw, cin)).astype(np.float32)
    w = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)

    got = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride)

    tw = torch.tensor(w.transpose(3, 2, 0, 1))  # HWIO -> OIHW
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    ref = F.conv2d(tx, tw, torch.tensor(b), stride=stride, padding=k // 2)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("k,stride,hw", [(5, 2, 16), (5, 2, 9), (3, 2, 8)])
def test_deconv2d_matches_torch(rng, k, stride, hw):
    cin, cout = 6, 4
    x = rng.standard_normal((2, hw, hw, cin)).astype(np.float32)
    w = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32)

    got = deconv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride)

    # torch ConvTranspose2d weight layout: (in, out, kh, kw)
    tw = torch.tensor(w.transpose(2, 3, 0, 1))
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    ref = F.conv_transpose2d(
        tx, tw, torch.tensor(b), stride=stride, padding=k // 2, output_padding=stride - 1
    )
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pixel_shuffle_matches_torch(rng):
    r = 2
    x = rng.standard_normal((2, 4, 4, 3 * r * r)).astype(np.float32)
    got = pixel_shuffle(jnp.asarray(x), r)
    ref = torch.pixel_shuffle(torch.tensor(x.transpose(0, 3, 1, 2)), r)
    np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1))


def test_padding_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 500, 755, 3)).astype(np.float32))
    padded, pads = pad_image(x, 64)
    assert padded.shape[1] % 64 == 0 and padded.shape[2] % 64 == 0
    back = unpad_image(padded, pads)
    np.testing.assert_allclose(back, x)
    (t, b), (l, r) = compute_padding(500, 755, 64)
    assert (500 + t + b) % 64 == 0 and (755 + l + r) % 64 == 0
