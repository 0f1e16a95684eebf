"""Functional NHWC convolution ops with the reference's geometry.

The reference uses torch Conv2d(k, stride s, padding k//2) and
ConvTranspose2d(k, s, padding k//2, output_padding s-1)
(/root/reference/src/compress/models/utils.py:186-204).  We reproduce the
exact output geometry with explicit padding (torch floors; XLA 'SAME' pads
asymmetrically for even sizes, so explicit padding is required), but in
TPU-native NHWC layout with HWIO kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *, stride: int = 1) -> jax.Array:
    """Conv with padding = k//2 on all sides (torch Conv2d geometry).

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout); out: (B, H', W', Cout)
    with H' = floor((H + 2*(k//2) - k)/stride) + 1.
    """
    k = w.shape[0]
    p = k // 2
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(p, p), (p, p)],
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def deconv2d(x: jax.Array, w: jax.Array, b: jax.Array | None = None, *, stride: int = 2) -> jax.Array:
    """Transposed conv matching torch ConvTranspose2d(k, s, p=k//2, op=s-1).

    Implemented as an input-dilated convolution with a spatially flipped
    kernel: pad_lo = k-1-p, pad_hi = k-1-p+output_padding, lhs_dilation = s.
    Output size = H*s for the reference's (k=5, s=2, p=2, op=1) geometry.

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout) — already in forward-conv
    orientation (the torch->jax importer flips/transposes once at load).
    """
    k = w.shape[0]
    p = k // 2
    op = stride - 1
    w_flip = w[::-1, ::-1]
    out = jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1),
        padding=[(k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle with torch channel ordering.

    Input channel c*r*r + i*r + j maps to output channel c at spatial
    offset (i, j) — matches torch.nn.PixelShuffle so imported weights of
    subpel convs (layers/layers.py:20-24) behave identically.
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c
    return x.reshape(b, h * r, w * r, c)


def compute_padding(h: int, w: int, min_div: int = 64):
    """Centered padding to a multiple of `min_div`.

    Same contract as compressai.ops.compute_padding used at
    /root/reference/src/compress/training/step.py:318: returns
    ((top, bottom), (left, right)) so that padded dims are /min_div.
    """
    new_h = (h + min_div - 1) // min_div * min_div
    new_w = (w + min_div - 1) // min_div * min_div
    ph, pw = new_h - h, new_w - w
    top, left = ph // 2, pw // 2
    return (top, ph - top), (left, pw - left)


def pad_image(x: jax.Array, min_div: int = 64) -> tuple[jax.Array, tuple]:
    """Zero-pad NHWC image batch to /min_div; returns (padded, pads)."""
    (t, bm), (l, r) = compute_padding(x.shape[1], x.shape[2], min_div)
    return jnp.pad(x, ((0, 0), (t, bm), (l, r), (0, 0))), ((t, bm), (l, r))


def unpad_image(x: jax.Array, pads: tuple) -> jax.Array:
    (t, bm), (l, r) = pads
    h, w = x.shape[1], x.shape[2]
    return x[:, t : h - bm, l : w - r, :]
