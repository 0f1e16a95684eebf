from progressivecodec_tpu.ops.math import (
    ste_round,
    lower_bound,
    nonneg_reparam,
    nonneg_init,
)
from progressivecodec_tpu.ops.conv import (
    conv2d,
    deconv2d,
    pixel_shuffle,
    compute_padding,
    pad_image,
    unpad_image,
)

__all__ = [
    "ste_round",
    "lower_bound",
    "nonneg_reparam",
    "nonneg_init",
    "conv2d",
    "deconv2d",
    "pixel_shuffle",
    "compute_padding",
    "pad_image",
    "unpad_image",
]
