from progressivecodec_tpu.layers.blocks import (
    Conv,
    Deconv,
    SubpelConv,
    GDN,
    WinBasedAttention,
    WinNoShiftAttention,
    ConvStack5,
    gelu,
)
from progressivecodec_tpu.layers.masking import channel_mask, apply_mask_noise
from progressivecodec_tpu.layers.postnets import (
    LatentPostNet,
    PostNet,
    ResidualBlockGDN,
    ResidualBlockSmall,
)
from progressivecodec_tpu.layers.unet import UNet

__all__ = [
    "Conv",
    "Deconv",
    "SubpelConv",
    "GDN",
    "WinBasedAttention",
    "WinNoShiftAttention",
    "ConvStack5",
    "gelu",
    "channel_mask",
    "apply_mask_noise",
    "UNet",
    "LatentPostNet",
    "PostNet",
    "ResidualBlockGDN",
    "ResidualBlockSmall",
]
