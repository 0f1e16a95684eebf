from progressivecodec_tpu.models.wacnn import WACNN
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.registry import get_model

__all__ = ["WACNN", "ChannelProgressiveWACNN", "get_model"]
