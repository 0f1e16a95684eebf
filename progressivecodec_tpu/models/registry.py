"""Model registry: name -> module instance (models/__init__.py:8-88 surface)."""

from __future__ import annotations

from progressivecodec_tpu.config import ModelConfig


def get_model(cfg: ModelConfig):
    from progressivecodec_tpu.models.wacnn import WACNN
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN

    if cfg.name == "cnn":
        return WACNN(cfg=cfg)
    if cfg.name == "channel":
        return ChannelProgressiveWACNN(cfg=cfg)
    if cfg.name == "rate":
        from progressivecodec_tpu.models.rem import PostRateProcessedNetwork

        return PostRateProcessedNetwork(cfg=cfg)
    raise KeyError(f"unknown model {cfg.name!r} (have: cnn, channel, rate)")
