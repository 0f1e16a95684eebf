"""Torch importer/exporter breadth across the model family (VERDICT
round-2 missing #4): single-decoder (`g_s.` prefix), WACNN (`cnn`) anchor
trees, REM `post_latent` banks, u_net_post refine nets, learnable mask
convs, and joiner params — each validated by an
export -> import -> tree-equality roundtrip against a freshly initialized
model of that family (no reference checkpoints ship, so the mapping is
validated structurally both ways).

Reference surgery being mirrored: utils/state_dict_handler.py:10-81,
train.py:27-84 (checkpoint_base warm start), CHProgREM.py:224-234.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.rem import PostRateProcessedNetwork
from progressivecodec_tpu.models.wacnn import WACNN
from progressivecodec_tpu.models.torch_import import (
    export_progressive,
    export_rem,
    export_wacnn,
    import_progressive,
    import_rem,
    import_wacnn,
)

TINY = dict(
    N=32,
    M=64,
    dim_chunk=8,
    division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: keys {sorted(a)} != {sorted(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}"
            )


def _init_params(model, x, **apply_kwargs):
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, **apply_kwargs)
    return jax.tree.map(np.asarray, variables["params"])


@pytest.mark.parametrize(
    "kw",
    [
        dict(multiple_decoder=False, stack_prog=False),
        dict(u_net_post=1),
        dict(u_net_post=2),
        dict(mask_policy="three-levels-learnable"),
        dict(joiner_policy="cond"),
    ],
    ids=["single_decoder", "unet_post1", "unet_post2", "learnable_mask", "joiner_cond"],
)
def test_progressive_family_roundtrip(kw):
    cfg = ModelConfig(name="channel", **TINY, **kw)
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = _init_params(model, x, training=False)
    sd = export_progressive(params, cfg)
    back = import_progressive(sd, cfg)
    _tree_equal(params, back)


def test_wacnn_roundtrip():
    cfg = ModelConfig(name="cnn", **TINY)
    model = WACNN(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = _init_params(model, x, training=False)
    sd = export_wacnn(params, cfg)
    back = import_wacnn(sd, cfg)
    _tree_equal(params, back)


def test_rem_roundtrip():
    cfg = ModelConfig(name="rate", **TINY, stack_prog=False)
    model = PostRateProcessedNetwork(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = _init_params(model, x, training=False)
    sd = export_rem(params, cfg)
    back = import_rem(sd, cfg)
    _tree_equal(params, back)


def test_single_decoder_import_feeds_model():
    """An imported single-decoder tree must actually run the model."""
    cfg = ModelConfig(name="channel", multiple_decoder=False, stack_prog=False, **TINY)
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = _init_params(model, x, training=False)
    back = import_progressive(export_progressive(params, cfg), cfg)
    back = jax.tree.map(jnp.asarray, back)
    out = model.apply(
        {"params": back}, x, 5.0, training=False,
        method=ChannelProgressiveWACNN.forward_single_quality,
    )
    assert np.isfinite(np.asarray(out["x_hat"])).all()
