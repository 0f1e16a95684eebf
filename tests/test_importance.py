"""Importance-map extraction + MaskEstractor shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.layers.importance import importance_map, MaskEstractor, snap_to_scale_table

TINY = ModelConfig(
    name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)


def test_snap_to_scale_table():
    table = np.array([0.1, 1.0, 10.0], np.float32)
    vals = jnp.asarray([-5.0, 0.05, 0.5, 2.0, 100.0])
    got = np.asarray(snap_to_scale_table(vals, table))
    # build_indexes snaps UP to the next table entry >= sigma
    # (entropy_models.py:661-666): 0.5 -> 1.0, 2.0 -> 10.0
    np.testing.assert_allclose(got, [0.1, 0.1, 1.0, 10.0, 10.0])


def test_importance_map_shapes():
    model = ChannelProgressiveWACNN(cfg=TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x
    )
    x_img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    imap = importance_map(
        model, variables, x_img, jax.random.PRNGKey(2), TINY.scale_table.values()
    )
    assert imap.shape == (1, 4, 4, 32)  # base latent shape
    assert (np.asarray(imap) >= 0).all()
    assert np.isfinite(np.asarray(imap)).all()


def test_mask_estractor_shapes():
    mod = MaskEstractor(N=16)
    y = jnp.zeros((1, 4, 4, 16))
    params = mod.init(jax.random.PRNGKey(0), y, y, jnp.concatenate([y, y], -1), jnp.concatenate([y, y], -1))
    out = mod.apply(params, y, y, jnp.concatenate([y, y], -1), jnp.concatenate([y, y], -1))
    assert out.shape == (1, 4, 4, 16)
