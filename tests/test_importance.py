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


@pytest.fixture(scope="module")
def tiny_setup():
    model = ChannelProgressiveWACNN(cfg=TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x
    )
    return model, variables


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


def test_cust_map_codec_roundtrip(tiny_setup):
    """VERDICT missing #3: cust_map threaded end to end — encoder and
    decoder derive the identical mask from the same importance map
    (CHProg_cnn.py:686,721,823,849-850,964), streams validate, and the
    map actually changes what gets coded vs the sigma ranking."""
    import numpy as np
    from progressivecodec_tpu.models.codec_granular import make_codec

    model, variables = tiny_setup
    codec = make_codec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    # synthetic importance map over the enhancement latent (B, h, w, d0)
    d0 = model.cfg.division_channel
    cm = jax.random.uniform(jax.random.PRNGKey(6), (1, 4, 4, d0))

    data = codec.compress(x, quality=4, cust_map=cm, simulate=True)
    out = codec.decompress(data, cust_map=cm)
    assert bool(out["stream_ok"])
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
    )
    # map-ranked coding differs from sigma-ranked coding
    data_sigma = codec.compress(x, quality=4)
    assert (
        len(data["stream"]) != len(data_sigma["stream"])
        or not np.array_equal(data["stream"], data_sigma["stream"])
    )


def test_mask_estractor_trains(tiny_setup):
    """ImportanceMapDataset -> MaskEstractor connection: features, target
    map, and a jitted regression step run and the loss is finite and
    improves over a few steps."""
    import numpy as np
    from progressivecodec_tpu.training.mask_trainer import (
        init_mask_estractor, make_mask_train_step, mask_features,
        importance_target, predict_cust_map,
    )

    model, variables = tiny_setup
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3))
    st = model.cfg.scale_table.values()
    est, params = init_mask_estractor(jax.random.PRNGKey(8), model, variables, x)
    feats = mask_features(model, variables, x)
    target = importance_target(model, variables, x, jax.random.PRNGKey(9), st)
    tx, step = make_mask_train_step(est, lr=1e-3)
    opt_state = tx.init(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, feats, target)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    pred = predict_cust_map(est, params, model, variables, x)
    assert pred.shape == target.shape
