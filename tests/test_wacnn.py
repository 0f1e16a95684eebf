"""WACNN anchor model: forward + real-codec round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.wacnn import WACNN
from progressivecodec_tpu.models.codec_granular import GranularCodec as Codec

TINY = ModelConfig(
    name="cnn", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)


@pytest.fixture(scope="module")
def wacnn():
    model = WACNN(cfg=TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    return model, variables


def test_wacnn_forward(wacnn):
    model, variables = wacnn
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = model.apply(variables, x, training=True, rng=jax.random.PRNGKey(2))
    assert out["x_hat"].shape == x.shape
    assert out["likelihoods"]["y"].shape == (2, 4, 4, 64)
    assert np.isfinite(np.asarray(out["x_hat"])).all()


def test_wacnn_codec_roundtrip(wacnn):
    model, variables = wacnn
    codec = Codec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    data = codec.compress(x, simulate=True)
    out = codec.decompress(data)
    assert bool(out["stream_ok"])
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
    )


def test_wacnn_granular_codec(wacnn):
    from progressivecodec_tpu.models.codec_granular import make_codec, GranularCodec

    model, variables = wacnn
    codec = make_codec(model, variables, lanes=64)
    assert isinstance(codec, GranularCodec)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    data = codec.compress(x, simulate=True)
    out = codec.decompress(data)
    assert bool(out["stream_ok"])
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
    )
