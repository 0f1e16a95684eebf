"""Granular codec: deterministic byte-identical streams, exact round
trips (the shared-executable determinism design)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.codec_granular import GranularCodec

TINY = ModelConfig(
    name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)


@pytest.fixture(scope="module")
def setup():
    model = ChannelProgressiveWACNN(cfg=TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x
    )
    return model, variables


def test_granular_roundtrip(setup):
    model, variables = setup
    codec = GranularCodec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    for q in [0, 2, 10]:
        data = codec.compress(x, quality=q, simulate=True)
        out = codec.decompress(data)
        assert bool(out["stream_ok"]), f"q={q}"
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
        )


def test_granular_streams_deterministic_across_instances(setup):
    """Two independent codec instances (fresh jit caches) must produce
    byte-identical streams and cross-decode — the shared-executable design
    guarantees sigma/mask bit-reproducibility between encode and decode."""
    model, variables = setup
    a = GranularCodec(model, variables, lanes=64)
    b = GranularCodec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    for q in [0, 5]:
        d_a = a.compress(x, quality=q)
        d_b = b.compress(x, quality=q)
        assert d_a["num_bytes"] == d_b["num_bytes"], f"q={q}"
        np.testing.assert_array_equal(d_a["stream"], d_b["stream"])
        np.testing.assert_array_equal(d_a["esc"], d_b["esc"])
        # cross-decode: instance b decodes instance a's stream
        out = b.decompress(d_a)
        assert bool(out["stream_ok"])


def test_granular_batched_roundtrip(setup):
    """B>1 images share one stream; round trip stays exact."""
    model, variables = setup
    codec = GranularCodec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(11), (2, 64, 64, 3))
    data = codec.compress(x, quality=5, simulate=True)
    out = codec.decompress(data)
    assert bool(out["stream_ok"])
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
    )


def test_granular_device_resident_roundtrip(setup):
    """to_host=False keeps the container on device (bench.py's pipelined
    path): it must round-trip AND carry the byte-identical stream the
    host path produces."""
    model, variables = setup
    codec = GranularCodec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(13), (2, 64, 64, 3))
    for q in [0, 5]:
        d_host = codec.compress(x, quality=q)
        d_dev = codec.compress(x, quality=q, to_host=False)
        assert "stream_dev" in d_dev and "num_bytes" not in d_dev
        nw = int(d_dev["n_words_dev"])
        ne = int(d_dev["n_esc_dev"])
        assert 2 * (nw + 2 * ne) == d_host["num_bytes"]
        np.testing.assert_array_equal(np.asarray(d_dev["stream_dev"][:nw]), d_host["stream"])
        np.testing.assert_array_equal(np.asarray(d_dev["esc_dev"][: 2 * ne]), d_host["esc"])
        out = codec.decompress(d_dev)
        assert bool(out["stream_ok"]), f"q={q}"
        ref = codec.decompress(d_host)
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(ref["x_hat"]), atol=0
        )


def test_granular_rem_roundtrip():
    """The REM variant now runs through the granular (shared-executable)
    codec, including its refinement banks in the shared prog fragment."""
    from progressivecodec_tpu.models.rem import PostRateProcessedNetwork
    import dataclasses

    cfg = dataclasses.replace(TINY, name="rate")
    model = PostRateProcessedNetwork(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(
        lambda r, xx: model.init(
            {"params": r}, xx, PostRateProcessedNetwork.init_qualities(cfg), training=False
        )
    )(jax.random.PRNGKey(0), x)
    from progressivecodec_tpu.models.codec_granular import make_codec

    codec = make_codec(model, variables, lanes=64)
    assert isinstance(codec, GranularCodec)
    xr = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    for q in [0, 1.0, 10.0]:
        data = codec.compress(xr, quality=q, simulate=True)
        out = codec.decompress(data)
        assert bool(out["stream_ok"]), f"q={q}"
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
        )


def test_granular_unrolled_variant_roundtrip():
    """delta_encode + support_progressive_slices>0 exercises the unrolled
    shared-fragment path end to end."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, delta_encode=True, support_progressive_slices=2, total_mu_rep=True
    )
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x
    )
    from progressivecodec_tpu.models.codec_granular import make_codec

    codec = make_codec(model, variables, lanes=64)
    xr = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    for q in [0, 5.0]:
        data = codec.compress(xr, quality=q, simulate=True)
        out = codec.decompress(data)
        assert bool(out["stream_ok"]), f"q={q}"
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
        )


def test_granular_out_of_distribution_lossless(setup):
    """VERDICT missing #1 end-to-end: an out-of-distribution latent whose
    symbols fall far outside the CDF supports must still round-trip
    losslessly through the full codec (escape coding), with stream_ok."""
    model, variables = setup
    codec = GranularCodec(model, variables, lanes=64)
    # extreme latent: quantized symbols land way beyond +-6 sigma supports
    y = 80.0 * jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, TINY.M))
    data = codec.compress_from_latent(y, (1, 64, 64, 3), quality=10, simulate=True)
    assert len(data["esc"]) > 0, "expected escapes for an OOD latent"
    out = codec.decompress(data)
    assert bool(out["stream_ok"])
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
    )
    # container serialization carries the escape segment
    blob = codec.serialize(data)
    back = codec.deserialize(blob)
    np.testing.assert_array_equal(back["esc"], data["esc"])
    out2 = codec.decompress(back)
    assert bool(out2["stream_ok"])
