"""PCT1-G grouped/sharded coder: topology-independent byte identity.

The grouped format splits lanes into G independent sub-streams so the
coder phase shards across a mesh (SURVEY §7.7; VERDICT round-1 missing
item).  Invariants tested here:
  * numpy grouped == G independent single-group PCT1 encodings
  * device fused grouped (one scan) == numpy grouped, byte-for-byte
  * mesh-sharded encode (one group per device) == fused grouped
  * grouped/sharded decode round-trips losslessly (incl. escapes, skips)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.coder import rans_numpy, rans_device
from progressivecodec_tpu.coder.tables import merge_tables
from progressivecodec_tpu.entropy import build_gaussian_tables
from progressivecodec_tpu.config import ScaleTableConfig
from progressivecodec_tpu.parallel.mesh import make_mesh
from progressivecodec_tpu.parallel.sharded_coder import (
    sharded_encode_stages,
    sharded_decode_stage,
)


@pytest.fixture(scope="module")
def gtables():
    merged, _ = merge_tables(build_gaussian_tables(ScaleTableConfig().values()))
    return merged


@pytest.fixture(scope="module")
def dtables(gtables):
    return rans_device.DeviceTables.from_tables(gtables)


def _payload(rng, tables, n, keep_p=1.0, escapes=False):
    idx = rng.integers(0, tables.cdf.shape[0], n).astype(np.int32)
    sym = np.round(rng.standard_normal(n) * 4).astype(np.int32)
    if escapes:
        hot = rng.random(n) < 0.01
        sym = np.where(hot, (rng.standard_normal(n) * 1e6).astype(np.int32), sym)
    keep = rng.random(n) < keep_p
    return sym, idx, keep


def test_numpy_grouped_roundtrip(rng, gtables):
    lanes, groups = 64, 4
    stages = [
        _payload(rng, gtables, 1000, 1.0, escapes=True),
        _payload(rng, gtables, 333, 0.5),
    ]
    streams = rans_numpy.encode_stages_grouped(stages, gtables, lanes, groups)
    assert len(streams) == groups
    outs, ok = rans_numpy.decode_stages_grouped(
        streams, gtables, [(i, k) for _, i, k in stages], lanes, groups
    )
    assert ok
    for (sym, _, keep), got in zip(stages, outs):
        np.testing.assert_array_equal(got, np.where(keep, sym, 0))


def test_device_fused_grouped_matches_numpy(rng, gtables, dtables):
    lanes, groups = 64, 4
    stages = [
        _payload(rng, gtables, 777, 0.8, escapes=True),
        _payload(rng, gtables, 128, 1.0),
    ]
    ref = rans_numpy.encode_stages_grouped(stages, gtables, lanes, groups)
    jst = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages]
    streams, n_words, escs, n_escs = rans_device.encode_stages_grouped(
        jst, dtables, lanes, groups
    )
    for g in range(groups):
        ref_words, ref_esc_start = ref[g]
        nw, ne = int(n_words[g]), int(n_escs[g])
        assert nw == ref_esc_start, f"group {g}"
        got = np.concatenate(
            [np.asarray(streams[g])[:nw], np.asarray(escs[g])[: 2 * ne]]
        )
        np.testing.assert_array_equal(got, ref_words)


def test_device_grouped_decode_roundtrip(rng, gtables, dtables):
    lanes, groups = 32, 4
    stages = [
        _payload(rng, gtables, 500, 0.7, escapes=True),
        _payload(rng, gtables, 200, 1.0),
    ]
    jst = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages]
    streams, n_words, escs, n_escs = rans_device.encode_stages_grouped(
        jst, dtables, lanes, groups
    )
    dec = rans_device.grouped_decoder_init(streams, lanes, groups)
    for sym, idx, keep in stages:
        dec, vals = rans_device.decode_stage_grouped(
            dec, streams, escs, jnp.asarray(idx), jnp.asarray(keep),
            dtables, lanes, groups,
        )
        np.testing.assert_array_equal(np.asarray(vals), np.where(keep, sym, 0))
    assert bool(rans_device.grouped_stream_ok(dec))


def test_sharded_encode_matches_fused_grouped(rng, gtables, dtables):
    """One lane group per mesh device — byte-identical sub-streams."""
    mesh = make_mesh(n_data=2, n_model=4)
    lanes, groups = 32, 4
    stages = [
        _payload(rng, gtables, 800, 0.9, escapes=True),
        _payload(rng, gtables, 100, 1.0),
    ]
    jst = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages]
    ref_s, ref_nw, ref_e, ref_ne = rans_device.encode_stages_grouped(
        jst, dtables, lanes, groups
    )
    with mesh:
        got_s, got_nw, got_e, got_ne = sharded_encode_stages(
            jst, dtables, lanes, mesh, axis="model"
        )
    np.testing.assert_array_equal(np.asarray(got_nw), np.asarray(ref_nw))
    np.testing.assert_array_equal(np.asarray(got_ne), np.asarray(ref_ne))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(got_e), np.asarray(ref_e))


def test_sharded_decode_roundtrip(rng, gtables, dtables):
    mesh = make_mesh(n_data=2, n_model=4)
    lanes, groups = 32, 4
    stages = [
        _payload(rng, gtables, 600, 0.6, escapes=True),
        _payload(rng, gtables, 321, 1.0),
    ]
    jst = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages]
    with mesh:
        streams, n_words, escs, n_escs = sharded_encode_stages(
            jst, dtables, lanes, mesh, axis="model"
        )
        dec = rans_device.grouped_decoder_init(streams, lanes, groups)
        for sym, idx, keep in stages:
            dec, vals = sharded_decode_stage(
                dec, streams, escs, jnp.asarray(idx), jnp.asarray(keep),
                dtables, lanes, mesh, axis="model",
            )
            np.testing.assert_array_equal(np.asarray(vals), np.where(keep, sym, 0))
    assert bool(rans_device.grouped_stream_ok(dec))


def _tiny_codec(groups=1, coder_mesh=None):
    from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
    from progressivecodec_tpu.models.codec_granular import GranularCodec

    cfg = ModelConfig(
        name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
        scale_table=ScaleTableConfig(levels=32),
    )
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x
    )
    return GranularCodec(
        model, variables, lanes=64, groups=groups, coder_mesh=coder_mesh
    )


def test_grouped_codec_roundtrip_and_topology_independence():
    """End-to-end: the grouped codec round-trips, and the mesh-sharded
    coder produces byte-identical containers to the fused single-device
    grouped coder (VERDICT: sharded rANS with streams byte-identical)."""
    fused = _tiny_codec(groups=4)
    mesh = make_mesh(n_data=2, n_model=4)
    sharded = _tiny_codec(coder_mesh=mesh)
    assert sharded.groups == 4
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    for q in (0, 5):
        d_f = fused.compress(x, quality=q, simulate=True)
        with mesh:
            d_s = sharded.compress(x, quality=q)
        assert d_f["num_bytes"] == d_s["num_bytes"], f"q={q}"
        for g in range(4):
            np.testing.assert_array_equal(d_f["streams"][g], d_s["streams"][g])
            np.testing.assert_array_equal(d_f["escs"][g], d_s["escs"][g])
        # fused decode of the sharded container, and vice versa
        out = fused.decompress(d_s)
        assert bool(out["stream_ok"])
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(d_f["x_hat"]), atol=1e-5
        )
        with mesh:
            out_s = sharded.decompress(d_f)
        assert bool(out_s["stream_ok"])


def test_grouped_container_serialization_roundtrip():
    codec = _tiny_codec(groups=4)
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))
    data = codec.compress(x, quality=5)
    back = codec.deserialize(codec.serialize(data))
    assert back.get("groups") == 4
    for g in range(4):
        np.testing.assert_array_equal(back["streams"][g], data["streams"][g])
        np.testing.assert_array_equal(back["escs"][g], data["escs"][g])
    out = codec.decompress(back)
    assert bool(out["stream_ok"])
