"""rANS coder tests: round-trip properties, skip/clamp semantics,
numpy <-> device bit-identity, multi-stage streams."""

import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.coder import rans_numpy, rans_device
from progressivecodec_tpu.coder.tables import CoderTables, merge_tables, RANS_L
from progressivecodec_tpu.entropy import build_gaussian_tables
from progressivecodec_tpu.config import ScaleTableConfig


@pytest.fixture(scope="module")
def gtables():
    table = ScaleTableConfig().values()
    t = build_gaussian_tables(table)
    merged, starts = merge_tables(t)
    return merged


def _random_payload(rng, tables, n, sigma=4.0):
    idx = rng.integers(0, tables.cdf.shape[0], n).astype(np.int32)
    sym = np.round(rng.standard_normal(n) * sigma).astype(np.int32)
    keep = np.ones(n, dtype=bool)
    return sym, idx, keep


@pytest.mark.parametrize("n,lanes", [(1, 4), (37, 8), (1000, 64), (5000, 512)])
def test_numpy_roundtrip(rng, gtables, n, lanes):
    sym, idx, keep = _random_payload(rng, gtables, n)
    stream = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    outs, ok = rans_numpy.decode_stages(stream, gtables, [(idx, keep)], lanes)
    assert ok
    expect = rans_numpy.clamp_symbols(sym, idx, gtables) + gtables.offset[idx]
    np.testing.assert_array_equal(outs[0], expect)


def test_numpy_roundtrip_with_skips(rng, gtables):
    n, lanes = 2000, 64
    sym, idx, keep = _random_payload(rng, gtables, n)
    keep = rng.random(n) < 0.3  # 70% masked out
    stream = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    outs, ok = rans_numpy.decode_stages(stream, gtables, [(idx, keep)], lanes)
    assert ok
    expect = np.where(keep, rans_numpy.clamp_symbols(sym, idx, gtables) + gtables.offset[idx], 0)
    np.testing.assert_array_equal(outs[0], expect)


def test_skipped_elements_cost_zero_bits(rng, gtables):
    n, lanes = 2000, 16
    sym, idx, _ = _random_payload(rng, gtables, n)
    none = np.zeros(n, dtype=bool)
    stream = rans_numpy.encode_stages([(sym, idx, none)], gtables, lanes)
    # only the lane-state header, no payload
    assert len(stream) == 2 * lanes
    head = stream.astype(np.uint64)
    states = head[0::2] | (head[1::2] << 16)
    assert (states == RANS_L).all()


def test_multi_stage_roundtrip(rng, gtables):
    lanes = 32
    stages = [_random_payload(rng, gtables, n) for n in (100, 1, 777, 4096)]
    stages[2] = (stages[2][0], stages[2][1], rng.random(777) < 0.5)
    stream = rans_numpy.encode_stages(stages, gtables, lanes)
    dec = rans_numpy.StreamDecoder(stream, gtables, lanes)
    for sym, idx, keep in stages:
        out = dec.decode_stage(idx, keep)
        expect = np.where(
            keep, rans_numpy.clamp_symbols(sym, idx, gtables) + gtables.offset[idx], 0
        )
        np.testing.assert_array_equal(out, expect)
    assert dec.stream_ok


def test_out_of_range_symbols_clamp(rng, gtables):
    lanes = 8
    idx = np.zeros(64, np.int32)  # smallest-scale row -> narrow support
    sym = (rng.standard_normal(64) * 1000).astype(np.int32)
    keep = np.ones(64, bool)
    stream = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    outs, ok = rans_numpy.decode_stages(stream, gtables, [(idx, keep)], lanes)
    assert ok
    lo = gtables.offset[0]
    hi = gtables.offset[0] + gtables.max_symbol[0]
    assert outs[0].min() >= lo and outs[0].max() <= hi
    np.testing.assert_array_equal(outs[0], np.clip(sym, lo, hi))


def test_compression_is_near_entropy(rng, gtables):
    """Coding cost should be within ~1% + lane overhead of the entropy."""
    n, lanes = 200_000, 512
    row = 40  # mid-scale row
    idx = np.full(n, row, np.int32)
    cdf = gtables.cdf[row]
    ln = gtables.cdf_length[row]
    probs = np.diff(cdf[:ln]).astype(np.float64) / (1 << 16)
    vals = rng.choice(len(probs), size=n, p=probs).astype(np.int32) + gtables.offset[row]
    keep = np.ones(n, bool)
    stream = rans_numpy.encode_stages([(vals, idx, keep)], gtables, lanes)
    bits = 16 * (len(stream) - 2 * lanes)
    entropy = -np.sum([probs[v] * np.log2(probs[v]) for v in range(len(probs))]) * n
    assert bits < entropy * 1.02 + 16


def test_device_matches_numpy(rng, gtables):
    n, lanes = 3000, 128
    sym, idx, keep = _random_payload(rng, gtables, n)
    keep = rng.random(n) < 0.6
    ref_stream = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)

    dt = rans_device.DeviceTables.from_tables(gtables)
    stream, n_words = rans_device.encode_stages(
        [(jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(keep))], dt, lanes
    )
    n_words = int(n_words)
    got = np.asarray(stream)[:n_words]
    np.testing.assert_array_equal(got, ref_stream)

    # device decode of numpy-encoded stream
    dec = rans_device.decoder_init(jnp.asarray(ref_stream), lanes)
    dec, vals = rans_device.decode_stage(
        dec, jnp.asarray(ref_stream), jnp.asarray(idx), jnp.asarray(keep), dt, lanes
    )
    assert bool(rans_device.stream_ok(dec))
    expect = np.where(keep, rans_numpy.clamp_symbols(sym, idx, gtables) + gtables.offset[idx], 0)
    np.testing.assert_array_equal(np.asarray(vals), expect)


def test_device_multi_stage(rng, gtables):
    lanes = 64
    dt = rans_device.DeviceTables.from_tables(gtables)
    stages = [_random_payload(rng, gtables, n) for n in (500, 129)]
    jstages = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages]
    stream, n_words = rans_device.encode_stages(jstages, dt, lanes)
    ref = rans_numpy.encode_stages(stages, gtables, lanes)
    np.testing.assert_array_equal(np.asarray(stream)[: int(n_words)], ref)

    dec = rans_device.decoder_init(stream, lanes)
    for sym, idx, keep in stages:
        dec, vals = rans_device.decode_stage(
            dec, stream, jnp.asarray(idx), jnp.asarray(keep), dt, lanes
        )
        expect = rans_numpy.clamp_symbols(sym, idx, gtables) + gtables.offset[idx]
        np.testing.assert_array_equal(np.asarray(vals), expect)
    assert bool(rans_device.stream_ok(dec))
