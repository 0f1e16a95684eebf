"""rANS coder tests: lossless round-trip properties (incl. escape coding
of out-of-support symbols), skip semantics, numpy <-> device bit-identity,
multi-stage streams."""

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


def _device_stream(stream, n_words, esc, n_esc):
    """Concatenate the device buffers into the numpy-equivalent words."""
    return np.concatenate(
        [np.asarray(stream)[: int(n_words)], np.asarray(esc)[: 2 * int(n_esc)]]
    )


@pytest.mark.parametrize("n,lanes", [(1, 4), (37, 8), (1000, 64), (5000, 512)])
def test_numpy_roundtrip(rng, gtables, n, lanes):
    sym, idx, keep = _random_payload(rng, gtables, n)
    stream, esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    outs, ok = rans_numpy.decode_stages(stream, gtables, [(idx, keep)], lanes, esc_start)
    assert ok
    np.testing.assert_array_equal(outs[0], sym)  # lossless, always


def test_numpy_roundtrip_with_skips(rng, gtables):
    n, lanes = 2000, 64
    sym, idx, keep = _random_payload(rng, gtables, n)
    keep = rng.random(n) < 0.3  # 70% masked out
    stream, esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    outs, ok = rans_numpy.decode_stages(stream, gtables, [(idx, keep)], lanes, esc_start)
    assert ok
    np.testing.assert_array_equal(outs[0], np.where(keep, sym, 0))


def test_skipped_elements_cost_zero_bits(rng, gtables):
    n, lanes = 2000, 16
    sym, idx, _ = _random_payload(rng, gtables, n)
    none = np.zeros(n, dtype=bool)
    stream, esc_start = rans_numpy.encode_stages([(sym, idx, none)], gtables, lanes)
    # only the lane-state header, no payload, no escapes
    assert len(stream) == 2 * lanes and esc_start == 2 * lanes
    head = stream.astype(np.uint64)
    states = head[0::2] | (head[1::2] << 16)
    assert (states == RANS_L).all()


def test_multi_stage_roundtrip(rng, gtables):
    lanes = 32
    stages = [_random_payload(rng, gtables, n) for n in (100, 1, 777, 4096)]
    stages[2] = (stages[2][0], stages[2][1], rng.random(777) < 0.5)
    stream, esc_start = rans_numpy.encode_stages(stages, gtables, lanes)
    dec = rans_numpy.StreamDecoder(stream, gtables, lanes, esc_start)
    for sym, idx, keep in stages:
        out = dec.decode_stage(idx, keep)
        np.testing.assert_array_equal(out, np.where(keep, sym, 0))
    assert dec.stream_ok


def test_out_of_support_symbols_roundtrip_losslessly(rng, gtables):
    """The escape extension (VERDICT missing #1): symbols far outside the
    CDF support — including extreme int32 magnitudes — must round-trip
    exactly (reference bypass semantics, rans_interface.cpp:99-164)."""
    lanes = 8
    idx = np.zeros(64, np.int32)  # smallest-scale row -> narrow support
    sym = (rng.standard_normal(64) * 1000).astype(np.int32)
    sym[0] = 2**31 - 1
    sym[1] = -(2**31)
    sym[2] = 123456789
    keep = np.ones(64, bool)
    stream, esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    assert esc_start < len(stream)  # escapes present
    outs, ok = rans_numpy.decode_stages(stream, gtables, [(idx, keep)], lanes, esc_start)
    assert ok
    np.testing.assert_array_equal(outs[0], sym)


def test_escape_overhead_is_zero_in_normal_operation(rng, gtables):
    """In-support symbols never produce escape words."""
    n, lanes = 50_000, 128
    row = 40
    idx = np.full(n, row, np.int32)
    lo = gtables.offset[row]
    hi = lo + gtables.max_symbol[row]
    sym = rng.integers(lo, hi + 1, n).astype(np.int32)
    keep = np.ones(n, bool)
    stream, esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    assert esc_start == len(stream)  # empty escape segment


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
    stream, _ = rans_numpy.encode_stages([(vals, idx, keep)], gtables, lanes)
    bits = 16 * (len(stream) - 2 * lanes)
    entropy = -np.sum([probs[v] * np.log2(probs[v]) for v in range(len(probs))]) * n
    assert bits < entropy * 1.02 + 16


def test_device_matches_numpy(rng, gtables):
    n, lanes = 3000, 128
    sym, idx, keep = _random_payload(rng, gtables, n)
    keep = rng.random(n) < 0.6
    ref_stream, ref_esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)

    dt = rans_device.DeviceTables.from_tables(gtables)
    stream, n_words, esc, n_esc = rans_device.encode_stages(
        [(jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(keep))], dt, lanes
    )
    assert int(n_words) == ref_esc_start
    np.testing.assert_array_equal(_device_stream(stream, n_words, esc, n_esc), ref_stream)

    # device decode of numpy-encoded stream (payload and escape segments)
    payload = jnp.asarray(ref_stream[:ref_esc_start])
    esc_seg = jnp.asarray(ref_stream[ref_esc_start:])
    dec = rans_device.decoder_init(payload, lanes)
    dec, vals = rans_device.decode_stage(
        dec, payload, esc_seg, jnp.asarray(idx), jnp.asarray(keep), dt, lanes
    )
    assert bool(rans_device.stream_ok(dec))
    np.testing.assert_array_equal(np.asarray(vals), np.where(keep, sym, 0))


def test_device_escape_roundtrip(rng, gtables):
    """Out-of-support symbols round-trip losslessly on the device coder and
    the stream is bit-identical to the numpy golden."""
    n, lanes = 512, 32
    idx = np.zeros(n, np.int32)
    sym = (rng.standard_normal(n) * 500).astype(np.int32)
    sym[:4] = [2**31 - 1, -(2**31), 999999, -999999]
    keep = rng.random(n) < 0.8
    ref_stream, ref_esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)

    dt = rans_device.DeviceTables.from_tables(gtables)
    stream, n_words, esc, n_esc = rans_device.encode_stages(
        [(jnp.asarray(sym), jnp.asarray(idx), jnp.asarray(keep))], dt, lanes
    )
    np.testing.assert_array_equal(_device_stream(stream, n_words, esc, n_esc), ref_stream)

    dec = rans_device.decoder_init(stream, lanes)
    dec, vals = rans_device.decode_stage(
        dec, stream, esc, jnp.asarray(idx), jnp.asarray(keep), dt, lanes
    )
    assert bool(rans_device.stream_ok(dec))
    np.testing.assert_array_equal(np.asarray(vals), np.where(keep, sym, 0))


def test_device_multi_stage(rng, gtables):
    lanes = 64
    dt = rans_device.DeviceTables.from_tables(gtables)
    stages = [_random_payload(rng, gtables, n) for n in (500, 129)]
    jstages = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages]
    stream, n_words, esc, n_esc = rans_device.encode_stages(jstages, dt, lanes)
    ref, ref_esc_start = rans_numpy.encode_stages(stages, gtables, lanes)
    np.testing.assert_array_equal(_device_stream(stream, n_words, esc, n_esc), ref)

    dec = rans_device.decoder_init(stream, lanes)
    for sym, idx, keep in stages:
        dec, vals = rans_device.decode_stage(
            dec, stream, esc, jnp.asarray(idx), jnp.asarray(keep), dt, lanes
        )
        np.testing.assert_array_equal(np.asarray(vals), sym)
    assert bool(rans_device.stream_ok(dec))
