"""Native C++ coder vs numpy golden implementation: bit-identity,
including the lossless escape extension."""

import numpy as np
import pytest

from progressivecodec_tpu.coder import rans_numpy
from progressivecodec_tpu.coder import rans_host
from progressivecodec_tpu.coder.tables import merge_tables
from progressivecodec_tpu.entropy import build_gaussian_tables
from progressivecodec_tpu.config import ScaleTableConfig


@pytest.fixture(scope="module")
def gtables():
    merged, _ = merge_tables(build_gaussian_tables(ScaleTableConfig().values()))
    return merged


def _payload(rng, tables, n, keep_p=1.0):
    idx = rng.integers(0, tables.cdf.shape[0], n).astype(np.int32)
    sym = np.round(rng.standard_normal(n) * 5).astype(np.int32)
    keep = rng.random(n) < keep_p
    return sym, idx, keep


def test_native_encode_matches_numpy(rng, gtables):
    stages = [_payload(rng, gtables, n, kp) for n, kp in [(1000, 1.0), (333, 0.4), (64, 0.0)]]
    for lanes in (8, 64, 512):
        ref, ref_esc = rans_numpy.encode_stages(stages, gtables, lanes)
        got, got_esc = rans_host.encode_stages(stages, gtables, lanes)
        assert got_esc == ref_esc
        np.testing.assert_array_equal(got, ref)


def test_native_decode_roundtrip(rng, gtables):
    lanes = 128
    stages = [_payload(rng, gtables, n, kp) for n, kp in [(5000, 0.7), (100, 1.0)]]
    stream, esc_start = rans_host.encode_stages(stages, gtables, lanes)
    outs, ok = rans_host.decode_stages(
        stream, gtables, [(i, k) for _, i, k in stages], lanes, esc_start
    )
    assert ok
    ref_outs, ref_ok = rans_numpy.decode_stages(
        stream, gtables, [(i, k) for _, i, k in stages], lanes, esc_start
    )
    assert ref_ok
    for got, ref in zip(outs, ref_outs):
        np.testing.assert_array_equal(got, ref)


def test_native_cross_decode(rng, gtables):
    """numpy-encoded stream decodes bit-exactly with the native decoder."""
    lanes = 32
    sym, idx, keep = _payload(rng, gtables, 2048, 0.5)
    stream, esc_start = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    outs, ok = rans_host.decode_stages(stream, gtables, [(idx, keep)], lanes, esc_start)
    assert ok
    np.testing.assert_array_equal(outs[0], np.where(keep, sym, 0))


def test_native_escape_roundtrip_lossless(rng, gtables):
    """Out-of-support symbols (incl. int32 extremes) round-trip exactly on
    the native coder and streams are bit-identical to the numpy golden."""
    lanes = 16
    idx = np.zeros(300, np.int32)  # narrowest support row
    sym = (rng.standard_normal(300) * 800).astype(np.int32)
    sym[:4] = [2**31 - 1, -(2**31), 31337, -31337]
    keep = rng.random(300) < 0.85
    ref, ref_esc = rans_numpy.encode_stages([(sym, idx, keep)], gtables, lanes)
    got, got_esc = rans_host.encode_stages([(sym, idx, keep)], gtables, lanes)
    assert got_esc == ref_esc and ref_esc < len(ref)
    np.testing.assert_array_equal(got, ref)
    outs, ok = rans_host.decode_stages(got, gtables, [(idx, keep)], lanes, got_esc)
    assert ok
    np.testing.assert_array_equal(outs[0], np.where(keep, sym, 0))
