"""Pallas encode-scan kernel: bit-identity with the XLA scan reference.

Runs in interpreter mode (pltpu.force_tpu_interpret_mode) so the suite
exercises the kernel logic on CPU; on-chip bit-identity at full stream
sizes is asserted by the bench/probe tooling (tools/probe_phases.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from progressivecodec_tpu.coder import rans_device
from progressivecodec_tpu.coder.rans_pallas import encode_scan_rev_pallas


@pytest.mark.parametrize("p,k,seed", [(37, 64, 0), (8, 8, 1), (300, 128, 2)])
def test_pallas_encode_scan_bit_identical(p, k, seed):
    rng = np.random.default_rng(seed)
    freq = rng.integers(1, 60000, (p, k)).astype(np.uint32)
    start = rng.integers(0, 5000, (p, k)).astype(np.uint32)
    sf = jnp.asarray((start << 16) | freq)
    kp = jnp.asarray(rng.random((p, k)) < 0.8)

    states_ref, words_ref, flags_ref = rans_device.encode_scan_rev(sf, kp, k)
    with pltpu.force_tpu_interpret_mode():
        states_p, words_p, flags_p = encode_scan_rev_pallas(sf, kp, k)
    np.testing.assert_array_equal(np.asarray(states_ref), np.asarray(states_p))
    np.testing.assert_array_equal(np.asarray(words_ref), np.asarray(words_p))
    np.testing.assert_array_equal(np.asarray(flags_ref), np.asarray(flags_p))


def test_pallas_encode_scan_extreme_freqs():
    """freq=2^16 single-symbol rows and freq=1 rows exercise the exact
    two-limb division at both extremes of the quotient range."""
    k = 64
    p = 16
    rng = np.random.default_rng(3)
    freq = np.where(rng.random((p, k)) < 0.5, 1, 65535).astype(np.uint32)
    start = np.zeros((p, k), np.uint32)
    sf = jnp.asarray((start << 16) | freq)
    kp = jnp.ones((p, k), bool)
    states_ref, words_ref, flags_ref = rans_device.encode_scan_rev(sf, kp, k)
    with pltpu.force_tpu_interpret_mode():
        states_p, words_p, flags_p = encode_scan_rev_pallas(sf, kp, k)
    np.testing.assert_array_equal(np.asarray(states_ref), np.asarray(states_p))
    np.testing.assert_array_equal(np.asarray(words_ref), np.asarray(words_p))
    np.testing.assert_array_equal(np.asarray(flags_ref), np.asarray(flags_p))
