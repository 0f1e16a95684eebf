"""Deterministic integer PMF -> quantized-CDF conversion.

Behavioral spec: /root/reference/src/compress/cpp_exts/ops/ops.cpp:10-67
(compressai._CXX.pmf_to_quantized_cdf).  Fresh numpy implementation of the
same contract: scale pmf to 2^precision, renormalize by integer division,
prefix-sum, then repair zero-width symbols by stealing one count at a time
from the currently-smallest symbol of width > 1.  Invariants: cdf[0] == 0,
cdf[-1] == 2^precision, strictly increasing.

Runs once per model update() on the host — determinism matters, speed does
not (but the batched variant vectorizes the common no-zero-entries case).
"""

from __future__ import annotations

import numpy as np


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = 16) -> np.ndarray:
    """Quantize one pmf (float vector, including tail mass as the last
    entry) to an integer CDF of length len(pmf)+1."""
    pmf = np.asarray(pmf, dtype=np.float64)
    one = 1 << precision
    freq = np.zeros(len(pmf) + 1, dtype=np.uint64)
    # float32 rounding to match the C++ `std::round(p * (1<<precision))` on
    # float inputs; negative/NaN guard like the implicit uint conversion.
    scaled = np.round(pmf.astype(np.float32).astype(np.float64) * one)
    scaled = np.where(np.isfinite(scaled), np.maximum(scaled, 0.0), 0.0)
    freq[1:] = scaled.astype(np.uint64)
    total = int(freq.sum())
    if total == 0:
        raise ValueError("pmf sums to zero after quantization")
    freq = (int(one) * freq) // total  # element-wise integer renormalize
    cdf = np.cumsum(freq, dtype=np.uint64)
    cdf[-1] = one

    cdf = cdf.astype(np.int64)
    n = len(cdf)
    for i in range(n - 1):
        if cdf[i] == cdf[i + 1]:
            widths = cdf[1:] - cdf[:-1]
            candidates = np.where(widths > 1)[0]
            if len(candidates) == 0:
                raise ValueError("cannot repair zero-width cdf entry")
            best_steal = candidates[np.argmin(widths[candidates])]
            if best_steal < i:
                cdf[best_steal + 1 : i + 1] -= 1
            else:
                cdf[i + 1 : best_steal + 1] += 1

    assert cdf[0] == 0 and cdf[-1] == one
    assert np.all(cdf[1:] > cdf[:-1])
    return cdf.astype(np.int32)


def batched_pmf_to_cdf(
    pmf: np.ndarray,
    tail_mass: np.ndarray,
    pmf_length: np.ndarray,
    max_length: int,
    precision: int = 16,
) -> np.ndarray:
    """Rows of pmf (R, max_length) + per-row tail mass -> padded CDF table
    (R, max_length + 2).  Mirrors EntropyModel._pmf_to_cdf
    (/root/reference/src/compress/entropy_models/entropy_models.py:172-180).
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    tail_mass = np.asarray(tail_mass, dtype=np.float64).reshape(-1)
    pmf_length = np.asarray(pmf_length, dtype=np.int64).reshape(-1)
    rows = pmf.shape[0]
    out = np.zeros((rows, max_length + 2), dtype=np.int32)
    for r in range(rows):
        n = int(pmf_length[r])
        prob = np.concatenate([pmf[r, :n], [tail_mass[r]]])
        cdf = pmf_to_quantized_cdf(prob, precision)
        out[r, : len(cdf)] = cdf
    return out
