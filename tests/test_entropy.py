"""Entropy-model tests: CDF quantizer invariants, bottleneck density,
Gaussian likelihood vs scipy, index building."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from progressivecodec_tpu.entropy import (
    pmf_to_quantized_cdf,
    EntropyBottleneck,
    build_gaussian_tables,
    gaussian_likelihood,
    build_indexes,
)
from progressivecodec_tpu.entropy.bottleneck import build_bottleneck_tables
from progressivecodec_tpu.config import ScaleTableConfig


def _check_cdf_invariants(cdf, length):
    cdf = cdf[:length]
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) > 0)


def test_pmf_to_quantized_cdf_invariants(rng):
    for _ in range(20):
        n = rng.integers(2, 50)
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum() * (1 + rng.random() * 0.5)  # leave tail mass
        cdf = pmf_to_quantized_cdf(pmf)
        _check_cdf_invariants(cdf, len(cdf))


def test_pmf_to_quantized_cdf_zero_entries():
    pmf = np.array([0.5, 0.0, 0.0, 0.49, 0.0], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf)
    _check_cdf_invariants(cdf, len(cdf))


def test_gaussian_tables():
    table = ScaleTableConfig().values()
    t = build_gaussian_tables(table)
    assert t["cdf"].shape[0] == 64
    for r in range(64):
        _check_cdf_invariants(t["cdf"][r], t["cdf_length"][r])
    # offsets symmetric around 0
    np.testing.assert_array_equal(t["offset"], -((t["cdf_length"] - 3) // 2))


def test_gaussian_likelihood_vs_scipy(rng):
    v = rng.standard_normal((4, 4)).astype(np.float32) * 2
    mu = rng.standard_normal((4, 4)).astype(np.float32)
    sig = (0.2 + rng.random((4, 4))).astype(np.float32)
    got = gaussian_likelihood(jnp.asarray(v), jnp.asarray(sig), jnp.asarray(mu))
    ref = scipy.stats.norm.cdf(np.abs(v - mu) * -1 + 0.5, scale=sig) - scipy.stats.norm.cdf(
        -np.abs(v - mu) - 0.5, scale=sig
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_gaussian_likelihood_scale_bound(rng):
    # scales below 0.11 are clamped
    v = jnp.zeros((3,))
    got_small = gaussian_likelihood(v, jnp.full((3,), 1e-4))
    got_bound = gaussian_likelihood(v, jnp.full((3,), 0.11))
    np.testing.assert_allclose(got_small, got_bound)


def test_build_indexes_matches_reference_loop(rng):
    table = ScaleTableConfig().values().astype(np.float32)
    scales = np.abs(rng.standard_normal((2, 3, 3, 4)).astype(np.float32)) * 3
    got = np.asarray(build_indexes(jnp.asarray(scales), table))
    # reference loop (entropy_models.py:661-666)
    clamped = np.maximum(scales, 0.11)
    ref = np.full(scales.shape, len(table) - 1, dtype=np.int32)
    for s in table[:-1]:
        ref -= (clamped <= s).astype(np.int32)
    np.testing.assert_array_equal(got, ref)
    assert got.min() >= 0 and got.max() < len(table)


def test_bottleneck_forward_and_tables(rng):
    c = 8
    eb = EntropyBottleneck(channels=c)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, c)).astype(np.float32) * 3)
    variables = eb.init(jax.random.PRNGKey(0), x, training=False)
    out, lik = eb.apply(variables, x, training=False)
    assert out.shape == x.shape and lik.shape == x.shape
    assert (np.asarray(lik) > 0).all() and (np.asarray(lik) <= 1).all()
    # eval mode rounds around medians
    med = eb.apply(variables, method=lambda m: m.medians())
    expect = np.round(np.asarray(x) - np.asarray(med)) + np.asarray(med)
    np.testing.assert_allclose(out, expect, atol=1e-5)

    # training mode adds bounded noise
    out_tr, _ = eb.apply(variables, x, training=True, rng=jax.random.PRNGKey(1))
    assert np.abs(np.asarray(out_tr - x)).max() <= 0.5

    # aux loss is finite scalar
    aux = eb.apply(variables, method=lambda m: m.aux_loss())
    assert np.isfinite(float(aux))

    # table building
    tables = build_bottleneck_tables(variables["params"])
    assert tables["cdf"].shape[0] == c
    for r in range(c):
        _check_cdf_invariants(tables["cdf"][r], tables["cdf_length"][r])


def test_bottleneck_pmf_integrates_to_near_one(rng):
    """Sum of modeled pmf over the support should be close to 1."""
    c = 4
    eb = EntropyBottleneck(channels=c)
    x = jnp.zeros((1, 2, 2, c))
    variables = eb.init(jax.random.PRNGKey(0), x, training=False)
    tables = build_bottleneck_tables(variables["params"])
    # quantized cdf: last bin is tail mass; total == 2^16 by construction
    for r in range(c):
        ln = tables["cdf_length"][r]
        assert tables["cdf"][r, ln - 1] == 1 << 16
