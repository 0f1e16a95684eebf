"""Metrics: PSNR exactness, MS-SSIM sanity + oracle comparison where
pytorch_msssim-free references exist."""

import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.utils.metrics import psnr, ms_ssim, ms_ssim_db


def test_psnr_known_value(rng):
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_ms_ssim_identity(rng):
    x = jnp.asarray(rng.random((1, 192, 192, 3)).astype(np.float32))
    v = float(ms_ssim(x, x))
    assert v > 0.9999


def test_ms_ssim_orders_degradations(rng):
    x = jnp.asarray(rng.random((1, 192, 192, 3)).astype(np.float32))
    small = jnp.clip(x + 0.01 * jnp.asarray(rng.standard_normal(x.shape)), 0, 1)
    big = jnp.clip(x + 0.2 * jnp.asarray(rng.standard_normal(x.shape)), 0, 1)
    v_small = float(ms_ssim(x, small))
    v_big = float(ms_ssim(x, big))
    assert 1 > v_small > v_big > 0


def test_ms_ssim_db_form(rng):
    x = jnp.asarray(rng.random((1, 192, 192, 3)).astype(np.float32))
    y = jnp.clip(x + 0.05 * jnp.asarray(rng.standard_normal(x.shape)), 0, 1)
    v = float(ms_ssim(x, y))
    db = float(ms_ssim_db(x, y))
    np.testing.assert_allclose(db, -10 * np.log10(1 - v), rtol=1e-5)


def test_bd_rate_sanity():
    from progressivecodec_tpu.utils.rd import bd_rate

    bpp = np.array([0.2, 0.4, 0.6, 0.8])
    psnr = np.array([30.0, 32.0, 34.0, 36.0])
    # identical curves -> 0%
    np.testing.assert_allclose(bd_rate(bpp, psnr, bpp, psnr), 0.0, atol=1e-9)
    # curve needing half the rate at equal quality -> -50%
    np.testing.assert_allclose(bd_rate(bpp, psnr, bpp / 2, psnr), -50.0, atol=1e-6)
    # curve needing double the rate -> +100%
    np.testing.assert_allclose(bd_rate(bpp, psnr, bpp * 2, psnr), 100.0, atol=1e-5)


def test_reference_anchor_tables():
    """Anchor data parity (result_list.py:1-127, 168-214): lengths, ranges,
    and the decode-time table the bench baseline quotes."""
    from progressivecodec_tpu.utils import rd

    assert len(rd.PROGRESSIVE_ANCHOR_BPP) == len(rd.PROGRESSIVE_ANCHOR_PSNR) == 62
    assert (
        len(rd.TRI_PLANET_23_BPP)
        == len(rd.TRI_PLANET_23_PSNR)
        == len(rd.TRI_PLANET_23_DECODE_TIME_S)
        == 21
    )
    assert len(rd.TRI_PLANET_22_BPP) == len(rd.TRI_PLANET_22_PSNR) == 27
    # tri_planet_22 stored ascending in bpp (the reference reverses its list)
    assert list(rd.TRI_PLANET_22_BPP) == sorted(rd.TRI_PLANET_22_BPP)
    assert rd.DECODE_TIME_ANCHOR_RANGE_S == (2.3025, 9.1804)
    assert len(rd.QUALITY_GRID) == 61
