"""Tests for GDN, window attention, masking — formula- and oracle-based."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.layers import (
    GDN,
    WinBasedAttention,
    WinNoShiftAttention,
    ConvStack5,
    channel_mask,
    apply_mask_noise,
    UNet,
)
from progressivecodec_tpu.ops.math import nonneg_reparam


def test_gdn_formula(rng):
    c = 8
    x = jnp.asarray(rng.standard_normal((2, 4, 4, c)).astype(np.float32))
    mod = GDN()
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    beta = nonneg_reparam(params["params"]["beta"], 1e-6)
    gamma = nonneg_reparam(params["params"]["gamma"])
    norm = np.einsum("bhwj,oj->bhwo", np.asarray(x) ** 2, np.asarray(gamma)) + np.asarray(beta)
    np.testing.assert_allclose(y, np.asarray(x) / np.sqrt(norm), rtol=2e-5)

    inv = GDN(inverse=True)
    pi = inv.init(jax.random.PRNGKey(0), x)
    yi = inv.apply(pi, x)
    np.testing.assert_allclose(yi, np.asarray(x) * np.sqrt(norm), rtol=2e-5)


def test_gdn_init_is_identity_like(rng):
    # fresh GDN: gamma = 0.1*I, beta = 1 -> y = x / sqrt(1 + 0.1 x^2)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 4)).astype(np.float32))
    mod = GDN()
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    expect = np.asarray(x) / np.sqrt(1.0 + 0.1 * np.asarray(x) ** 2)
    np.testing.assert_allclose(y, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shift", [0, 4])
def test_window_attention_runs_and_keeps_shape(rng, shift):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    mod = WinBasedAttention(num_heads=4, window_size=8, shift_size=shift)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_window_attention_locality():
    """Windows are strictly local: with no shift, perturbing one window
    never changes another window's output (the tiling-halo invariant)."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 16, 16, 16))
    mod = WinBasedAttention(num_heads=4, window_size=8, shift_size=0)
    params = mod.init(jax.random.PRNGKey(0), x)
    y0 = mod.apply(params, x)
    x2 = x.at[0, 0, 0, :].add(10.0)  # perturb window (0,0)
    y1 = mod.apply(params, x2)
    # other windows unchanged
    np.testing.assert_allclose(y0[0, 8:, 8:], y1[0, 8:, 8:], atol=1e-6)
    # own window changed
    assert np.abs(np.asarray(y1[0, :8, :8] - y0[0, :8, :8])).max() > 1e-3


def test_win_no_shift_attention_block(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)).astype(np.float32))
    mod = WinNoShiftAttention(num_heads=8, window_size=4, shift_size=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape


def test_conv_stack5_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 352)).astype(np.float32))
    mod = ConvStack5(out=32)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == (1, 8, 8, 32)


def test_unet_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    mod = UNet(out_ch=16)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == (1, 32, 32, 16)


# ---------------- masking ----------------


def test_point_based_std_keeps_top_fraction(rng):
    scale = jnp.asarray(rng.standard_normal((3, 8, 8, 32)).astype(np.float32) ** 2)
    for q in [1, 3, 5, 8]:
        m = channel_mask(scale, pr=q, mask_pol="point-based-std")
        frac = np.asarray(m).mean(axis=(1, 2, 3))
        np.testing.assert_allclose(frac, q / 10, atol=0.01)
    # top-sigma elements are the kept ones (ranking is per image)
    m = channel_mask(scale, pr=5, mask_pol="point-based-std")
    for j in range(scale.shape[0]):
        kept = np.asarray(scale[j])[np.asarray(m[j]) == 1.0]
        dropped = np.asarray(scale[j])[np.asarray(m[j]) == 0.0]
        assert kept.min() >= dropped.max()


def test_point_based_std_matches_torch_quantile(rng):
    import torch

    scale = rng.standard_normal((2, 4, 4, 8)).astype(np.float32) ** 2
    q = 3
    m = channel_mask(jnp.asarray(scale), pr=q, mask_pol="point-based-std")
    for j in range(2):
        flat = torch.tensor(scale[j].ravel())
        thresh = torch.quantile(flat, 1.0 - q * 0.1).item()
        ref = (scale[j] >= thresh).astype(np.float32)
        np.testing.assert_allclose(np.asarray(m[j]), ref)


def test_mask_monotone_in_quality(rng):
    scale = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32) ** 2)
    prev = jnp.zeros_like(scale)
    for q in [0, 1, 2, 4, 7, 10]:
        m = channel_mask(scale, pr=q, mask_pol="point-based-std")
        assert (m >= prev).all(), f"mask not monotone at q={q}"
        prev = m


def test_mask_edge_levels(rng):
    scale = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32) ** 2)
    assert channel_mask(scale, pr=0, mask_pol="point-based-std").sum() == 0
    assert channel_mask(scale, pr=10, mask_pol="point-based-std").mean() == 1.0
    assert channel_mask(scale, pr=0, mask_pol="two-levels").sum() == 0
    assert channel_mask(scale, pr=5, mask_pol="two-levels").mean() == 1.0


def test_scalable_res_policy(rng):
    scale = jnp.asarray(rng.standard_normal((1, 4, 4, 32)).astype(np.float32))
    # pr=5 -> ones_channel = 160: slice 2 spans 64..96 -> full ones
    m = channel_mask(scale, pr=5, mask_pol="scalable_res", slice_index=2)
    assert m.mean() == 1.0
    # slice 6 spans 192..224 -> all zeros
    m = channel_mask(scale, pr=5, mask_pol="scalable_res", slice_index=6)
    assert m.sum() == 0.0
    # slice 5 spans 160..192 -> partial: channels >= 160%32=0 -> all ones
    m = channel_mask(scale, pr=5.5, mask_pol="scalable_res", slice_index=5)
    # ones_channel = 176 -> rem=16 -> channels 16..31 set
    assert np.asarray(m)[..., :16].sum() == 0
    assert np.asarray(m)[..., 16:].mean() == 1.0


def test_apply_mask_noise_grad():
    m = jnp.array([0.3, 0.6])
    assert np.allclose(apply_mask_noise(m, training=False), [0.0, 1.0])
    g = jax.grad(lambda v: apply_mask_noise(v, training=True).sum())(m)
    np.testing.assert_allclose(g, [1.0, 1.0])
