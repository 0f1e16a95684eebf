"""Golden activation parity vs an independent torch oracle (VERDICT
missing #6; SURVEY §7.1).

The oracle reimplements the reference layer MATH in torch (NCHW, explicit
per-window loops for attention — deliberately different code shape from
our vectorized NHWC einsum implementation) and consumes OUR parameters via
kernel transposition.  Specs: GDN /root/reference/src/compress/layers/
gdn.py:14-64, window attention win_attention.py:76-207, Win_noShift_
Attention layers/layers.py:31-75, g_a/g_s stacks models/cnn.py:34-55.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from progressivecodec_tpu.layers.blocks import (
    GDN,
    GDN1,
    WinBasedAttention,
    WinNoShiftAttention,
)
from progressivecodec_tpu.models.transforms import AnalysisTransform, SynthesisTransform
from progressivecodec_tpu.ops.math import PEDESTAL

torch.set_default_dtype(torch.float64)  # oracle in f64: isolates our f32 error


def _t(x):  # NHWC numpy/jax -> NCHW torch
    return torch.from_numpy(np.asarray(x, np.float64)).permute(0, 3, 1, 2)


def _n(x):  # NCHW torch -> NHWC numpy
    return x.permute(0, 2, 3, 1).numpy()


def _reparam(p, minimum=0.0):
    bound = (minimum + PEDESTAL) ** 0.5
    v = torch.clamp(torch.from_numpy(np.asarray(p, np.float64)), min=bound)
    return v * v - PEDESTAL


def torch_gdn(x, beta_p, gamma_p, inverse, simplified=False):
    """Reference GDN math (gdn.py:40-64): 1x1 conv of x^2 (|x| for GDN1)."""
    beta = _reparam(beta_p, 1e-6)
    gamma = _reparam(gamma_p)
    c = beta.shape[0]
    w = gamma.reshape(c, c, 1, 1)
    if simplified:
        norm = F.conv2d(torch.abs(x), w, beta)
        return x * norm if inverse else x / norm
    norm = F.conv2d(x * x, w, beta)
    return x * torch.sqrt(norm) if inverse else x * torch.rsqrt(norm)


def torch_conv(x, node, stride):
    w = torch.from_numpy(np.asarray(node["kernel"], np.float64)).permute(3, 2, 0, 1)
    b = torch.from_numpy(np.asarray(node["bias"], np.float64))
    return F.conv2d(x, w, b, stride=stride, padding=w.shape[-1] // 2)


def torch_deconv(x, node, stride):
    # HWIO -> IOHW; reference deconv: padding k//2, output_padding s-1
    w = torch.from_numpy(np.asarray(node["kernel"], np.float64)).permute(2, 3, 0, 1)
    b = torch.from_numpy(np.asarray(node["bias"], np.float64))
    k = w.shape[-1]
    return F.conv_transpose2d(
        x, w, b, stride=stride, padding=k // 2, output_padding=stride - 1
    )


def torch_win_attention(x, p, heads, ws, ss):
    """Window MSA oracle with explicit window loops (win_attention.py:76-207)."""
    b, c, h, w = x.shape
    shortcut = x
    if ss > 0:
        x = torch.roll(x, shifts=(-ss, -ss), dims=(2, 3))

    qkv_w = torch.from_numpy(np.asarray(p["qkv_kernel"], np.float64))  # (c, 3c)
    qkv_b = torch.from_numpy(np.asarray(p["qkv_bias"], np.float64))
    proj_w = torch.from_numpy(np.asarray(p["proj_kernel"], np.float64))
    proj_b = torch.from_numpy(np.asarray(p["proj_bias"], np.float64))
    table = torch.from_numpy(np.asarray(p["rel_pos_bias"], np.float64))  # (T, heads)

    hd = c // heads
    n = ws * ws
    # relative position bias matrix, built coordinate-pair by pair
    bias = torch.zeros(heads, n, n)
    for i in range(n):
        for j in range(n):
            dy = (i // ws) - (j // ws) + ws - 1
            dx = (i % ws) - (j % ws) + ws - 1
            bias[:, i, j] = table[dy * (2 * ws - 1) + dx]

    # shift mask: windows spanning the wrap boundary mask cross-segment pairs
    if ss > 0:
        seg = torch.zeros(h, w)
        cnt = 0
        for hs in (slice(0, h - ws), slice(h - ws, h - ss), slice(h - ss, None)):
            for wcs in (slice(0, w - ws), slice(w - ws, w - ss), slice(w - ss, None)):
                seg[hs, wcs] = cnt
                cnt += 1

    out = torch.zeros_like(x)
    for bi in range(b):
        for wy in range(h // ws):
            for wx in range(w // ws):
                win = x[bi, :, wy * ws : (wy + 1) * ws, wx * ws : (wx + 1) * ws]
                tokens = win.reshape(c, n).T  # (n, c)
                qkv = tokens @ qkv_w + qkv_b
                q, k, v = qkv[:, :c], qkv[:, c : 2 * c], qkv[:, 2 * c :]
                acc = torch.zeros(n, c)
                for hh in range(heads):
                    qh = q[:, hh * hd : (hh + 1) * hd] * (hd**-0.5)
                    kh = k[:, hh * hd : (hh + 1) * hd]
                    vh = v[:, hh * hd : (hh + 1) * hd]
                    att = qh @ kh.T + bias[hh]
                    if ss > 0:
                        sw = seg[wy * ws : (wy + 1) * ws, wx * ws : (wx + 1) * ws].reshape(-1)
                        att = att + torch.where(
                            sw[None, :] != sw[:, None], torch.tensor(-1e9), torch.tensor(0.0)
                        )
                    att = torch.softmax(att, dim=-1)
                    acc[:, hh * hd : (hh + 1) * hd] = att @ vh
                o = acc @ proj_w + proj_b
                out[bi, :, wy * ws : (wy + 1) * ws, wx * ws : (wx + 1) * ws] = o.T.reshape(
                    c, ws, ws
                )
    if ss > 0:
        out = torch.roll(out, shifts=(ss, ss), dims=(2, 3))
    return shortcut + out


def torch_residual_unit(x, p):
    y = torch_conv(x, p["conv1"], 1)
    y = F.gelu(y)
    y = torch_conv(y, p["conv2"], 1)
    y = F.gelu(y)
    y = torch_conv(y, p["conv3"], 1)
    return F.gelu(x + y)


def torch_win_noshift(x, p, heads, ws, ss):
    a = x
    for i in range(3):
        a = torch_residual_unit(a, p[f"a_res{i}"])
    bb = torch_win_attention(x, p["attn"], heads, ws, ss)
    for i in range(3):
        bb = torch_residual_unit(bb, p[f"b_res{i}"])
    bb = torch_conv(bb, p["b_proj"], 1)
    return x + a * torch.sigmoid(bb)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_matches_torch_oracle(rng, inverse):
    c = 24
    mod = GDN(inverse=inverse)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    # perturb params away from init to exercise the reparam
    params = jax.tree.map(
        lambda p: p + 0.05 * jnp.asarray(rng.standard_normal(p.shape), jnp.float32), params
    )
    ours = np.asarray(mod.apply({"params": params}, x))
    ref = _n(torch_gdn(_t(x), params["beta"], params["gamma"], inverse))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("inverse", [False, True])
def test_gdn1_matches_torch_oracle(rng, inverse):
    c = 16
    mod = GDN1(inverse=inverse)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, c)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ours = np.asarray(mod.apply({"params": params}, x))
    ref = _n(
        torch_gdn(_t(x), params["beta"], params["gamma"], inverse, simplified=True)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("ws,ss", [(4, 0), (4, 2), (8, 4)])
def test_window_attention_matches_torch_oracle(rng, ws, ss):
    c, heads = 16, 4
    h = w = 2 * ws
    mod = WinBasedAttention(num_heads=heads, window_size=ws, shift_size=ss)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ours = np.asarray(mod.apply({"params": params}, x))
    ref = _n(torch_win_attention(_t(x), params, heads, ws, ss))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_win_noshift_attention_matches_torch_oracle(rng):
    c, heads, ws, ss = 16, 4, 4, 2
    mod = WinNoShiftAttention(num_heads=heads, window_size=ws, shift_size=ss)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, c)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ours = np.asarray(mod.apply({"params": params}, x))
    ref = _n(torch_win_noshift(_t(x), params, heads, ws, ss))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def torch_analysis(x, p):
    y = torch_conv(x, p["conv0"], 2)
    y = torch_gdn(y, p["gdn0"]["beta"], p["gdn0"]["gamma"], False)
    y = torch_conv(y, p["conv1"], 2)
    y = torch_gdn(y, p["gdn1"]["beta"], p["gdn1"]["gamma"], False)
    y = torch_win_noshift(y, p["attn0"], 8, 8, 4)
    y = torch_conv(y, p["conv2"], 2)
    y = torch_gdn(y, p["gdn2"]["beta"], p["gdn2"]["gamma"], False)
    y = torch_conv(y, p["conv3"], 2)
    y = torch_win_noshift(y, p["attn1"], 8, 4, 2)
    return y


def torch_synthesis(y, p):
    x = torch_win_noshift(y, p["attn0"], 8, 4, 2)
    x = torch_deconv(x, p["deconv0"], 2)
    x = torch_gdn(x, p["igdn0"]["beta"], p["igdn0"]["gamma"], True)
    x = torch_deconv(x, p["deconv1"], 2)
    x = torch_gdn(x, p["igdn1"]["beta"], p["igdn1"]["gamma"], True)
    x = torch_win_noshift(x, p["attn1"], 8, 8, 4)
    x = torch_deconv(x, p["deconv2"], 2)
    x = torch_gdn(x, p["igdn2"]["beta"], p["igdn2"]["gamma"], True)
    x = torch_deconv(x, p["deconv3"], 2)
    return x


def test_full_g_a_stack_matches_torch_oracle(rng):
    """End-to-end analysis transform parity (cnn.py:34-44 composition)."""
    mod = AnalysisTransform(N=16, M=24)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    ours = np.asarray(mod.apply({"params": params}, x))
    ref = _n(torch_analysis(_t(x), params))
    assert ours.shape == ref.shape == (1, 4, 4, 24)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_full_g_s_stack_matches_torch_oracle(rng):
    """End-to-end synthesis transform parity (cnn.py:45-55 composition)."""
    mod = SynthesisTransform(N=16, M=24)
    y = jnp.asarray(rng.standard_normal((1, 4, 4, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(2), y)["params"]
    ours = np.asarray(mod.apply({"params": params}, y))
    ref = _n(torch_synthesis(_t(y), params))
    assert ours.shape == ref.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-5)
