"""FULL-MODEL numerical parity vs an independent torch oracle.

Extends the block-level oracles in test_torch_parity.py to the COMPOSED
`forward_single_quality` (VERDICT round-2 missing #1): hyper transforms,
ConvStack5 parameter banks, the ChARM base-slice recursion + LRP,
delta_encode, the point-based-std mask, and both synthesis dispatches —
x_hat, y/z likelihoods, mu/std, and the binary mask compared end to end
at q in {0, 0.5, 5, 10} for the dual-decoder and single-decoder configs.

The oracle reimplements the REFERENCE math in torch f64, NCHW, unrolled
per-slice (CHProg_cnn.py:1002-1198 composition; cnn.py:57-130 hyper /
ChARM stacks; entropy_models.py:400-419 bottleneck MLP, 626-659 Gaussian
likelihood; masking.py:205-223 quantile mask), consuming OUR parameters.
It deliberately mirrors the reference's *unrolled* slice structure, so a
pass also independently validates our vectorized stacked-prog bank
against reference semantics.

Acceptance (VERDICT): max|dx_hat| <= 2e-4, masks exactly equal,
likelihood rtol <= 1e-3.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN

from test_torch_parity import (
    _t,
    _n,
    torch_analysis,
    torch_conv,
    torch_gdn,
    torch_win_noshift,
)

torch.set_default_dtype(torch.float64)


# --------------------------------------------------------------------------
# oracle pieces beyond test_torch_parity's
# --------------------------------------------------------------------------


def torch_subpel(x, node, r=2):
    y = torch_conv(x, node["conv"], 1)
    return F.pixel_shuffle(y, r)


def torch_hyper_analysis(y, p):
    """h_a (cnn.py:57-67): conv3x3 stack, strides 1,1,2,1,2, GELU between."""
    z = torch_conv(y, p["conv0"], 1)
    z = F.gelu(z)
    z = torch_conv(z, p["conv1"], 1)
    z = F.gelu(z)
    z = torch_conv(z, p["conv2"], 2)
    z = F.gelu(z)
    z = torch_conv(z, p["conv3"], 1)
    z = F.gelu(z)
    return torch_conv(z, p["conv4"], 2)


def torch_hyper_synthesis(z, p):
    """h_mean_s / h_scale_s (cnn.py:69-91): conv + subpel upsampling."""
    y = torch_conv(z, p["conv0"], 1)
    y = F.gelu(y)
    y = torch_subpel(y, p["up0"])
    y = F.gelu(y)
    y = torch_conv(y, p["conv1"], 1)
    y = F.gelu(y)
    y = torch_subpel(y, p["up1"])
    y = F.gelu(y)
    return torch_conv(y, p["conv2"], 1)


def torch_convstack5(x, p):
    """cc/lrp ConvStack5 (cnn.py:92-130): 5x conv3x3 with GELU between."""
    y = x
    for i in range(4):
        y = F.gelu(torch_conv(y, p[f"conv{i}"], 1))
    return torch_conv(y, p["conv4"], 1)


def torch_synthesis_transform(y, p):
    x = torch_win_noshift(y, p["attn0"], 8, 4, 2)
    x = _deconv(x, p["deconv0"], 2)
    x = torch_gdn(x, p["igdn0"]["beta"], p["igdn0"]["gamma"], True)
    x = _deconv(x, p["deconv1"], 2)
    x = torch_gdn(x, p["igdn1"]["beta"], p["igdn1"]["gamma"], True)
    x = torch_win_noshift(x, p["attn1"], 8, 8, 4)
    x = _deconv(x, p["deconv2"], 2)
    x = torch_gdn(x, p["igdn2"]["beta"], p["igdn2"]["gamma"], True)
    return _deconv(x, p["deconv3"], 2)


def _deconv(x, node, stride):
    w = torch.from_numpy(np.asarray(node["kernel"], np.float64)).permute(2, 3, 0, 1)
    b = torch.from_numpy(np.asarray(node["bias"], np.float64))
    k = w.shape[-1]
    return F.conv_transpose2d(
        x, w, b, stride=stride, padding=k // 2, output_padding=stride - 1
    )


def torch_bottleneck_eval(z, p):
    """Eval-time EntropyBottleneck: round around medians + MLP likelihood
    (entropy_models.py:400-419, 446-489)."""
    quantiles = torch.from_numpy(np.asarray(p["quantiles"], np.float64))
    med = quantiles[:, 0, 1]  # (C,)
    b, c, h, w = z.shape
    values = z.permute(1, 0, 2, 3).reshape(c, 1, -1)
    outputs = torch.round(values - med[:, None, None]) + med[:, None, None]

    def logits_cumulative(v):
        logits = v
        for i in range(5):
            m = torch.from_numpy(np.asarray(p[f"matrix{i}"], np.float64))
            logits = torch.einsum("cij,cjn->cin", F.softplus(m), logits)
            logits = logits + torch.from_numpy(np.asarray(p[f"bias{i}"], np.float64))
            if i < 4:
                f = torch.from_numpy(np.asarray(p[f"factor{i}"], np.float64))
                logits = logits + torch.tanh(f) * torch.tanh(logits)
        return logits

    lower = logits_cumulative(outputs - 0.5)
    upper = logits_cumulative(outputs + 0.5)
    sign = -torch.sign(lower + upper)
    lik = torch.abs(torch.sigmoid(sign * upper) - torch.sigmoid(sign * lower))
    lik = torch.clamp(lik, min=1e-9)
    z_hat = outputs.reshape(c, b, h, w).permute(1, 0, 2, 3)
    lik = lik.reshape(c, b, h, w).permute(1, 0, 2, 3)
    return z_hat, lik


def torch_gaussian_likelihood(v, scales, means=None):
    """erfc likelihood with the 0.11 scale / 1e-9 likelihood lower bounds
    (entropy_models.py:626-643)."""
    values = v if means is None else v - means
    scales = torch.clamp(scales, min=0.11)
    values = torch.abs(values)
    upper = 0.5 * torch.special.erfc(-(2**-0.5) * ((0.5 - values) / scales))
    lower = 0.5 * torch.special.erfc(-(2**-0.5) * ((-0.5 - values) / scales))
    return torch.clamp(upper - lower, min=1e-9)


def torch_quantile_mask(scale, keep_frac):
    """point-based-std per-image quantile mask (masking.py:205-223) — the
    ranking in f32 to mirror the jit graph's dtype exactly."""
    b = scale.shape[0]
    flat = scale.reshape(b, -1).to(torch.float32)
    q = torch.quantile(flat, 1.0 - keep_frac, dim=1, interpolation="linear")
    return (flat >= q[:, None]).reshape(scale.shape).to(torch.float64)


def _prog_param(params, name, i, stacked):
    """Slice i's ConvStack5 params from either layout: per-slice bank
    (SliceTransforms, {'s{i}': {...}}) or vmapped stacked bank (leading
    slice axis on every leaf)."""
    p = params[name]
    if not stacked:
        return p[f"s{i}"]
    return jax.tree.map(lambda leaf: np.asarray(leaf)[i], p)


def oracle_forward_single_quality(params, cfg: ModelConfig, x_nhwc, quality: float):
    """Composed reference-math forward at one quality, torch f64."""
    p = params
    x = _t(x_nhwc)
    d0 = cfg.division_channel
    dc = cfg.dim_chunk
    stacked = cfg.stack_prog and cfg.support_progressive_slices == 0

    if cfg.multiple_encoder:
        y = torch.cat([torch_analysis(x, p["g_a0"]), torch_analysis(x, p["g_a1"])], dim=1)
    else:
        y = torch_analysis(x, p["g_a"])
    z = torch_hyper_analysis(y, p["h_a"])
    z_hat, z_lik = torch_bottleneck_eval(z, p["entropy_bottleneck"])
    lm = torch_hyper_synthesis(z_hat, p["h_mean_s"])
    ls = torch_hyper_synthesis(z_hat, p["h_scale_s"])

    y_slices = list(torch.split(y, dc, dim=1))

    y_hat_base, mu_base, std_base, lik_base = [], [], [], []
    for i in range(cfg.ns0):
        support = y_hat_base[: min(i, cfg.max_support_slices)]
        mean_support = torch.cat([lm[:, :d0]] + support, dim=1)
        scale_support = torch.cat([ls[:, :d0]] + support, dim=1)
        mu = torch_convstack5(mean_support, p["cc_mean"][f"s{i}"])
        scale = torch_convstack5(scale_support, p["cc_scale"][f"s{i}"])
        mu_base.append(mu)
        std_base.append(scale)
        y_hat = torch.round(y_slices[i] - mu) + mu
        lik_base.append(torch_gaussian_likelihood(y_hat, scale, mu))
        lrp_in = torch.cat([mean_support, y_hat], dim=1)
        y_hat = y_hat + 0.5 * torch.tanh(torch_convstack5(lrp_in, p["lrp"][f"s{i}"]))
        y_hat_base.append(y_hat)

    gs0 = p["g_s0"] if cfg.multiple_decoder else p["g_s"]
    gs1 = p["g_s1"] if cfg.multiple_decoder else p["g_s"]
    if quality == 0:
        x_hat = torch.clamp(
            torch_synthesis_transform(torch.cat(y_hat_base, dim=1), gs0), 0.0, 1.0
        )
        return {
            "x_hat": _n(x_hat),
            "lik_y": _n(torch.cat(lik_base, dim=1)),
            "lik_z": _n(z_lik),
            "mu": _n(torch.cat(mu_base, dim=1)),
            "std": _n(torch.cat(std_base, dim=1)),
        }

    prog, mus, stds, liks, masks = [], [], [], [], []
    for i in range(cfg.num_prog_slices):
        y_slice = y_slices[cfg.ns0 + i]
        if cfg.delta_encode:
            y_slice = y_slice - y_slices[i]
        mean_support = torch.cat([lm[:, d0:], y_hat_base[i]], dim=1)
        scale_support = torch.cat([ls[:, d0:], y_hat_base[i]], dim=1)
        mu = torch_convstack5(mean_support, _prog_param(p, "cc_mean_prog", i, stacked))
        scale = torch_convstack5(scale_support, _prog_param(p, "cc_scale_prog", i, stacked))
        mus.append(mu)
        stds.append(scale)
        if quality >= 10:
            mask = torch.ones_like(scale)
        elif quality <= 0:
            mask = torch.zeros_like(scale)
        else:
            mask = torch_quantile_mask(scale, quality * 0.1)
        masks.append(mask)
        y_m = (y_slice - mu) * mask
        liks.append(torch_gaussian_likelihood(torch.round(y_m), scale * mask))
        y_hat = torch.round(y_slice - mu) * mask + mu
        lrp_in = torch.cat([mean_support, y_hat], dim=1)
        y_hat = y_hat + 0.5 * torch.tanh(
            torch_convstack5(lrp_in, _prog_param(p, "lrp_prog", i, stacked))
        )
        y_hat = y_hat + y_hat_base[i]  # joiner 'res'
        prog.append(y_hat)

    x_hat = torch.clamp(torch_synthesis_transform(torch.cat(prog, dim=1), gs1), 0.0, 1.0)
    return {
        "x_hat": _n(x_hat),
        "lik_y": _n(torch.cat(lik_base + liks, dim=1)),
        "lik_z": _n(z_lik),
        "mu": _n(torch.cat(mus, dim=1)),
        "std": _n(torch.cat(stds, dim=1)),
        "mask": _n(torch.cat(masks, dim=1)),
    }


# --------------------------------------------------------------------------
# the tests
# --------------------------------------------------------------------------

TINY = dict(N=16, M=128, division_dimension=(64, 128), dim_chunk=32)


def _init(cfg, rng):
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(7)}, x, training=False, quality=[0, 10]
    )
    # perturb the bottleneck quantiles so medians are nonzero
    params = variables["params"]
    q = params["entropy_bottleneck"]["quantiles"]
    params["entropy_bottleneck"]["quantiles"] = q + jnp.asarray(
        rng.standard_normal(q.shape).astype(np.float32) * 0.3
    )
    return model, {"params": params}, x


@pytest.mark.parametrize("quality", [0.0, 0.5, 5.0, 10.0])
def test_fsq_dual_decoder_delta_matches_oracle(rng, quality):
    """Flagship shape: dual enc/dec, delta_encode, stacked prog bank."""
    cfg = ModelConfig(delta_encode=True, **TINY)
    model, variables, x = _init(cfg, rng)
    out = model.apply(
        variables, x, quality, method=ChannelProgressiveWACNN.forward_single_quality,
        training=False,
    )
    ref = oracle_forward_single_quality(variables["params"], cfg, x, quality)

    np.testing.assert_allclose(np.asarray(out["x_hat"]), ref["x_hat"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["mu"]), ref["mu"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["std"]), ref["std"], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["likelihoods"]["z"]), ref["lik_z"], rtol=1e-3, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out["likelihoods"]["y"]), ref["lik_y"], rtol=1e-3, atol=1e-8
    )
    if quality > 0:
        np.testing.assert_array_equal(np.asarray(out["mask"]), ref["mask"])


@pytest.mark.parametrize("quality", [0.0, 0.5, 5.0, 10.0])
def test_fsq_single_decoder_unrolled_matches_oracle(rng, quality):
    """Single shared g_s (the reference CLI default, parser.py:53) with the
    unrolled per-slice prog path (stack_prog=False)."""
    cfg = ModelConfig(multiple_decoder=False, stack_prog=False, **TINY)
    model, variables, x = _init(cfg, rng)
    out = model.apply(
        variables, x, quality, method=ChannelProgressiveWACNN.forward_single_quality,
        training=False,
    )
    ref = oracle_forward_single_quality(variables["params"], cfg, x, quality)

    np.testing.assert_allclose(np.asarray(out["x_hat"]), ref["x_hat"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["mu"]), ref["mu"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["std"]), ref["std"], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["likelihoods"]["y"]), ref["lik_y"], rtol=1e-3, atol=1e-8
    )
    if quality > 0:
        np.testing.assert_array_equal(np.asarray(out["mask"]), ref["mask"])
