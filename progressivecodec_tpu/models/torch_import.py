"""Torch checkpoint importer: reference .pth state dicts -> our pytrees.

Mapping spec from the reference module tree (CHProg_cnn.py:131-284,
cnn.py:34-134, layers/*.py) and its checkpoint-surgery helpers
(utils/state_dict_handler.py:10-26, zoo/pretrained.py:19-43).  Tensor
orientation changes:

  conv weight        OIHW         -> HWIO   (transpose 2,3,1,0)
  deconv weight      IOHW         -> HWIO   (transpose 2,3,0,1; our
                                             deconv2d flips spatially)
  linear weight      (out, in)    -> (in, out) (transpose)
  GDN beta/gamma, bottleneck matrices/biases/factors, quantiles,
  rel-pos tables     direct copy

Layout note: our convs consume NHWC activations, torch's NCHW — weights
need only the kernel transpose, no channel reordering, because channel
order within dims is preserved.  EXCEPTION: subpel convs feed a pixel
shuffle; our pixel_shuffle replicates torch's channel->(c, i, j) order so
those also map directly.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _deconv(w):  # IOHW -> HWIO
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 0, 1)))


def _lin(w):  # (out,in) -> (in,out)
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _arr(w):
    return np.ascontiguousarray(np.asarray(w))


def _attention_block(sd, p):
    """Win_noShift_Attention (layers/layers.py:31-75) -> WinNoShiftAttention."""
    out = {}
    # conv_a: 3 ResidualUnits, each nn.Sequential(conv1x1, GELU, conv3x3, GELU, conv1x1)
    for r in range(3):
        out[f"a_res{r}"] = _residual_unit(sd, f"{p}conv_a.{r}.conv.")
    # conv_b: [WinBasedAttention, RU, RU, RU, conv1x1]
    attn = {}
    ap = f"{p}conv_b.0.attn."
    attn["qkv_kernel"] = _lin(sd[ap + "qkv.weight"])
    attn["qkv_bias"] = _arr(sd[ap + "qkv.bias"])
    attn["proj_kernel"] = _lin(sd[ap + "proj.weight"])
    attn["proj_bias"] = _arr(sd[ap + "proj.bias"])
    attn["rel_pos_bias"] = _arr(sd[ap.replace("attn.", "") + "attn.relative_position_bias_table"])
    out["attn"] = attn
    for r in range(3):
        out[f"b_res{r}"] = _residual_unit(sd, f"{p}conv_b.{r + 1}.conv.")
    out["b_proj"] = {
        "kernel": _conv(sd[f"{p}conv_b.4.weight"]),
        "bias": _arr(sd[f"{p}conv_b.4.bias"]),
    }
    return out


def _residual_unit(sd, p):
    return {
        "conv1": {"kernel": _conv(sd[p + "0.weight"]), "bias": _arr(sd[p + "0.bias"])},
        "conv2": {"kernel": _conv(sd[p + "2.weight"]), "bias": _arr(sd[p + "2.bias"])},
        "conv3": {"kernel": _conv(sd[p + "4.weight"]), "bias": _arr(sd[p + "4.bias"])},
    }


def _gdn(sd, p):
    return {"beta": _arr(sd[p + "beta"]), "gamma": _arr(sd[p + "gamma"])}


def _plain_conv(sd, p):
    return {"kernel": _conv(sd[p + "weight"]), "bias": _arr(sd[p + "bias"])}


def _plain_deconv(sd, p):
    return {"kernel": _deconv(sd[p + "weight"]), "bias": _arr(sd[p + "bias"])}


def _analysis(sd, p):
    """g_a sequential: conv GDN conv GDN attn conv GDN conv attn."""
    return {
        "conv0": _plain_conv(sd, f"{p}0."),
        "gdn0": _gdn(sd, f"{p}1."),
        "conv1": _plain_conv(sd, f"{p}2."),
        "gdn1": _gdn(sd, f"{p}3."),
        "attn0": _attention_block(sd, f"{p}4."),
        "conv2": _plain_conv(sd, f"{p}5."),
        "gdn2": _gdn(sd, f"{p}6."),
        "conv3": _plain_conv(sd, f"{p}7."),
        "attn1": _attention_block(sd, f"{p}8."),
    }


def _synthesis(sd, p):
    """g_s sequential: attn deconv iGDN deconv iGDN attn deconv iGDN deconv."""
    return {
        "attn0": _attention_block(sd, f"{p}0."),
        "deconv0": _plain_deconv(sd, f"{p}1."),
        "igdn0": _gdn(sd, f"{p}2."),
        "deconv1": _plain_deconv(sd, f"{p}3."),
        "igdn1": _gdn(sd, f"{p}4."),
        "attn1": _attention_block(sd, f"{p}5."),
        "deconv2": _plain_deconv(sd, f"{p}6."),
        "igdn2": _gdn(sd, f"{p}7."),
        "deconv3": _plain_deconv(sd, f"{p}8."),
    }


def _hyper_analysis(sd, p):
    # conv GELU conv GELU conv GELU conv GELU conv (indices 0,2,4,6,8)
    return {f"conv{i}": _plain_conv(sd, f"{p}{2 * i}.") for i in range(5)}


def _hyper_synthesis(sd, p):
    # conv GELU subpel GELU conv GELU subpel GELU conv — torch indices:
    # 0 conv, 2 Sequential(conv,PixelShuffle), 4 conv, 6 subpel, 8 conv
    return {
        "conv0": _plain_conv(sd, f"{p}0."),
        "up0": {"conv": _plain_conv(sd, f"{p}2.0.")},
        "conv1": _plain_conv(sd, f"{p}4."),
        "up1": {"conv": _plain_conv(sd, f"{p}6.0.")},
        "conv2": _plain_conv(sd, f"{p}8."),
    }


def _conv_stack5(sd, p):
    # Sequential(conv, GELU)x4 + conv: torch indices 0,2,4,6,8
    return {f"conv{i}": _plain_conv(sd, f"{p}{2 * i}.") for i in range(5)}


def _slice_bank(sd, p, n):
    return {f"s{i}": _conv_stack5(sd, f"{p}{i}.") for i in range(n)}


def _bottleneck(sd, p, n_filters: int = 4):
    out = {}
    for i in range(n_filters + 1):
        out[f"matrix{i}"] = _arr(sd[f"{p}_matrix{i}"])
        out[f"bias{i}"] = _arr(sd[f"{p}_bias{i}"])
        if i < n_filters:
            out[f"factor{i}"] = _arr(sd[f"{p}_factor{i}"])
    out["quantiles"] = _arr(sd[f"{p}quantiles"])
    return out


def strip_prefixes(sd: Mapping) -> dict:
    """DataParallel 'module.' prefix removal (zoo/pretrained.py:19-43)."""
    return {k[len("module.") :] if k.startswith("module.") else k: v for k, v in sd.items()}


def import_progressive(sd: Mapping, cfg) -> dict:
    """Reference ChannelProgresssiveWACNN state dict -> our params tree."""
    sd = strip_prefixes(sd)
    params: dict = {}
    if cfg.multiple_encoder:
        params["g_a0"] = _analysis(sd, "g_a.0.")
        params["g_a1"] = _analysis(sd, "g_a.1.")
    else:
        params["g_a"] = _analysis(sd, "g_a.")
    params["g_s0"] = _synthesis(sd, "g_s.0.")
    params["g_s1"] = _synthesis(sd, "g_s.1.")
    params["h_a"] = _hyper_analysis(sd, "h_a.")
    if cfg.multiple_hyperprior:
        for i in range(2):
            params[f"h_mean_s{i}"] = _hyper_synthesis(sd, f"h_mean_s.{i}.")
            params[f"h_scale_s{i}"] = _hyper_synthesis(sd, f"h_scale_s.{i}.")
    else:
        params["h_mean_s"] = _hyper_synthesis(sd, "h_mean_s.")
        params["h_scale_s"] = _hyper_synthesis(sd, "h_scale_s.")
    params["cc_mean"] = _slice_bank(sd, "cc_mean_transforms.", cfg.ns0)
    params["cc_scale"] = _slice_bank(sd, "cc_scale_transforms.", cfg.ns0)
    params["lrp"] = _slice_bank(sd, "lrp_transforms.", cfg.ns0)
    params["cc_mean_prog"] = _slice_bank(sd, "cc_mean_transforms_prog.", cfg.num_prog_slices)
    params["cc_scale_prog"] = _slice_bank(sd, "cc_scale_transforms_prog.", cfg.num_prog_slices)
    params["lrp_prog"] = _slice_bank(sd, "lrp_transforms_prog.", cfg.ns0)
    params["entropy_bottleneck"] = _bottleneck(sd, "entropy_bottleneck.")
    if cfg.joiner_policy in ("cond", "channel_cond", "channel_res"):
        for i in range(cfg.ns0):
            params.setdefault("joiner" + str(i), _conv_stack3_joiner(sd, f"joiner.{i}."))
    if uses_stacked_prog(cfg):
        params = stack_prog_params(params)
    return params


def _conv_stack3_joiner(sd, p):
    return {f"conv{i}": _plain_conv(sd, f"{p}{2 * i}.") for i in range(3)}


PROG_BANKS = ("cc_mean_prog", "cc_scale_prog", "lrp_prog")


def uses_stacked_prog(cfg) -> bool:
    """Mirror of ChannelProgressiveWACNN._use_stacked_prog for importers."""
    return (
        getattr(cfg, "stack_prog", True)
        and cfg.support_progressive_slices == 0
        and not cfg.all_scalable
        and cfg.joiner_policy == "res"
        and "learnable" not in cfg.mask_policy
        and cfg.name != "rate"
    )


def stack_prog_params(params: dict) -> dict:
    """Convert unrolled prog banks ({s0..sN} subtrees) to the stacked
    (vmapped) layout: each leaf gains a leading slice dim."""
    out = dict(params)
    for bank in PROG_BANKS:
        slices = params[bank]
        keys = sorted(slices.keys(), key=lambda k: int(k[1:]))
        first = slices[keys[0]]
        stacked = {}
        for conv_name in first:
            stacked[conv_name] = {
                pn: np.stack([np.asarray(slices[k][conv_name][pn]) for k in keys])
                for pn in first[conv_name]
            }
        out[bank] = stacked
    return out


def unstack_prog_params(params: dict) -> dict:
    """Inverse of :func:`stack_prog_params`."""
    out = dict(params)
    for bank in PROG_BANKS:
        node = params[bank]
        any_leaf = next(iter(next(iter(node.values())).values()))
        n = np.asarray(any_leaf).shape[0]
        out[bank] = {
            f"s{i}": {
                conv: {pn: np.asarray(v)[i] for pn, v in leaves.items()}
                for conv, leaves in node.items()
            }
            for i in range(n)
        }
    return out


def export_progressive(params: dict, cfg) -> dict:
    """Inverse of :func:`import_progressive` — our params tree -> a
    reference-named state dict (torch orientations).  Used for round-trip
    validation of the mapping and for exporting trained weights back to
    the reference ecosystem."""
    if uses_stacked_prog(cfg):
        params = unstack_prog_params(params)
    sd: dict = {}

    def inv_conv(w):  # HWIO -> OIHW
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    def inv_deconv(w):  # HWIO -> IOHW
        return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 0, 1)))

    def put_conv(prefix, node):
        sd[prefix + "weight"] = inv_conv(node["kernel"])
        sd[prefix + "bias"] = _arr(node["bias"])

    def put_deconv(prefix, node):
        sd[prefix + "weight"] = inv_deconv(node["kernel"])
        sd[prefix + "bias"] = _arr(node["bias"])

    def put_gdn(prefix, node):
        sd[prefix + "beta"] = _arr(node["beta"])
        sd[prefix + "gamma"] = _arr(node["gamma"])

    def put_ru(prefix, node):
        for j, name in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
            put_conv(f"{prefix}{j}.", node[name])

    def put_attn(prefix, node):
        for r in range(3):
            put_ru(f"{prefix}conv_a.{r}.conv.", node[f"a_res{r}"])
        ap = f"{prefix}conv_b.0."
        sd[ap + "attn.qkv.weight"] = _lin(node["attn"]["qkv_kernel"])
        sd[ap + "attn.qkv.bias"] = _arr(node["attn"]["qkv_bias"])
        sd[ap + "attn.proj.weight"] = _lin(node["attn"]["proj_kernel"])
        sd[ap + "attn.proj.bias"] = _arr(node["attn"]["proj_bias"])
        sd[ap + "attn.relative_position_bias_table"] = _arr(node["attn"]["rel_pos_bias"])
        for r in range(3):
            put_ru(f"{prefix}conv_b.{r + 1}.conv.", node[f"b_res{r}"])
        put_conv(f"{prefix}conv_b.4.", node["b_proj"])

    def put_analysis(prefix, node):
        put_conv(f"{prefix}0.", node["conv0"])
        put_gdn(f"{prefix}1.", node["gdn0"])
        put_conv(f"{prefix}2.", node["conv1"])
        put_gdn(f"{prefix}3.", node["gdn1"])
        put_attn(f"{prefix}4.", node["attn0"])
        put_conv(f"{prefix}5.", node["conv2"])
        put_gdn(f"{prefix}6.", node["gdn2"])
        put_conv(f"{prefix}7.", node["conv3"])
        put_attn(f"{prefix}8.", node["attn1"])

    def put_synthesis(prefix, node):
        put_attn(f"{prefix}0.", node["attn0"])
        put_deconv(f"{prefix}1.", node["deconv0"])
        put_gdn(f"{prefix}2.", node["igdn0"])
        put_deconv(f"{prefix}3.", node["deconv1"])
        put_gdn(f"{prefix}4.", node["igdn1"])
        put_attn(f"{prefix}5.", node["attn1"])
        put_deconv(f"{prefix}6.", node["deconv2"])
        put_gdn(f"{prefix}7.", node["igdn2"])
        put_deconv(f"{prefix}8.", node["deconv3"])

    def put_hyper_analysis(prefix, node):
        for i in range(5):
            put_conv(f"{prefix}{2 * i}.", node[f"conv{i}"])

    def put_hyper_synthesis(prefix, node):
        put_conv(f"{prefix}0.", node["conv0"])
        put_conv(f"{prefix}2.0.", node["up0"]["conv"])
        put_conv(f"{prefix}4.", node["conv1"])
        put_conv(f"{prefix}6.0.", node["up1"]["conv"])
        put_conv(f"{prefix}8.", node["conv2"])

    def put_bank(prefix, node, n):
        for i in range(n):
            for j in range(5):
                put_conv(f"{prefix}{i}.{2 * j}.", node[f"s{i}"][f"conv{j}"])

    if cfg.multiple_encoder:
        put_analysis("g_a.0.", params["g_a0"])
        put_analysis("g_a.1.", params["g_a1"])
    else:
        put_analysis("g_a.", params["g_a"])
    put_synthesis("g_s.0.", params["g_s0"])
    put_synthesis("g_s.1.", params["g_s1"])
    put_hyper_analysis("h_a.", params["h_a"])
    if cfg.multiple_hyperprior:
        for i in range(2):
            put_hyper_synthesis(f"h_mean_s.{i}.", params[f"h_mean_s{i}"])
            put_hyper_synthesis(f"h_scale_s.{i}.", params[f"h_scale_s{i}"])
    else:
        put_hyper_synthesis("h_mean_s.", params["h_mean_s"])
        put_hyper_synthesis("h_scale_s.", params["h_scale_s"])
    put_bank("cc_mean_transforms.", params["cc_mean"], cfg.ns0)
    put_bank("cc_scale_transforms.", params["cc_scale"], cfg.ns0)
    put_bank("lrp_transforms.", params["lrp"], cfg.ns0)
    put_bank("cc_mean_transforms_prog.", params["cc_mean_prog"], cfg.num_prog_slices)
    put_bank("cc_scale_transforms_prog.", params["cc_scale_prog"], cfg.num_prog_slices)
    put_bank("lrp_transforms_prog.", params["lrp_prog"], cfg.ns0)
    eb = params["entropy_bottleneck"]
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = _arr(eb[f"matrix{i}"])
        sd[f"entropy_bottleneck._bias{i}"] = _arr(eb[f"bias{i}"])
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = _arr(eb[f"factor{i}"])
    sd["entropy_bottleneck.quantiles"] = _arr(eb["quantiles"])
    return sd


def load_pth(path: str) -> dict:
    """Load a torch checkpoint file (CPU) and return the raw state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
