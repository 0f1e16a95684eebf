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


# --------------------------------------------------------------------------
# family-member blocks beyond the core progressive tree
# --------------------------------------------------------------------------


def _residual_block(sd, p):
    """models/utils.py:59-87 ResidualBlock; `skip` 1x1 present only when
    in_ch != out_ch — detected from the state dict."""
    node = {
        "conv1": _plain_conv(sd, p + "conv1."),
        "conv2": _plain_conv(sd, p + "conv2."),
    }
    if p + "skip.weight" in sd:
        node["skip"] = _plain_conv(sd, p + "skip.")
    return node


def _latent_rate_reduction(sd, p, deep: bool):
    """postprocessing_network.py:241-314 LatentRateReduction -> our
    models/rem.py naming (enc_* Sequentials of ResidualBlocks)."""
    n_base = 3 if deep else 2
    n_enc = 4 if deep else 3
    out = {}
    for j in range(n_base):
        out[f"base_ent{j}"] = _residual_block(sd, f"{p}enc_base_entropy_params.{j}.")
        out[f"enh_ent{j}"] = _residual_block(sd, f"{p}enc_enh_entropy_params.{j}.")
        out[f"base_rep{j}"] = _residual_block(sd, f"{p}enc_base_rep.{j}.")
    for j in range(n_enc):
        out[f"enc{j}"] = _residual_block(sd, f"{p}enc.{j}.")
    # zero-init output projection (models/rem.py:71-78) — our TPU addition;
    # reference checkpoints (CHProgREM.py) lack it, so absent keys restore
    # the exact-identity init (zeros) with the correct shapes
    n_out = int(out["enc" + str(n_enc - 1)]["conv1"]["bias"].shape[0])
    if f"{p}zero_out.weight" in sd:
        out["zero_out"] = {
            "kernel": _lin(sd[f"{p}zero_out.weight"]),
            "bias": _arr(sd[f"{p}zero_out.bias"]),
        }
    else:
        out["zero_out"] = {
            "kernel": np.zeros((n_out, n_out), np.float32),
            "bias": np.zeros((n_out,), np.float32),
        }
    return out


def _conv_block_residual(sd, p):
    """layers/unet.py:53-67 ConvBlockResidual (conv-LReLU-conv-SE + 1x1)."""
    return {
        "conv1": _plain_conv(sd, p + "conv.0."),
        "conv2": _plain_conv(sd, p + "conv.2."),
        "se": {
            "fc1": _lin(sd[p + "conv.3.fc.0.weight"]),
            "fc2": _lin(sd[p + "conv.3.fc.2.weight"]),
        },
        "up_dim": _plain_conv(sd, p + "up_dim."),
    }


def _unet(sd, p):
    """layers/unet.py:70-111 UNet -> layers/unet.py (ours) naming."""
    out = {
        "conv1": _conv_block_residual(sd, f"{p}conv1."),
        "conv2": _conv_block_residual(sd, f"{p}conv2."),
        "conv3": _conv_block_residual(sd, f"{p}conv3."),
        "up3": {"conv": _plain_conv(sd, f"{p}up3.0.")},
        "up_conv3": _conv_block_residual(sd, f"{p}up_conv3."),
        "up2": {"conv": _plain_conv(sd, f"{p}up2.0.")},
        "up_conv2": _conv_block_residual(sd, f"{p}up_conv2."),
    }
    for i in range(4):
        out[f"refine{i}"] = {
            "conv1": _plain_conv(sd, f"{p}context_refine.{i}.conv1."),
            "conv2": _plain_conv(sd, f"{p}context_refine.{i}.conv2."),
        }
    return out


def _refine_seq(sd, p):
    """u_net_post refinement: Sequential(UNet, conv3x3)
    (CHProg_cnn.py:277-284) -> flax nn.Sequential layers_{0,1}."""
    return {"layers_0": _unet(sd, f"{p}0."), "layers_1": _plain_conv(sd, f"{p}1.")}


def _mask_stack(sd, p):
    """three-levels-learnable conv importance stack (masking.py:110-123):
    Sequential(conv3, ReLU, conv3 s2, ReLU, subpel, ReLU, conv3, Sigmoid)."""
    return {
        "conv0": _plain_conv(sd, f"{p}0."),
        "conv1": _plain_conv(sd, f"{p}2."),
        "up": {"conv": _plain_conv(sd, f"{p}4.0.")},
        "conv2": _plain_conv(sd, f"{p}6."),
    }


def import_progressive(sd: Mapping, cfg) -> dict:
    """Reference ChannelProgresssiveWACNN state dict -> our params tree."""
    sd = strip_prefixes(sd)
    params: dict = {}
    if cfg.multiple_encoder:
        params["g_a0"] = _analysis(sd, "g_a.0.")
        params["g_a1"] = _analysis(sd, "g_a.1.")
    else:
        params["g_a"] = _analysis(sd, "g_a.")
    if cfg.multiple_decoder:
        params["g_s0"] = _synthesis(sd, "g_s.0.")
        params["g_s1"] = _synthesis(sd, "g_s.1.")
    else:
        # single shared decoder (the reference CLI default, parser.py:53;
        # plain nn.Sequential -> 'g_s.{idx}.' keys)
        params["g_s"] = _synthesis(sd, "g_s.")
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
    if cfg.u_net_post == 1:
        params["refine"] = _refine_seq(sd, "refine.")
    elif cfg.u_net_post == 2:
        for i in range(2):
            params[f"refine{i}"] = _refine_seq(sd, f"refine.{i}.")
    if "learnable" in cfg.mask_policy:
        # ChannelMask module instance named `masking` (CHProg_cnn.py:100-104)
        for i in range(cfg.num_prog_slices):
            params[f"mask_conv{i}"] = _mask_stack(sd, f"masking.mask_conv.{i}.")
    if uses_stacked_prog(cfg):
        params = stack_prog_params(params)
    return params


def import_wacnn(sd: Mapping, cfg) -> dict:
    """Reference WACNN anchor (cnn.py:23-134) state dict -> our
    models/wacnn.py params tree — enables `--checkpoint_base`-style warm
    starts from real anchors (train.py:27-84)."""
    sd = strip_prefixes(sd)
    ns = cfg.M // cfg.dim_chunk
    return {
        "g_a": _analysis(sd, "g_a."),
        "g_s": _synthesis(sd, "g_s."),
        "h_a": _hyper_analysis(sd, "h_a."),
        "h_mean_s": _hyper_synthesis(sd, "h_mean_s."),
        "h_scale_s": _hyper_synthesis(sd, "h_scale_s."),
        "cc_mean": _slice_bank(sd, "cc_mean_transforms.", ns),
        "cc_scale": _slice_bank(sd, "cc_scale_transforms.", ns),
        "lrp": _slice_bank(sd, "lrp_transforms.", ns),
        "entropy_bottleneck": _bottleneck(sd, "entropy_bottleneck."),
    }


def import_rem(sd: Mapping, cfg, deep: bool = True) -> dict:
    """Reference PostRateProcessedNetwork (CHProgREM.py:224-234): the
    wrapped `base_net.*` tree plus the per-(interval, slice)
    LatentRateReduction banks.  Our REM model subclasses the progressive
    model, so the result is one flat tree."""
    sd = strip_prefixes(sd)
    base_sd = {
        k[len("base_net.") :]: v for k, v in sd.items() if k.startswith("base_net.")
    }
    params = import_progressive(base_sd, cfg)
    for k in range(len(cfg.check_levels)):
        for i in range(cfg.num_prog_slices):
            # flax init materializes only the banks its trace touched, so
            # tolerate sparse trees on both sides of the mapping
            if f"post_latent.{k}.{i}.enc.0.conv1.weight" in sd:
                params[f"post_latent{k}_{i}"] = _latent_rate_reduction(
                    sd, f"post_latent.{k}.{i}.", deep
                )
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
    if cfg.multiple_decoder:
        put_synthesis("g_s.0.", params["g_s0"])
        put_synthesis("g_s.1.", params["g_s1"])
    else:
        put_synthesis("g_s.", params["g_s"])
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

    def put_joiner(prefix, node):
        for j in range(3):
            put_conv(f"{prefix}{2 * j}.", node[f"conv{j}"])

    if cfg.joiner_policy in ("cond", "channel_cond", "channel_res"):
        for i in range(cfg.ns0):
            put_joiner(f"joiner.{i}.", params[f"joiner{i}"])

    def put_cbr(prefix, node):
        put_conv(f"{prefix}conv.0.", node["conv1"])
        put_conv(f"{prefix}conv.2.", node["conv2"])
        sd[f"{prefix}conv.3.fc.0.weight"] = _lin(node["se"]["fc1"])
        sd[f"{prefix}conv.3.fc.2.weight"] = _lin(node["se"]["fc2"])
        put_conv(f"{prefix}up_dim.", node["up_dim"])

    def put_unet(prefix, node):
        for nm in ("conv1", "conv2", "conv3", "up_conv3", "up_conv2"):
            put_cbr(f"{prefix}{nm}.", node[nm])
        for i in range(4):
            put_conv(f"{prefix}context_refine.{i}.conv1.", node[f"refine{i}"]["conv1"])
            put_conv(f"{prefix}context_refine.{i}.conv2.", node[f"refine{i}"]["conv2"])
        put_conv(f"{prefix}up3.0.", node["up3"]["conv"])
        put_conv(f"{prefix}up2.0.", node["up2"]["conv"])

    def put_refine(prefix, node):
        put_unet(f"{prefix}0.", node["layers_0"])
        put_conv(f"{prefix}1.", node["layers_1"])

    if cfg.u_net_post == 1:
        put_refine("refine.", params["refine"])
    elif cfg.u_net_post == 2:
        for i in range(2):
            put_refine(f"refine.{i}.", params[f"refine{i}"])

    if "learnable" in cfg.mask_policy:
        for i in range(cfg.num_prog_slices):
            node = params[f"mask_conv{i}"]
            put_conv(f"masking.mask_conv.{i}.0.", node["conv0"])
            put_conv(f"masking.mask_conv.{i}.2.", node["conv1"])
            put_conv(f"masking.mask_conv.{i}.4.0.", node["up"]["conv"])
            put_conv(f"masking.mask_conv.{i}.6.", node["conv2"])
    return sd


def export_wacnn(params: dict, cfg) -> dict:
    """Inverse of :func:`import_wacnn`."""
    prog = dict(params)
    # reuse export_progressive's put_* helpers by emitting through a dummy
    # dual tree would duplicate logic; emit directly instead
    sd: dict = {}

    def inv_conv(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    def inv_deconv(w):
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

    put_conv("g_a.0.", prog["g_a"]["conv0"])
    put_gdn("g_a.1.", prog["g_a"]["gdn0"])
    put_conv("g_a.2.", prog["g_a"]["conv1"])
    put_gdn("g_a.3.", prog["g_a"]["gdn1"])
    put_attn("g_a.4.", prog["g_a"]["attn0"])
    put_conv("g_a.5.", prog["g_a"]["conv2"])
    put_gdn("g_a.6.", prog["g_a"]["gdn2"])
    put_conv("g_a.7.", prog["g_a"]["conv3"])
    put_attn("g_a.8.", prog["g_a"]["attn1"])
    put_attn("g_s.0.", prog["g_s"]["attn0"])
    put_deconv("g_s.1.", prog["g_s"]["deconv0"])
    put_gdn("g_s.2.", prog["g_s"]["igdn0"])
    put_deconv("g_s.3.", prog["g_s"]["deconv1"])
    put_gdn("g_s.4.", prog["g_s"]["igdn1"])
    put_attn("g_s.5.", prog["g_s"]["attn1"])
    put_deconv("g_s.6.", prog["g_s"]["deconv2"])
    put_gdn("g_s.7.", prog["g_s"]["igdn2"])
    put_deconv("g_s.8.", prog["g_s"]["deconv3"])
    for i in range(5):
        put_conv(f"h_a.{2 * i}.", prog["h_a"][f"conv{i}"])
    for name in ("h_mean_s", "h_scale_s"):
        put_conv(f"{name}.0.", prog[name]["conv0"])
        put_conv(f"{name}.2.0.", prog[name]["up0"]["conv"])
        put_conv(f"{name}.4.", prog[name]["conv1"])
        put_conv(f"{name}.6.0.", prog[name]["up1"]["conv"])
        put_conv(f"{name}.8.", prog[name]["conv2"])
    ns = cfg.M // cfg.dim_chunk
    for bank, ref in (
        ("cc_mean", "cc_mean_transforms"),
        ("cc_scale", "cc_scale_transforms"),
        ("lrp", "lrp_transforms"),
    ):
        for i in range(ns):
            for j in range(5):
                put_conv(f"{ref}.{i}.{2 * j}.", prog[bank][f"s{i}"][f"conv{j}"])
    eb = prog["entropy_bottleneck"]
    for i in range(5):
        sd[f"entropy_bottleneck._matrix{i}"] = _arr(eb[f"matrix{i}"])
        sd[f"entropy_bottleneck._bias{i}"] = _arr(eb[f"bias{i}"])
        if i < 4:
            sd[f"entropy_bottleneck._factor{i}"] = _arr(eb[f"factor{i}"])
    sd["entropy_bottleneck.quantiles"] = _arr(eb["quantiles"])
    return sd


def export_rem(params: dict, cfg, deep: bool = True) -> dict:
    """Inverse of :func:`import_rem`: base tree under 'base_net.', plus
    the LatentRateReduction banks."""
    base = {
        k: v for k, v in params.items() if not k.startswith("post_latent")
    }
    sd = {f"base_net.{k}": v for k, v in export_progressive(base, cfg).items()}

    def inv_conv(w):
        return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    def put_conv(prefix, node):
        sd[prefix + "weight"] = inv_conv(node["kernel"])
        sd[prefix + "bias"] = _arr(node["bias"])

    def put_rb(prefix, node):
        put_conv(f"{prefix}conv1.", node["conv1"])
        put_conv(f"{prefix}conv2.", node["conv2"])
        if "skip" in node:
            put_conv(f"{prefix}skip.", node["skip"])

    n_base = 3 if deep else 2
    n_enc = 4 if deep else 3
    for k in range(len(cfg.check_levels)):
        for i in range(cfg.num_prog_slices):
            if f"post_latent{k}_{i}" not in params:
                continue
            node = params[f"post_latent{k}_{i}"]
            p = f"post_latent.{k}.{i}."
            for j in range(n_base):
                put_rb(f"{p}enc_base_entropy_params.{j}.", node[f"base_ent{j}"])
                put_rb(f"{p}enc_enh_entropy_params.{j}.", node[f"enh_ent{j}"])
                put_rb(f"{p}enc_base_rep.{j}.", node[f"base_rep{j}"])
            for j in range(n_enc):
                put_rb(f"{p}enc.{j}.", node[f"enc{j}"])
            # zero_out Dense == 1x1 channel projection; exported in torch
            # Linear layout (out,in) so import_rem's _lin inverts it
            sd[f"{p}zero_out.weight"] = _lin(node["zero_out"]["kernel"])
            sd[f"{p}zero_out.bias"] = _arr(node["zero_out"]["bias"])
    return sd


def load_pth(path: str) -> dict:
    """Load a torch checkpoint file (CPU) and return the raw state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
