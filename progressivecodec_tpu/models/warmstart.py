"""Warm-starting the progressive model from a non-progressive anchor.

Behavioral spec: initialize_model_from_pretrained + --checkpoint_base
(/root/reference/src/train.py:27-84, 258-266; utils/state_dict_handler.py
replace_keys): a trained WACNN anchor's g_a/g_s become the progressive
model's base encoder/decoder (and optionally a second anchor's g_s seeds
the enhancement decoder); cc/lrp/bottleneck transfer directly; hyper
transforms are re-initialized (shape change 320 -> 640).

In JAX this is plain params-tree grafting — no key-string surgery.
"""

from __future__ import annotations

from typing import Any

import jax


def warmstart_from_anchor(
    prog_params: dict,
    anchor_params: dict,
    anchor_enh_params: dict | None = None,
    multiple_hyperprior: bool = False,
) -> dict:
    """Graft a WACNN anchor's modules into a fresh progressive tree.

    prog_params: freshly initialized ChannelProgressiveWACNN params.
    anchor_params: trained WACNN params (M = division_dimension[0]).
    anchor_enh_params: optional second anchor seeding g_s1 (train.py:71-79).
    Returns a new params tree (inputs untouched).
    """
    out = jax.tree.map(lambda x: x, prog_params)  # copy structure
    out = dict(out)

    out["g_a0"] = anchor_params["g_a"]
    out["g_s0"] = anchor_params["g_s"]
    for bank in ("cc_mean", "cc_scale", "lrp"):
        out[bank] = anchor_params[bank]
    out["entropy_bottleneck"] = anchor_params["entropy_bottleneck"]
    if multiple_hyperprior:
        out["h_mean_s0"] = anchor_params["h_mean_s"]
        out["h_scale_s0"] = anchor_params["h_scale_s"]
    # single-hyperprior progressive outputs 640ch vs anchor's 320 — re-init
    # (the reference drops h_a/h_mean_s/h_scale_s too, train.py:53-68)
    if anchor_enh_params is not None:
        out["g_s1"] = anchor_enh_params["g_s"]
    return out


def check_warmstart_shapes(prog_params: dict, grafted: dict) -> None:
    """Every grafted leaf must match the target module's shapes."""
    ref = jax.tree_util.tree_leaves_with_path(prog_params)
    new = dict(jax.tree_util.tree_leaves_with_path(grafted))
    for path, leaf in ref:
        got = new[path]
        if got.shape != leaf.shape:
            raise ValueError(f"warmstart shape mismatch at {path}: {got.shape} vs {leaf.shape}")
