"""Parameter freezing — functional analog of requires_grad surgery.

Behavioral spec: freeze_base_net (CHProg_cnn.py:294-316), REM freeze/
unfreeze_g_s (CHProgREM.py:299-331), unfreeze_decoder (CHProg_cnn.py:286).
In JAX, freezing = optax.masked zeroing of updates for frozen subtrees.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

BASE_NET_MODULES = (
    "g_a0",
    "g_s0",
    "cc_mean",
    "cc_scale",
    "lrp",
)
BASE_HYPER_MODULES = ("h_mean_s0", "h_scale_s0")


def _top_module(path) -> str:
    return str(getattr(path[0], "key", getattr(path[0], "name", "")))


def freeze_mask(params, trainable_fn: Callable[[str], bool]):
    """Bool pytree: True = trainable, keyed by top-level module name."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: trainable_fn(_top_module(p)), params
    )


def freeze_base_net_fn(multiple_hyperprior: bool = False, freeze_dec: bool = False):
    """Trainable filter matching freeze_base_net semantics."""
    frozen = set(BASE_NET_MODULES)
    if multiple_hyperprior:
        frozen |= set(BASE_HYPER_MODULES)
    if freeze_dec:
        frozen.add("g_s1")

    return lambda name: name not in frozen


def rem_freeze_fn():
    """REM training: only the post_latent banks learn (CHProgREM.py:299-304)."""
    return lambda name: name.startswith("post_latent")


def decoder_only_fn():
    """unfreeze_decoder: only g_s learns (CHProg_cnn.py:286-291)."""
    return lambda name: name.startswith("g_s")


def masked_optimizer(tx: optax.GradientTransformation, params, trainable_fn):
    """Wrap an optimizer so frozen params receive zero updates."""
    mask = freeze_mask(params, trainable_fn)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, mask)),
    )
