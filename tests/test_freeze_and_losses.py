"""Freezing masks and auxiliary loss variants."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.training.freeze import (
    freeze_base_net_fn,
    rem_freeze_fn,
    decoder_only_fn,
    freeze_mask,
    masked_optimizer,
)
from progressivecodec_tpu.training.loss import (
    scalable_distilled_rate_distortion_loss,
    distilled_rate_loss,
    latent_loss,
    distortion_loss,
)

TINY = ModelConfig(
    name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)


def _params():
    model = ChannelProgressiveWACNN(cfg=TINY)
    variables = jax.jit(
        lambda r, x: model.init({"params": r}, x, training=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return variables["params"]


def test_freeze_base_net_masks_expected_modules():
    params = _params()
    fn = freeze_base_net_fn()
    mask = freeze_mask(params, fn)
    assert mask["g_a0"] is not None
    # frozen modules -> all False leaves
    assert not any(jax.tree.leaves(mask["g_a0"]))
    assert not any(jax.tree.leaves(mask["cc_mean"]))
    # trainable ones -> True
    assert all(jax.tree.leaves(mask["g_a1"]))
    assert all(jax.tree.leaves(mask["cc_mean_prog"]))


def test_masked_optimizer_zeroes_frozen_updates():
    params = _params()
    tx = masked_optimizer(optax.sgd(1.0), params, freeze_base_net_fn())
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["g_a0"]["conv0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["g_a1"]["conv0"]["kernel"]).max()) > 0.0


def test_rem_and_decoder_filters():
    f = rem_freeze_fn()
    assert f("post_latent0_3") and not f("g_s1")
    g = decoder_only_fn()
    assert g("g_s0") and g("g_s1") and not g("cc_mean")


def _fake_output(b=1, h=4, w=4):
    return {
        "x_hat": jnp.zeros((2, b, h, w, 3)),
        "y_hat": [jnp.zeros((b, 2, 2, 8)), jnp.zeros((b, 2, 2, 8))],
        "y_base": jnp.zeros((b, 2, 2, 8)),
        "likelihoods": {
            "y": jnp.full((b, 2, 2, 4), 0.5),
            "y_prog": jnp.full((1, b, 2, 2, 8), 0.5),
            "z": jnp.full((b, 1, 1, 2), 0.5),
        },
    }


def test_distilled_losses_finite():
    target = jnp.zeros((1, 4, 4, 3))
    teacher = lambda t: jnp.ones((1, 2, 2, 8))
    out = scalable_distilled_rate_distortion_loss(
        _fake_output(), target, (0.01, 0.04), teacher, teacher, gamma=0.5
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["kd_enh"]) == 1.0  # MSE vs ones
    out2 = distilled_rate_loss(_fake_output(), target, (0.01, 0.04), teacher)
    assert np.isfinite(float(out2["loss"]))


def test_latent_and_distortion_losses():
    a = jnp.ones((2, 3, 3, 4))
    b = jnp.zeros((2, 3, 3, 4))
    ll = latent_loss(a, b)
    np.testing.assert_allclose(float(ll["loss"]), np.sqrt(36.0), rtol=1e-5)
    d = distortion_loss({"x_hat": jnp.full((1, 2, 2, 3), 0.1)}, jnp.zeros((1, 2, 2, 3)))
    np.testing.assert_allclose(float(d["mse"]), 0.01, rtol=1e-5)
