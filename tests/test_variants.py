"""Variant smoke matrix (VERDICT round-2 weak #4): every dispatched config
the reference supports must RUN — forward, forward_single_quality, and the
real-codec round trip — NaN-free with stream_ok.

Reference dispatch sites: u_net_post CHProg_cnn.py:277-284, joiner
policies :385-393, multiple_hyperprior :205-232, all_scalable/support_std
:452-465,584-610, three-levels-learnable masking.py:110-123,248-259.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.codec_granular import GranularCodec

TINY = dict(
    name="channel",
    N=32,
    M=64,
    dim_chunk=8,
    division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)

VARIANTS = {
    "u_net_post_1": dict(u_net_post=1),
    "u_net_post_2": dict(u_net_post=2),
    "joiner_cond": dict(joiner_policy="cond"),
    "joiner_channel_res": dict(joiner_policy="channel_res"),
    "multiple_hyperprior": dict(multiple_hyperprior=True),
    "all_scalable_support_std": dict(
        all_scalable=True, support_std=True, support_progressive_slices=2
    ),
    "learnable_double_dim": dict(
        mask_policy="three-levels-learnable", double_dim=True
    ),
    "residual_before_lrp": dict(residual_before_lrp=True),
    "total_mu_rep": dict(total_mu_rep=True, support_progressive_slices=1),
}


def _qualities(cfg: ModelConfig):
    # three-levels policies use the {0, 1, 2} level grid (masking.py:229-259)
    if "learnable" in cfg.mask_policy or "three-levels" in cfg.mask_policy:
        return [1, 2]
    return [2.0, 10.0]


@pytest.fixture(scope="module", params=sorted(VARIANTS))
def variant(request):
    cfg = ModelConfig(**TINY, **VARIANTS[request.param])
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    return request.param, cfg, model, variables, x


def test_variant_forward(variant):
    name, cfg, model, variables, x = variant
    qs = [0] + _qualities(cfg)
    out = model.apply(
        variables, x, quality=qs, training=True, rng=jax.random.PRNGKey(2)
    )
    assert out["x_hat"].shape == (len(qs), 1, 64, 64, 3), name
    assert np.isfinite(np.asarray(out["x_hat"])).all(), name
    assert np.isfinite(np.asarray(out["likelihoods"]["y_prog"])).all(), name


def test_variant_forward_single_quality(variant):
    name, cfg, model, variables, x = variant
    for q in [0] + _qualities(cfg):
        out = model.apply(
            variables, x, q, training=False,
            method=ChannelProgressiveWACNN.forward_single_quality,
        )
        assert out["x_hat"].shape == (1, 64, 64, 3), (name, q)
        assert np.isfinite(np.asarray(out["x_hat"])).all(), (name, q)
        if q > 0:
            mask = np.asarray(out["mask"])
            assert set(np.unique(mask)) <= {0.0, 1.0}, (name, q)


def test_variant_codec_roundtrip(variant):
    """Real-codec round trip: all variant masks derive from decoder-known
    quantities (sigma, and the decoded base slice for double_dim), so every
    variant is decoder-reproducible."""
    name, cfg, model, variables, x = variant
    codec = GranularCodec(model, variables, lanes=64)
    for q in _qualities(cfg):
        data = codec.compress(x, quality=q, simulate=True)
        out = codec.decompress(data)
        assert bool(out["stream_ok"]), (name, q)
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5,
            err_msg=f"decode != encoder simulation: {name} q={q}",
        )


def test_learnable_mask_gradients_flow():
    """The conv importance map must actually train: d(loss)/d(mask_conv
    params) nonzero through the STE round (masking.py:248-259 semantics)."""
    cfg = ModelConfig(**TINY, mask_policy="three-levels-learnable")
    model = ChannelProgressiveWACNN(cfg=cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, training=False)

    def loss_fn(params):
        out = model.apply(
            {"params": params}, x, quality=[0, 1], training=True,
            rng=jax.random.PRNGKey(2),
        )
        lik = out["likelihoods"]["y_prog"]
        return jnp.sum(-jnp.log2(lik)) + jnp.sum(out["x_hat"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    g = grads["mask_conv0"]
    norms = [float(jnp.abs(leaf).sum()) for leaf in jax.tree.leaves(g)]
    assert sum(norms) > 0, "no gradient reaches the learnable mask conv"
