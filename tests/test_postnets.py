"""Post-processing networks (postprocessing_network.py parity shapes)."""

import jax
import jax.numpy as jnp
import pytest

from progressivecodec_tpu.layers.postnets import (
    LatentPostNet,
    PostNet,
    ResidualBlockGDN,
    ResidualBlockSmall,
)


def test_residual_blocks_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 6))
    for mod in (ResidualBlockGDN(out=10), ResidualBlockSmall(out=10)):
        y, _ = mod.init_with_output(jax.random.PRNGKey(1), x)
        assert y.shape == (1, 8, 8, 10)
    # same-width skip is identity (no skip conv params)
    mod = ResidualBlockGDN(out=6)
    y, v = mod.init_with_output(jax.random.PRNGKey(1), x)
    assert "skip" not in v["params"]


def test_latent_postnet_residual_refinement():
    n = 8
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, n))
    ent = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 2 * n))
    mod = LatentPostNet(N=n)
    y, _ = mod.init_with_output(jax.random.PRNGKey(2), x, ent)
    assert y.shape == x.shape
    assert not jnp.allclose(y, x)  # refinement is additive, not identity


@pytest.mark.parametrize("model_type", [0, 1])
def test_postnet_image_to_image(model_type):
    # type 1 downsamples 16x and then runs 4x4-window attention, so the
    # input must be >= 64 on each side (matches the codec's /64 padding)
    size = 32 if model_type == 0 else 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, size, size, 3))
    mod = PostNet(N=16, M=24, model_type=model_type)
    y, _ = mod.init_with_output(jax.random.PRNGKey(1), x)
    assert y.shape == x.shape
    assert jnp.isfinite(y).all()
