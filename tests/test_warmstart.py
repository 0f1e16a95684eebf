"""Warm-start grafting: anchor -> progressive base modules."""

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.wacnn import WACNN
from progressivecodec_tpu.models.warmstart import warmstart_from_anchor, check_warmstart_shapes

ST = ScaleTableConfig(levels=32)
PROG = ModelConfig(name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64), scale_table=ST)
ANCHOR = ModelConfig(name="cnn", N=32, M=32, dim_chunk=8, division_dimension=(32, 32), scale_table=ST)


def test_warmstart_graft_and_forward():
    x = jnp.zeros((1, 64, 64, 3))
    prog = ChannelProgressiveWACNN(cfg=PROG)
    anchor = WACNN(cfg=ANCHOR)
    vp = jax.jit(lambda r, xx: prog.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x
    )
    va = jax.jit(lambda r, xx: anchor.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(1), x
    )
    grafted = warmstart_from_anchor(dict(vp["params"]), dict(va["params"]))
    check_warmstart_shapes(vp["params"], grafted)
    # grafted base encoder equals the anchor's
    np.testing.assert_array_equal(
        np.asarray(grafted["g_a0"]["conv0"]["kernel"]),
        np.asarray(va["params"]["g_a"]["conv0"]["kernel"]),
    )
    # model runs with grafted params
    out = prog.apply(
        {"params": grafted}, x, 10, training=False,
        method=ChannelProgressiveWACNN.forward_single_quality,
    )
    assert np.isfinite(np.asarray(out["x_hat"])).all()
