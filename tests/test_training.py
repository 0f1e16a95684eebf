"""Training-step tests: loss formula, optimizer partition, one real step,
plateau scheduler, checkpoint round trip."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.config import ModelConfig, TrainConfig, ScaleTableConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.training.loss import scalable_rate_distortion_loss
from progressivecodec_tpu.training.optim import (
    make_optimizer,
    _param_labels,
    plateau_init,
    plateau_update,
)
from progressivecodec_tpu.training.step import init_train_state, make_train_step

TINY = ModelConfig(
    name="channel", N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32),
)
TCFG = TrainConfig(batch_size=2, patch_size=64)


def test_loss_formula():
    # hand-checkable toy values
    b, h, w = 1, 2, 2
    target = jnp.zeros((b, h, w, 3))
    x_hat = jnp.stack([jnp.full((b, h, w, 3), 0.1), jnp.full((b, h, w, 3), 0.05)])
    lik = {
        "y": jnp.full((b, 1, 1, 4), 0.5),
        "y_prog": jnp.full((1, b, 1, 1, 8), 0.25),
        "z": jnp.full((b, 1, 1, 2), 0.5),
    }
    out = scalable_rate_distortion_loss(
        {"x_hat": x_hat, "likelihoods": lik}, target, (1.0, 2.0)
    )
    num_pixels = b * h * w
    bpp_base = 4 * 1.0 / num_pixels  # 4 elements * 1 bit
    bpp_prog = 8 * 2.0 / num_pixels
    bpp_hyper = 2 * 1.0 / num_pixels
    expect_bpp = bpp_prog + bpp_base + 2 * bpp_hyper
    np.testing.assert_allclose(float(out["bpp_loss"]), expect_bpp, rtol=1e-5)
    mse = np.array([0.01, 0.0025])
    expect_loss = expect_bpp + 255**2 * np.mean(np.array([1.0, 2.0]) * mse)
    np.testing.assert_allclose(float(out["loss"]), expect_loss, rtol=1e-5)


def test_param_labels_partition():
    model = ChannelProgressiveWACNN(cfg=TINY)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), training=False)
    labels = _param_labels(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(labels)
    aux = [p for p, v in flat if v == "aux"]
    assert len(aux) == 1  # exactly the quantiles
    assert any("quantiles" in str(p) for p, v in flat if v == "aux")


def test_one_train_step_reduces_nan_free():
    model = ChannelProgressiveWACNN(cfg=TINY)
    state, tx = init_train_state(
        model, jax.random.PRNGKey(0), TCFG, sample_shape=(1, 64, 64, 3)
    )
    step = jax.jit(make_train_step(model, tx, quality=(0, 10)))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    old_params = state.params
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_total"]))
    assert np.isfinite(float(metrics["aux_loss"]))
    # params actually moved (including quantiles via the aux optimizer)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), old_params, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0
    q_old = old_params["entropy_bottleneck"]["quantiles"]
    q_new = state.params["entropy_bottleneck"]["quantiles"]
    assert float(jnp.abs(q_old - q_new).max()) > 0


def test_plateau_scheduler():
    s = plateau_init()
    s = plateau_update(s, 1.0)
    assert s.best == 1.0 and s.scale == 1.0
    for _ in range(9):  # patience 8 -> 9th bad epoch triggers decay
        s = plateau_update(s, 2.0)
    assert s.scale == 0.3
    s = plateau_update(s, 0.5)
    assert s.best == 0.5 and s.bad_epochs == 0


def test_lr_scale_applied_to_updates():
    """set_lr_scale must actually shrink the main-branch update (the
    ReduceLROnPlateau wiring the reference applies at train.py:276)."""
    from progressivecodec_tpu.training.optim import make_optimizer_scheduled, set_lr_scale

    params = {"w": jnp.ones((3,)), "entropy_bottleneck": {"quantiles": jnp.ones((2, 1, 3))}}
    grads = jax.tree.map(jnp.ones_like, params)
    tx = make_optimizer_scheduled(lr=1e-4, aux_lr=1e-3)
    st = tx.init(params)
    up1, st1 = tx.update(grads, st, params)
    st_scaled = set_lr_scale(st, 0.3)
    up2, _ = tx.update(grads, st_scaled, params)
    w1 = float(jnp.abs(up1["w"]).max())
    w2 = float(jnp.abs(up2["w"]).max())
    np.testing.assert_allclose(w2, 0.3 * w1, rtol=1e-6)
    # aux branch (quantiles) untouched by the plateau scale
    np.testing.assert_allclose(
        np.asarray(up1["entropy_bottleneck"]["quantiles"]),
        np.asarray(up2["entropy_bottleneck"]["quantiles"]),
    )


def test_init_train_state_uses_scheduled_optimizer():
    """The driver's optimizer must expose the plateau scale hyperparam."""
    from progressivecodec_tpu.training.optim import set_lr_scale

    model = ChannelProgressiveWACNN(cfg=TINY)
    state, tx = init_train_state(
        model, jax.random.PRNGKey(0), TCFG, sample_shape=(1, 64, 64, 3)
    )
    # raises if the scale hyperparam is absent
    st2 = set_lr_scale(state.opt_state, 0.5)
    assert jax.tree_util.tree_structure(st2) == jax.tree_util.tree_structure(state.opt_state)


def test_checkpoint_roundtrip(tmp_path):
    from progressivecodec_tpu.training.checkpoint import save_checkpoint, load_checkpoint

    model = ChannelProgressiveWACNN(cfg=TINY)
    state, tx = init_train_state(
        model, jax.random.PRNGKey(0), TCFG, sample_shape=(1, 64, 64, 3)
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, TINY, TCFG, extra={"epoch": 3})
    restored, meta = load_checkpoint(path, state)
    assert meta["extra"]["epoch"] == 3
    assert meta["model"]["N"] == TINY.N
    np.testing.assert_allclose(
        np.asarray(restored.params["entropy_bottleneck"]["quantiles"]),
        np.asarray(state.params["entropy_bottleneck"]["quantiles"]),
    )


def test_torch_import_export_roundtrip():
    import dataclasses
    from progressivecodec_tpu.models.torch_import import (
        export_progressive,
        import_progressive,
    )

    cfg_unrolled = dataclasses.replace(TINY, stack_prog=False)
    model = ChannelProgressiveWACNN(cfg=cfg_unrolled)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), training=False)
    params = jax.tree.map(np.asarray, variables["params"])
    sd = export_progressive(params, cfg_unrolled)
    back = import_progressive(sd, cfg_unrolled)

    flat_a = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert set(map(str, flat_a)) == set(map(str, flat_b))
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[str(k)] if False else flat_b[k])
    # the exported dict must cover every one of our params (no orphans)
    n_leaves = len(jax.tree.leaves(params))
    assert len(sd) == n_leaves
