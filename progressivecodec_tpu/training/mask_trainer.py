"""MaskEstractor training: predict gradient-importance maps from latents.

Behavioral spec: the reference trains MaskEstractor
(layers/postprocessing_network.py:323-431) on MaskImageFolder pairs
(datasets/utils.py:81-230) — images + |grad|x|delta-latent| importance
maps — so the DECODER can predict the encoder's `cust_map` without
gradients.  Here: features come from the jitted forward_single_quality
fragments; the target map from layers/importance.importance_map; one pure
train step (MSE regression), Adam.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from progressivecodec_tpu.layers.importance import MaskEstractor, importance_map


def mask_features(model, variables, x, q_eps: float = 1e-6):
    """(y_base, y_p0, params_base, params_p0) — MaskEstractor inputs
    (CHProgREM.py / postprocessing_network.py:369-414 feature contract):
    decoded base latent, minimal-enhancement latent, and the entropy
    parameters (mu|sigma) of both."""
    out_b = model.apply(
        variables, x, 0.0, "point-based-std", training=False,
        method=type(model).forward_single_quality,
    )
    out_e = model.apply(
        variables, x, q_eps, "point-based-std", training=False,
        method=type(model).forward_single_quality,
    )
    params_base = jnp.concatenate([out_b["mu"], out_b["std"]], axis=-1)
    params_p0 = jnp.concatenate([out_e["mu"], out_e["std"]], axis=-1)
    return out_b["y_hat"], out_e["y_hat"], params_base, params_p0


def init_mask_estractor(rng, model, variables, x, n: int | None = None):
    n = n or model.cfg.division_channel
    est = MaskEstractor(N=n)
    feats = mask_features(model, variables, x)
    params = est.init({"params": rng}, *feats)["params"]
    return est, params


def make_mask_train_step(est: MaskEstractor, lr: float = 1e-4):
    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, feats, target_map):
        def loss_fn(p):
            pred = est.apply({"params": p}, *feats)
            return jnp.mean((pred - target_map) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, step


def predict_cust_map(est: MaskEstractor, est_params, model, variables, x):
    """Decoder-side map prediction: run the estractor on codec-derivable
    features so encoder and decoder can share a predicted cust_map."""
    feats = mask_features(model, variables, x)
    return est.apply({"params": est_params}, *feats)


def importance_target(model, variables, x, rng, scale_table):
    """Ground-truth |grad|x|delta| map (ImportanceMapDataset's label)."""
    return importance_map(model, variables, x, rng, scale_table)
