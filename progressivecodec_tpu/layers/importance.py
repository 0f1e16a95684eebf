"""Gradient-based importance maps + the MaskEstractor predictor.

Behavioral spec: extract_dec_importance_map (training/step.py:444-514) and
MaskEstractor (layers/postprocessing_network.py:323-431).  The importance
map scores each latent element by |d(recon loss)/d latent| * |delta
latent| between the base and a minimal-enhancement reconstruction; a
MaskEstractor net learns to predict that map so the encoder can use it as
a `cust_map` mask source without decoder-side gradients.

TPU-first: the gradient is one jax.grad of the synthesis MSE — no
Variable/zero_grad machinery; sampling uses explicit PRNG keys.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from progressivecodec_tpu.models.rem import ResidualBlock


def snap_to_scale_table(scales, scale_table):
    """relu + index into the table (step.py:433-441, 473-477)."""
    scales = jax.nn.relu(scales.astype(jnp.float32))
    table = jnp.asarray(scale_table, jnp.float32)
    idx = (len(scale_table) - 1) - jnp.sum(
        scales[..., None] <= table[:-1], axis=-1, dtype=jnp.int32
    )
    return table[idx]


def importance_map(
    model,
    variables,
    x_padded,
    rng,
    scale_table,
    q_eps: float = 1e-6,
):
    """|grad| * |delta-latent| importance map for the enhancement layer.

    model: progressive model; returns a map shaped like the base latent.
    """
    out_b = model.apply(
        variables, x_padded, 0.0, "point-based-std", training=False,
        method=type(model).forward_single_quality,
    )
    out_e = model.apply(
        variables, x_padded, q_eps, "point-based-std", training=False,
        method=type(model).forward_single_quality,
    )
    # base path returns mu/std of the base slices; enhancement path
    # predicts the progressive parameters
    mu_b, std_b = out_b["mu"], out_b["std"]
    mu_e, std_e = out_e["mu"], out_e["std"]

    std_b = snap_to_scale_table(std_b, scale_table)
    std_e = snap_to_scale_table(std_e, scale_table)

    k1, k2 = jax.random.split(rng)
    y_b = mu_b + std_b * jax.random.normal(k1, mu_b.shape)
    y_e = (mu_e + std_e * jax.random.normal(k2, mu_e.shape)) + y_b
    diff = jnp.abs(y_b - y_e)

    def g_s1(latent):
        def run(m):
            return m._synth_net(1)(latent)

        return model.apply(variables, method=run)

    target = jax.lax.stop_gradient(g_s1(y_e))

    def loss_fn(latent):
        x_hat = g_s1(latent)
        return (255.0**2) * jnp.mean((x_hat - target) ** 2)

    grad = jax.grad(loss_fn)(y_b)
    return jnp.abs(grad) * diff


class MaskEstractor(nn.Module):
    """Learns to predict the gradient importance map from latents +
    entropy params (postprocessing_network.py:323-415)."""

    N: int = 320
    portion: str = "big"
    normalize: bool = False

    @nn.compact
    def __call__(self, y_base, y_p0, params_base, params_p0):
        n = self.N

        def stack2(x, cin_label, widths):
            for j, wd in enumerate(widths):
                x = ResidualBlock(wd, name=f"{cin_label}{j}")(x)
            return x

        f_lat_b = stack2(y_base, "base_rep", [n, n])
        f_lat_p = stack2(y_p0, "p0_rep", [n, n])
        f_ent_b = stack2(params_base, "base_ent", [n, n])
        f_ent_p = stack2(params_p0, "p0_ent", [n, n])
        cat = jnp.concatenate([f_lat_b, f_lat_p, f_ent_b, f_ent_p], axis=-1)
        ret = stack2(cat, "enc", [2 * n, n])
        if self.normalize:
            ret = jax.nn.sigmoid(ret)
        return ret
