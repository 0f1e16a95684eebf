"""Variance-aware latent masking — the codec's core novelty, batched.

Behavioral spec: /root/reference/src/compress/layers/masking.py:163-293.
The reference loops over batch elements in Python and calls torch.quantile
per image (masking.py:215-222).  Here every policy is a pure, jit-able,
batched function: the per-image quantile is one vectorized `jnp.quantile`
over the flattened slice — no host loop, shards cleanly under a mesh.

Decoder-side reproducibility invariant (CHProg_cnn.py:960-968): the decoder
recomputes the mask from sigma alone, so the mask must be a deterministic
pure function of sigma.  Keep sigma math in f32 and the quantile exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from progressivecodec_tpu.ops.math import ste_round


def quantile_mask(values: jax.Array, keep_frac) -> jax.Array:
    """Per-image mask keeping the top `keep_frac` fraction of elements.

    values: (B, H, W, C) — ranked per batch element over all elements.
    mask = values >= quantile(values, 1 - keep_frac), with torch-style
    linear-interpolation quantile so reference mask semantics match.
    """
    b = values.shape[0]
    flat = values.reshape(b, -1).astype(jnp.float32)
    q = jnp.quantile(flat, 1.0 - keep_frac, axis=1, method="linear")
    mask = flat >= q[:, None]
    return mask.reshape(values.shape).astype(jnp.float32)


def channel_mask(
    scale: jax.Array,
    *,
    pr: float,
    mask_pol: str = "point-based-std",
    slice_index: int = 0,
    dim_chunk: int = 32,
    division_channel: int = 320,
    cust_map: jax.Array | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Compute the enhancement-layer mask for one latent slice.

    scale: (B, H, W, dim_chunk) predicted Gaussian sigma for the slice.
    pr: quality scalar in [0, 10] (static Python float — the trace is
    specialized per quality, as the reference specializes per call).
    """
    if cust_map is not None:
        # gradient-importance map path (masking.py:171-194)
        if pr >= 10:
            return jnp.ones_like(scale, dtype=jnp.float32)
        if pr <= 0:
            return jnp.zeros_like(scale, dtype=jnp.float32)
        return quantile_mask(cust_map, min(pr, 10) * 0.1)

    if mask_pol == "point-based-std":
        if pr >= 10:
            return jnp.ones_like(scale, dtype=jnp.float32)
        if pr <= 0:
            return jnp.zeros_like(scale, dtype=jnp.float32)
        return quantile_mask(scale, min(pr, 10) * 0.1)

    if mask_pol == "two-levels":
        fill = 0.0 if pr == 0 else 1.0
        return jnp.full_like(scale, fill, dtype=jnp.float32)

    if mask_pol == "three-levels-std":
        # masking.py:229-247 — pr in {0, 1, 2}; middle level keeps top 20%
        if pr == 0:
            return jnp.zeros_like(scale, dtype=jnp.float32)
        if pr == 2:
            return jnp.ones_like(scale, dtype=jnp.float32)
        return quantile_mask(scale, 0.2)

    if mask_pol == "random":
        # masking.py:261-272 — keep pr*10 percent of elements uniformly
        if rng is None:
            raise ValueError("random mask policy needs an rng key")
        b = scale.shape[0]
        n = scale.size // b
        num_ones = int(n * (pr * 10) / 100.0)
        flat_noise = jax.random.uniform(rng, (b, n))
        thresh = -jnp.sort(-flat_noise, axis=1)[:, num_ones - 1] if num_ones > 0 else jnp.inf
        mask = flat_noise >= thresh[:, None] if num_ones > 0 else jnp.zeros((b, n))
        return mask.reshape(scale.shape).astype(jnp.float32)

    if mask_pol == "scalable_res":
        # masking.py:273-293 — channel-count proportional progressive fill
        if pr == 0:
            return jnp.zeros_like(scale, dtype=jnp.float32)
        if pr == 10:
            return jnp.ones_like(scale, dtype=jnp.float32)
        ones_channel = int(division_channel * pr * 0.1)
        ch_start = slice_index * dim_chunk
        ch_end = dim_chunk * (slice_index + 1)
        if ones_channel >= ch_end:
            return jnp.ones_like(scale, dtype=jnp.float32)
        if ones_channel < ch_start:
            return jnp.zeros_like(scale, dtype=jnp.float32)
        rem = ones_channel % dim_chunk
        ch_idx = jnp.arange(scale.shape[-1])
        return jnp.broadcast_to((ch_idx >= rem).astype(jnp.float32), scale.shape)

    raise NotImplementedError(f"mask policy {mask_pol!r}")


def stacked_channel_mask(
    scale_stack: jax.Array,
    *,
    pr: float,
    mask_pol: str = "point-based-std",
    dim_chunk: int = 32,
    division_channel: int = 320,
    cust_map: jax.Array | None = None,
) -> jax.Array:
    """Vectorized mask over all enhancement slices at once.

    scale_stack: (S, B, H, W, dim_chunk) — per-(slice, image) ranking, one
    fused quantile instead of S separate calls.  Semantics identical to
    per-slice :func:`channel_mask`.  cust_map, if given, is a stacked
    importance map of the same shape and replaces sigma as the ranking
    source (masking.py:171-194 semantics, per slice).
    """
    s, b = scale_stack.shape[0], scale_stack.shape[1]
    if cust_map is not None:
        if pr >= 10:
            return jnp.ones_like(scale_stack, dtype=jnp.float32)
        if pr <= 0:
            return jnp.zeros_like(scale_stack, dtype=jnp.float32)
        flat = cust_map.reshape(s * b, -1).astype(jnp.float32)
        q = jnp.quantile(flat, 1.0 - min(pr, 10) * 0.1, axis=1, method="linear")
        return (flat >= q[:, None]).reshape(scale_stack.shape).astype(jnp.float32)

    if mask_pol == "point-based-std":
        if pr >= 10:
            return jnp.ones_like(scale_stack, dtype=jnp.float32)
        if pr <= 0:
            return jnp.zeros_like(scale_stack, dtype=jnp.float32)
        flat = scale_stack.reshape(s * b, -1).astype(jnp.float32)
        q = jnp.quantile(flat, 1.0 - min(pr, 10) * 0.1, axis=1, method="linear")
        return (flat >= q[:, None]).reshape(scale_stack.shape).astype(jnp.float32)

    if mask_pol == "two-levels":
        fill = 0.0 if pr == 0 else 1.0
        return jnp.full_like(scale_stack, fill, dtype=jnp.float32)

    if mask_pol == "three-levels-std":
        if pr == 0:
            return jnp.zeros_like(scale_stack, dtype=jnp.float32)
        if pr == 2:
            return jnp.ones_like(scale_stack, dtype=jnp.float32)
        flat = scale_stack.reshape(s * b, -1).astype(jnp.float32)
        q = jnp.quantile(flat, 0.8, axis=1, method="linear")
        return (flat >= q[:, None]).reshape(scale_stack.shape).astype(jnp.float32)

    if mask_pol == "scalable_res":
        if pr == 0:
            return jnp.zeros_like(scale_stack, dtype=jnp.float32)
        if pr == 10:
            return jnp.ones_like(scale_stack, dtype=jnp.float32)
        import numpy as np

        ones_channel = int(division_channel * pr * 0.1)
        per_slice = np.zeros((s, dim_chunk), np.float32)
        for i in range(s):
            lo, hi = i * dim_chunk, (i + 1) * dim_chunk
            if ones_channel >= hi:
                per_slice[i] = 1.0
            elif ones_channel >= lo:
                per_slice[i, ones_channel % dim_chunk :] = 1.0
        return jnp.broadcast_to(
            jnp.asarray(per_slice)[:, None, None, None, :], scale_stack.shape
        )

    raise NotImplementedError(f"stacked mask policy {mask_pol!r}")


def apply_mask_noise(mask: jax.Array, training: bool) -> jax.Array:
    """STE-round in training, hard round at eval (masking.py:125-133)."""
    return ste_round(mask) if training else jnp.round(mask)


def delta_mask(scale: jax.Array, pr_bar: float, pr: float) -> jax.Array:
    """Elements newly unmasked between qualities pr_bar <= pr.

    The reference's delta_mask is dead/buggy (masking.py:136-161 never
    returns); the REM model instead uses mask(pr) - mask(pr_bar)
    (CHProgREM.py:375-428), which is what this computes.
    """
    m_hi = channel_mask(scale, pr=pr, mask_pol="point-based-std")
    m_lo = channel_mask(scale, pr=pr_bar, mask_pol="point-based-std")
    return jnp.clip(m_hi - m_lo, 0.0, 1.0)
