"""Spatial tiling of large images across chips with halo exchange.

The codec-domain analog of sequence parallelism (SURVEY.md §2.9, §5): a
2K+ image is split into width-tiles, one per device on the mesh's "tile"
axis.  All transform dependencies are local — convs have bounded receptive
fields and the window attention is strictly windowed (<= 8x8 per scale,
win_attention.py:141-148), with the Swin shift's wraparound neutralized by
its own attention mask — so exchanging a fixed halo of input columns via
`ppermute` and discarding it after the transform reproduces the
single-chip transform up to XLA float-reassociation noise (< 2e-5 on
unit-scale activations; the per-tile and full-width programs compile to
different fusion schedules, so BITWISE equality of the transforms is not
guaranteed and not claimed).

Exactness contract, precisely:
  * Encoder/decoder mask+sigma consistency — the invariant that decides
    stream integrity (CHProg_cnn.py:960-968) — is STRUCTURAL: sigma, the
    quantile mask, and the CDF indexes are computed from the decoded
    z/base-slice stream by the codec's shared executables
    (models/codec_granular.py), which tiling never touches.  A stream
    encoded with a tiled front end decodes on any topology, tiled or not.
  * Tiled-vs-single-chip STREAM equality holds whenever the analysis
    difference does not flip a symbol rounding or a quantile threshold
    (a <2e-5 perturbation next to a .5 boundary could, in principle);
    byte-equality is asserted across seeds and qualities in
    tests/test_tiling.py.

Halo size: one-sided receptive extent of g_a through input space:
conv5(2) + conv5(4) + attn8+4(<=12*4) + conv5(8) + conv5(16) + attn4+2
(<=6*16) = 174 px, rounded up to 192 (multiple of the total stride 16 so
tile phases align).

The decoder-side mask invariant under sharding: the sigma quantile must be
GLOBAL per image — computed here with an all_gather of the (small) sigma
tensor over the tile axis (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

HALO = 192  # input-space one-sided halo for g_a (see module docstring)
STRIDE = 16  # total downsampling of g_a / upsampling of g_s


def _exchange_halo_w(x, halo: int, axis: str):
    """Gather `halo` columns from each width-neighbor via ppermute.

    x: (B, H, W_local, C) per-device block inside shard_map.
    Returns (padded, valid_start): padded is (B, H, halo + W_local + halo, C).

    Edge alignment: the Swin shift mask isolates true-image-edge segments,
    so a tile containing a global edge must have its array END exactly at
    that edge.  The first tile is laid out [x | right_halo | 0], the last
    [0 | left_halo | x], interior [left_halo | x | right_halo]; the valid
    (non-discard) region starts at column 0 / 2*halo / halo respectively.
    Shapes stay uniform (shard_map requirement); only the roll offset and
    valid_start vary per device.
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    left_strip = x[:, :, :halo]
    right_strip = x[:, :, -halo:]
    # ppermute: devices without a source receive zeros
    from_left = jax.lax.ppermute(right_strip, axis, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(left_strip, axis, [(i + 1, i) for i in range(n - 1)])
    padded = jnp.concatenate([from_left, x, from_right], axis=2)
    # first tile: roll left by halo -> [x | from_right | zeros]
    # last tile: roll right by halo -> [zeros | from_left | x]
    shift = jnp.where(idx == 0, -halo, jnp.where(idx == n - 1, halo, 0))
    padded = jnp.roll(padded, shift, axis=2)
    valid_start = jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2 * halo, halo))
    return padded, valid_start


# jitted sharded programs cached per (caller key, topology, geometry):
# building jax.jit(shard_map(...)) per CALL retraced and recompiled every
# invocation (measured 15.6 s/image on the 2K bench), and a `variables`
# CLOSURE would embed the params as jit constants — the host-fetch trap
# documented in models/codec.py.  Variables are therefore explicit
# shard_map operands (replicated) and the program is built once.
_SHARDED_CACHE: dict = {}


def _model_key(model) -> tuple:
    """Stable cache identity for a model: class + full config repr.

    id(model) was unsafe (ADVICE r4): ids are reused after GC, so a new,
    differently-configured model could silently reuse a program traced
    from a dead model's closure.  The traced programs take `variables` as
    an explicit operand, so class+cfg fully determines the computation —
    equal keys are guaranteed functionally identical, and key lifetime no
    longer depends on object lifetime."""
    return (type(model).__qualname__, repr(model.cfg))


def tiled_apply_transform(fn, variables, x, mesh: Mesh, *, halo: int = HALO,
                          stride: int = STRIDE, axis: str = "model",
                          cache_key=None):
    """Apply an image->latent transform `fn` over width-tiles exactly.

    fn: (variables, (B, H, W, C)) -> (B, H/stride, W/stride, C') local
    transform taking the param pytree EXPLICITLY (see _SHARDED_CACHE).
    x must be sharded (or shardable) over its W dim on mesh axis `axis`.
    Each device computes fn on its halo-padded tile and discards the halo.
    cache_key: stable identity for the jitted program (defaults to fn —
    pass one whenever fn is a fresh closure per call).
    """
    n = mesh.shape[axis]
    w = x.shape[2]
    assert w % (n * stride) == 0, f"W={w} not divisible by tiles*stride"
    tile_w = w // n
    # halo must be a multiple of 64 so the Swin window grids of the padded
    # tile align with the global window grids at every scale
    assert halo % 64 == 0 and halo <= tile_w, (
        f"halo {halo} must be <= tile width {tile_w} and a multiple of 64"
    )

    key = (
        "apply", cache_key if cache_key is not None else fn, axis, halo,
        stride, tuple(mesh.devices.flat), x.shape, str(x.dtype),
    )
    if key not in _SHARDED_CACHE:

        def local(v, x_local):
            padded, valid_start = _exchange_halo_w(x_local, halo, axis)
            y = fn(v, padded)
            start_lat = valid_start // stride
            return jax.lax.dynamic_slice_in_dim(
                y, start_lat, tile_w // stride, axis=2
            )

        from jax import shard_map

        _SHARDED_CACHE[key] = jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(None, None, axis, None)),
                out_specs=P(None, None, axis, None),
                check_vma=False,
            )
        )
    return _SHARDED_CACHE[key](variables, x)


def global_quantile_mask(sigma_local, keep_frac: float, mesh: Mesh, axis: str = "model"):
    """Per-image top-fraction mask with GLOBAL (cross-tile) ranking.

    sigma_local: (B, h, w_local, C) inside shard_map.  All-gathers sigma
    over the tile axis, takes the global per-image quantile, and thresholds
    locally — bit-identical to the single-chip mask.
    """

    def local(sig):
        full = jax.lax.all_gather(sig, axis, axis=2, tiled=True)
        b = full.shape[0]
        flat = full.reshape(b, -1).astype(jnp.float32)
        q = jnp.quantile(flat, 1.0 - keep_frac, axis=1, method="linear")
        return (sig >= q[:, None, None, None]).astype(jnp.float32)

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, None, axis, None),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )(sigma_local)


def tiled_analyze(model, variables, x, mesh: Mesh, *, axis: str = "model",
                  halo: int = HALO):
    """Exact tiled g_a: returns the full latent, identical to single-chip."""

    def fn(v, tile):
        return model.apply(v, tile, method=type(model).analyze)

    return tiled_apply_transform(
        fn, variables, x, mesh, halo=halo, stride=STRIDE, axis=axis,
        cache_key=(_model_key(model), "analyze"),
    )


def tiled_compress(codec, x, mesh: Mesh, *, quality: float = 10.0,
                   mask_pol: str | None = None, axis: str = "model"):
    """Sharded encode of a large image (BASELINE config 4 shape).

    The analysis transform — where the image-space FLOPs live — runs
    width-tiled with halo exchange on the mesh; the latent (48x smaller
    than the image) is then gathered and the slice/entropy pipeline runs
    through the codec's shared executables.  Exactness: see the module
    docstring — stream byte-equality vs single-chip is asserted across
    seeds/qualities in tests, and encode/decode consistency is structural
    regardless of tiling.
    """
    y = tiled_analyze(codec.model, codec.variables, x, mesh, axis=axis)
    return codec.compress_from_latent(y, x.shape, quality=quality, mask_pol=mask_pol)


def tiled_decompress(codec, data: dict, mesh: Mesh, *, axis: str = "model"):
    """Sharded decode counterpart of tiled_compress: entropy decode +
    slice reconstruction through the codec's shared executables, then the
    synthesis transform (the image-space FLOPs) runs width-tiled."""
    out = codec.decompress_to_latent(data)
    which = 0 if float(data["quality"]) == 0 else 1
    x_hat = tiled_synthesize(
        codec.model, codec.variables, out["y_hat"], mesh,
        decoder_index=which, axis=axis,
    )
    import jax.numpy as jnp

    return {"x_hat": jnp.clip(x_hat, 0.0, 1.0), "stream_ok": out["stream_ok"]}


def tiled_synthesize(model, variables, y_hat, mesh: Mesh, *, decoder_index: int = 1,
                     axis: str = "model", halo_latent: int = 16):
    """Exact tiled g_s: latent tiles + latent-space halo -> image tiles.

    g_s one-sided extent in latent px: attn4+2 (<=6) + deconv chain (~4) +
    attn8+4 at /4 (<=12/4=3) ... bounded by 16 latent px (= 256 image px),
    validated by the equality test.
    """

    n = mesh.shape[axis]
    w = y_hat.shape[2]
    tile_w = w // n
    assert halo_latent <= tile_w

    key = (
        "synth", _model_key(model), decoder_index, axis, halo_latent,
        tuple(mesh.devices.flat), y_hat.shape, str(y_hat.dtype),
    )
    if key not in _SHARDED_CACHE:

        def fn_latent(v, tile):
            def g(m):
                return m._synth_net(decoder_index)(tile)

            return model.apply(v, method=g)

        def local(v, y_local):
            padded, valid_start = _exchange_halo_w(y_local, halo_latent, axis)
            x = fn_latent(v, padded)
            return jax.lax.dynamic_slice_in_dim(
                x, valid_start * STRIDE, tile_w * STRIDE, axis=2
            )

        from jax import shard_map

        _SHARDED_CACHE[key] = jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(None, None, axis, None)),
                out_specs=P(None, None, axis, None),
                check_vma=False,
            )
        )
    return _SHARDED_CACHE[key](variables, y_hat)
