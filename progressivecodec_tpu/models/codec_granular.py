"""Granular codec: shared-executable compress/decompress orchestration.

WHY THIS EXISTS (SURVEY.md §7 hard part #2): the decoder re-derives the
per-element CDF index and the variance mask from sigma, so sigma must be
BIT-IDENTICAL between the encode and decode paths.  Two different
monolithic jit programs do not guarantee that — XLA may fuse the
parameter-prediction convs differently in each, and float reductions
reassociate (observed as stream desync on real TPU hardware at full model
scale).  The reference gets this for free by running the same eager torch
kernels on both sides (CHProg_cnn.py:960-968).

The TPU-native equivalent: decompose the codec into small jitted
executables and route BOTH paths through the *same compiled executable*
for every computation whose output feeds an index/mask decision (hyper
synthesis, per-slice cc transforms, LRP, mask quantile).  Elementwise glue
(round/clamp/add) is deterministic regardless of program context.  As a
bonus, cold compiles drop from two monolithic graphs to ~20 small ones,
most shared across slices.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.coder import rans_device
from progressivecodec_tpu.coder.rans_device import DecoderState
from progressivecodec_tpu.coder.tables import DEFAULT_LANES
from progressivecodec_tpu.layers.blocks import ConvStack5
from progressivecodec_tpu.layers.masking import stacked_channel_mask
from progressivecodec_tpu.models.codec import Codec, _stream_capacity
from progressivecodec_tpu.models.transforms import (
    AnalysisTransform,
    HyperAnalysis,
    HyperSynthesis,
    SynthesisTransform,
)

_CS5_CACHE: dict[int, Any] = {}


def _cs5(out: int):
    if out not in _CS5_CACHE:
        _CS5_CACHE[out] = ConvStack5(out=out)
    return _CS5_CACHE[out]


class GranularCodec(Codec):
    """Codec for ChannelProgressiveWACNN with per-stage shared executables.

    Requires the stacked enhancement layer (the flagship default config).
    """

    def __init__(self, model, variables, lanes: int = DEFAULT_LANES, precision: int = 16,
                 transform_dtype=None):
        """transform_dtype: optional jnp.bfloat16 to run g_a/g_s in bf16.
        Stream-semantics-safe: the analysis output only feeds the encoder's
        symbol choice (consistent by construction) and the synthesis only
        the reconstruction; no sigma/mask computation is affected."""
        super().__init__(model, variables, lanes, precision)
        cfg = self.cfg
        if cfg.multiple_hyperprior or not cfg.multiple_encoder:
            raise NotImplementedError("granular codec: default encoder/hyperprior only")
        p = variables["params"]
        self.p = p
        self.transform_dtype = transform_dtype
        if transform_dtype is not None:
            cast = lambda tree: jax.tree.map(
                lambda a: a.astype(transform_dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32
                else a,
                tree,
            )
            self._pt = {k: cast(p[k]) for k in ("g_a0", "g_a1", "g_s0", "g_s1")}
        else:
            self._pt = {k: p[k] for k in ("g_a0", "g_a1", "g_s0", "g_s1")}
        dc = cfg.dim_chunk
        self._cs5 = _cs5(dc)
        self._stacked_cs5 = nn.vmap(
            ConvStack5,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
        )(out=dc)
        self._g_a = AnalysisTransform(N=cfg.N, M=cfg.division_dimension[0])
        self._g_s = SynthesisTransform(N=cfg.N, M=cfg.division_dimension[0])
        self._h_a = HyperAnalysis(N=cfg.N)
        self._h_s = HyperSynthesis(out=cfg.division_dimension[1])
        self._scale_table = jnp.asarray(cfg.scale_table.values().astype(np.float32))
        self._ones_cache: dict[int, Any] = {}
        self._med_dev = None

    # ---------- jitted pieces (cached_property => one executable each) ----------

    @functools.cached_property
    def _J_analyze(self):
        dt = self.transform_dtype

        def fn(p0, p1, x):
            if dt is not None:
                x = x.astype(dt)
            y0 = self._g_a.apply({"params": p0}, x)
            y1 = self._g_a.apply({"params": p1}, x)
            return jnp.concatenate([y0, y1], axis=-1).astype(jnp.float32)

        return jax.jit(fn)

    @functools.cached_property
    def _J_hyper_enc(self):
        return jax.jit(lambda p, y: self._h_a.apply({"params": p}, y))

    @functools.cached_property
    def _J_zquant(self):
        t = self.device_tables

        def fn(z, med):
            sym = jnp.round(z.astype(jnp.float32) - med).astype(jnp.int32)
            cz = z.shape[-1]
            idx = jnp.broadcast_to(jnp.arange(cz, dtype=jnp.int32), z.shape)
            lo = t.offset[idx]
            clamped = jnp.clip(sym, lo, lo + t.max_symbol[idx])
            z_hat = clamped.astype(jnp.float32) + med
            return sym, idx, z_hat

        return jax.jit(fn)

    @functools.cached_property
    def _J_hyper_dec(self):
        """SHARED: z_hat -> (latent_means, latent_scales)."""

        def fn(pm, ps, z_hat):
            return (
                self._h_s.apply({"params": pm}, z_hat),
                self._h_s.apply({"params": ps}, z_hat),
            )

        return jax.jit(fn)

    @functools.cached_property
    def _J_base_params(self):
        """SHARED per support-count: (mu, scale, indexes, mean_support)."""
        d0 = self.cfg.division_channel
        t = self.device_tables
        table = self._scale_table

        def fn(pmean, pscale, lm, ls, support):
            ms = jnp.concatenate([lm[..., :d0]] + list(support), axis=-1)
            ss = jnp.concatenate([ls[..., :d0]] + list(support), axis=-1)
            mu = self._cs5.apply({"params": pmean}, ms)
            scale = self._cs5.apply({"params": pscale}, ss)
            from progressivecodec_tpu.entropy.gaussian import build_indexes

            idx = build_indexes(scale, table, 0.11)
            return mu, scale, idx, ms

        return jax.jit(fn)

    @functools.cached_property
    def _J_quant(self):
        """Elementwise: y, mu, idx -> (raw symbols, clamped values)."""
        t = self.device_tables
        g0 = self.gauss_row0

        def fn(y, mu, idx):
            sym = jnp.round((y - mu).astype(jnp.float32)).astype(jnp.int32)
            rows = idx + g0
            lo = t.offset[rows]
            vals = jnp.clip(sym, lo, lo + t.max_symbol[rows])
            return sym, vals

        return jax.jit(fn)

    @functools.cached_property
    def _J_base_recon(self):
        """SHARED: decoded values -> reconstructed slice (with LRP)."""

        def fn(plrp, ms, mu, vals):
            y0 = vals.astype(jnp.float32) + mu
            lrp_in = jnp.concatenate([ms, y0], axis=-1)
            return y0 + 0.5 * jnp.tanh(self._cs5.apply({"params": plrp}, lrp_in))

        return jax.jit(fn)

    def _J_prog_params(self, quality: float, mask_pol: str):
        """SHARED: stacked prog (mu, scale, mask, indexes, mean_support)."""
        cfg = self.cfg
        d0 = cfg.division_channel
        t = self.device_tables
        table = self._scale_table
        S = cfg.num_prog_slices

        def fn(pmean, pscale, lm, ls, base_stack):
            lm_t = jnp.broadcast_to(
                lm[None, ..., d0:], (S,) + lm.shape[:-1] + (lm.shape[-1] - d0,)
            )
            ls_t = jnp.broadcast_to(
                ls[None, ..., d0:], (S,) + ls.shape[:-1] + (ls.shape[-1] - d0,)
            )
            ms = jnp.concatenate([lm_t, base_stack], axis=-1)
            ss = jnp.concatenate([ls_t, base_stack], axis=-1)
            mu = self._stacked_cs5.apply({"params": pmean}, ms)
            scale = self._stacked_cs5.apply({"params": pscale}, ss)
            mask = stacked_channel_mask(
                scale, pr=quality, mask_pol=mask_pol,
                dim_chunk=cfg.dim_chunk, division_channel=d0,
            )
            keep = jnp.round(mask) > 0.5
            from progressivecodec_tpu.entropy.gaussian import build_indexes

            idx = build_indexes(scale, table, 0.11)
            return mu, scale, mask, keep, idx, ms

        key = (quality, mask_pol)
        cache = self.__dict__.setdefault("_prog_params_cache", {})
        if key not in cache:
            cache[key] = jax.jit(fn)
        return cache[key]

    @functools.cached_property
    def _J_prog_quant(self):
        t = self.device_tables
        g0 = self.gauss_row0

        def fn(y_prog, mu, mask, idx):
            sym = jnp.round(((y_prog - mu) * mask).astype(jnp.float32)).astype(jnp.int32)
            rows = idx + g0
            lo = t.offset[rows]
            vals = jnp.clip(sym, lo, lo + t.max_symbol[rows])
            return sym, vals

        return jax.jit(fn)

    @functools.cached_property
    def _J_prog_recon(self):
        rbl = self.cfg.residual_before_lrp

        def fn(plrp, ms, mu, vals, keep, base_stack):
            y0 = jnp.where(keep, vals.astype(jnp.float32), 0.0) + mu
            if rbl:
                y0 = y0 + base_stack
            lrp_in = jnp.concatenate([ms, y0], axis=-1)
            y0 = y0 + 0.5 * jnp.tanh(self._stacked_cs5.apply({"params": plrp}, lrp_in))
            if not rbl:
                y0 = y0 + base_stack
            return y0

        return jax.jit(fn)

    @functools.cached_property
    def _J_encode(self):
        t = self.device_tables
        lanes = self.lanes

        def fn(stages):
            return rans_device.encode_stages(stages, t, lanes)

        return jax.jit(fn)

    @functools.cached_property
    def _J_dec_init(self):
        lanes = self.lanes

        def fn(stream):
            head = stream[: 2 * lanes].astype(jnp.uint32)
            return head[0::2] | (head[1::2] << 16), jnp.int32(2 * lanes)

        return jax.jit(fn)

    @functools.cached_property
    def _J_decode_stage(self):
        t = self.device_tables
        lanes = self.lanes

        def fn(states, offset, stream, indexes, keep):
            dec = DecoderState(states, offset)
            dec, vals = rans_device.decode_stage(dec, stream, indexes, keep, t, lanes)
            return dec.states, dec.offset, vals

        return jax.jit(fn)

    @functools.cached_property
    def _J_synth(self):
        dt = self.transform_dtype

        def fn(p, y_hat, which):
            if dt is not None:
                y_hat = y_hat.astype(dt)
            x = self._g_s.apply({"params": p}, y_hat).astype(jnp.float32)
            return jnp.clip(x, 0.0, 1.0)

        return jax.jit(fn, static_argnames=("which",))

    # ---------- public API ----------

    def compress(self, x, quality: float = 0.0, mask_pol: str | None = None,
                 simulate: bool = False, to_host: bool = True):
        self.update()
        y = self._J_analyze(self._pt["g_a0"], self._pt["g_a1"], x)
        return self.compress_from_latent(
            y, x.shape, quality=quality, mask_pol=mask_pol,
            simulate=simulate, to_host=to_host,
        )

    def compress_from_latent(self, y, x_shape, quality: float = 0.0,
                             mask_pol: str | None = None, simulate: bool = False,
                             to_host: bool = True):
        """Encode from a precomputed latent (e.g. tiled_analyze output)."""
        cfg = self.cfg
        p = self.p
        mask_pol = mask_pol or cfg.mask_policy
        self.update()

        z = self._J_hyper_enc(p["h_a"], y)
        med = self._tables_medians()
        z_sym, z_idx, z_hat = self._J_zquant(z, med)
        lm, ls = self._J_hyper_dec(p["h_mean_s"], p["h_scale_s"], z_hat)

        y_slices = jnp.split(y, cfg.ns1, axis=-1)
        stages = [(z_sym.reshape(-1), z_idx.reshape(-1), self._ones(z_sym.size))]
        y_hat_base = []
        for i in range(cfg.ns0):
            support = tuple(y_hat_base[: min(i, cfg.max_support_slices)])
            mu, scale, idx, ms = self._J_base_params(
                p["cc_mean"][f"s{i}"], p["cc_scale"][f"s{i}"], lm, ls, support
            )
            sym, vals = self._J_quant(y_slices[i], mu, idx)
            stages.append(
                (sym.reshape(-1), (idx + self.gauss_row0).reshape(-1), self._ones(sym.size))
            )
            y_hat_base.append(self._J_base_recon(p["lrp"][f"s{i}"], ms, mu, vals))

        if quality > 0:
            base_stack = jnp.stack(y_hat_base, axis=0)
            y_prog = self._stack_y_prog(y_slices)
            mu_st, scale_st, mask, keep, idx, ms = self._J_prog_params(
                float(quality), mask_pol
            )(p["cc_mean_prog"], p["cc_scale_prog"], lm, ls, base_stack)
            sym, vals = self._J_prog_quant(y_prog, mu_st, mask, idx)
            stages.append(
                (sym.reshape(-1), (idx + self.gauss_row0).reshape(-1), keep.reshape(-1))
            )
            if simulate:
                y_hat_st = self._J_prog_recon(
                    p["lrp_prog"], ms, mu_st, vals, keep, base_stack
                )

        stream, n_words = self._J_encode(stages)
        hz, wz = z.shape[1], z.shape[2]
        if to_host:
            n_words = int(n_words)
            result = {
                "stream": np.asarray(stream[:n_words]),
                "z_shape": (hz, wz),
                "batch": int(x_shape[0]),
                "quality": float(quality),
                "mask_pol": mask_pol,
                "num_bytes": 2 * n_words,
            }
        else:
            # device-resident container: no host sync — lets a caller
            # pipeline many images' encode+decode as pure async dispatch
            result = {
                "stream_dev": stream,
                "n_words_dev": n_words,
                "z_shape": (hz, wz),
                "batch": int(x_shape[0]),
                "quality": float(quality),
                "mask_pol": mask_pol,
            }
        if simulate:
            if quality > 0:
                y_hat = self._unstack(y_hat_st)
                result["x_hat"] = self._J_synth(self._pt["g_s1"], y_hat, 1)
            else:
                y_hat = jnp.concatenate(y_hat_base, axis=-1)
                result["x_hat"] = self._J_synth(self._pt["g_s0"], y_hat, 0)
        return result

    def decompress(self, data: dict) -> dict:
        out = self.decompress_to_latent(data)
        which = 0 if float(data["quality"]) == 0 else 1
        x_hat = self._J_synth(self._pt[f"g_s{which}"], out["y_hat"], which)
        return {"x_hat": x_hat, "stream_ok": out["stream_ok"]}

    def decompress_to_latent(self, data: dict) -> dict:
        """Entropy decode + slice reconstruction, stopping before g_s
        (lets tiled/sharded synthesis consume the latent)."""
        cfg = self.cfg
        p = self.p
        self.update()
        quality = float(data["quality"])
        mask_pol = data["mask_pol"] or cfg.mask_policy
        batch = data["batch"]
        hz, wz = data["z_shape"]
        if "stream_dev" in data:
            stream = data["stream_dev"]
        else:
            cap = _stream_capacity(batch, (hz, wz), cfg, self.lanes)
            stream = jnp.zeros((cap,), jnp.uint16).at[: len(data["stream"])].set(
                jnp.asarray(data["stream"])
            )

        states, offset = self._J_dec_init(stream)

        z_idx = jnp.broadcast_to(
            jnp.arange(cfg.N, dtype=jnp.int32), (batch, hz, wz, cfg.N)
        )
        states, offset, z_vals = self._J_decode_stage(
            states, offset, stream, z_idx.reshape(-1), self._ones(z_idx.size)
        )
        med = self._tables_medians()
        z_hat = z_vals.reshape(batch, hz, wz, cfg.N).astype(jnp.float32) + med
        lm, ls = self._J_hyper_dec(p["h_mean_s"], p["h_scale_s"], z_hat)

        y_hat_base = []
        for i in range(cfg.ns0):
            support = tuple(y_hat_base[: min(i, cfg.max_support_slices)])
            mu, scale, idx, ms = self._J_base_params(
                p["cc_mean"][f"s{i}"], p["cc_scale"][f"s{i}"], lm, ls, support
            )
            states, offset, vals = self._J_decode_stage(
                states, offset, stream,
                (idx + self.gauss_row0).reshape(-1), self._ones(idx.size),
            )
            y_hat_base.append(
                self._J_base_recon(p["lrp"][f"s{i}"], ms, mu, vals.reshape(mu.shape))
            )

        if quality == 0:
            y_hat = jnp.concatenate(y_hat_base, axis=-1)
            ok = (states == jnp.uint32(1 << 16)).all()
            return {"y_hat": y_hat, "stream_ok": ok}

        base_stack = jnp.stack(y_hat_base, axis=0)
        mu_st, scale_st, mask, keep, idx, ms = self._J_prog_params(quality, mask_pol)(
            p["cc_mean_prog"], p["cc_scale_prog"], lm, ls, base_stack
        )
        states, offset, vals = self._J_decode_stage(
            states, offset, stream,
            (idx + self.gauss_row0).reshape(-1), keep.reshape(-1),
        )
        y_hat_st = self._J_prog_recon(
            p["lrp_prog"], ms, mu_st, vals.reshape(mu_st.shape), keep, base_stack
        )
        ok = (states == jnp.uint32(1 << 16)).all()
        return {"y_hat": self._unstack(y_hat_st), "stream_ok": ok}

    # ---------- helpers ----------

    def _stack_y_prog(self, y_slices):
        cfg = self.cfg
        parts = []
        for i in range(cfg.num_prog_slices):
            yy = y_slices[cfg.ns0 + i]
            if cfg.delta_encode:
                yy = yy - y_slices[i]
            parts.append(yy)
        return jnp.stack(parts, axis=0)

    @staticmethod
    def _unstack(x_stack):
        s_, b, h, w, dc = x_stack.shape
        return x_stack.transpose(1, 2, 3, 0, 4).reshape(b, h, w, s_ * dc)

    def _ones(self, n: int):
        if n not in self._ones_cache:
            self._ones_cache[n] = jnp.ones((n,), bool)
        return self._ones_cache[n]

    def _tables_medians(self):
        if self._med_dev is None:
            eb = self.variables["params"]["entropy_bottleneck"]
            self._med_dev = jnp.asarray(
                np.asarray(eb["quantiles"])[:, 0, 1].astype(np.float32)
            )
        return self._med_dev


def make_codec(model, variables, lanes: int = DEFAULT_LANES, precision: int = 16,
               transform_dtype=None):
    """GranularCodec when the model/config supports it, else the
    monolithic Codec (REM, unrolled variants, WACNN)."""
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN

    cfg = model.cfg
    if (
        type(model) is ChannelProgressiveWACNN
        and cfg.stack_prog
        and cfg.support_progressive_slices == 0
        and not cfg.all_scalable
        and cfg.joiner_policy == "res"
        and "learnable" not in cfg.mask_policy
        and not cfg.multiple_hyperprior
        and cfg.multiple_encoder
        and cfg.u_net_post == 0
    ):
        return GranularCodec(model, variables, lanes, precision, transform_dtype)
    import warnings

    import jax as _jax

    if _jax.default_backend() != "cpu":
        warnings.warn(
            "monolithic Codec on an accelerator: compress/decompress are "
            "separate XLA programs, so sigma/mask computation is not "
            "guaranteed bit-identical across them (observed desync on TPU "
            "at full scale). The granular codec covers the flagship config; "
            "REM/unrolled variants get granular treatment in a later round.",
            stacklevel=2,
        )
    return Codec(model, variables, lanes, precision)
