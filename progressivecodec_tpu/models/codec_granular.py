"""Granular codec: shared-executable compress/decompress orchestration.

WHY THIS EXISTS (SURVEY.md §7 hard part #2): the decoder re-derives the
per-element CDF index and the variance mask from sigma, so sigma must be
BIT-IDENTICAL between the encode and decode paths.  Two different
monolithic jit programs do not guarantee that — XLA may fuse the
parameter-prediction convs differently in each, and float reductions
reassociate (observed as stream desync on real TPU hardware at full model
scale).  The reference gets this for free by running the same eager torch
kernels on both sides (CHProg_cnn.py:960-968).

The TPU-native equivalent: the codec jits small *model-method fragments*
(progressive.py codec_* methods) and routes BOTH paths through the SAME
compiled executable for every computation whose output feeds an index or
mask decision (hyper synthesis, cc transforms, refinement hooks, LRP, the
mask quantile).  Elementwise glue (round/clamp/add) is deterministic
regardless of program context.  As a bonus, cold compiles drop from two
monolithic graphs to ~20 small ones, most shared across slices.

Covers the whole ChannelProgressiveWACNN family including the REM
("rate") variant and all unrolled configurations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.coder import rans_device
from progressivecodec_tpu.coder.rans_device import DecoderState
from progressivecodec_tpu.coder.tables import DEFAULT_LANES
from progressivecodec_tpu.models.codec import Codec, _stream_capacity


class GranularCodec(Codec):
    """Codec with per-stage shared executables for the progressive family."""

    def __init__(self, model, variables, lanes: int = DEFAULT_LANES, precision: int = 16,
                 groups: int = 1, coder_mesh=None, coder_axis: str = "model",
                 lane_policy: str = "fixed", host_params=None,
                 scan_impl: str = "xla"):
        """groups > 1 selects the PCT1-G grouped wire format (G independent
        lane-group sub-streams, coder/rans_device.py).  With coder_mesh set,
        the G scans run one-per-device via shard_map
        (parallel/sharded_coder.py) — byte-identical to the fused
        single-device grouped path, so streams are topology-independent.

        lane_policy: "fixed" uses `lanes` for every stream; "auto" scales
        the lane count with the estimated coded-symbol volume (computed
        from container metadata only, so any decoder reproduces it) and
        records the choice in the container — the 2*lanes*4-byte lane-state
        header then stays a small fraction of low-rate streams (VERDICT
        round-2 weak #8) while high-rate streams keep full lane width.
        With groups > 1 the auto choice is rounded up to a multiple of
        the group count, so grouped/sharded low-rate streams get the same
        header savings (VERDICT round-3 next #9)."""
        super().__init__(model, variables, lanes, precision, host_params=host_params)
        from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN

        self._progressive = isinstance(model, ChannelProgressiveWACNN)
        cfg = model.cfg
        self._n_base = cfg.ns0 if self._progressive else cfg.M // cfg.dim_chunk
        self._n_split = cfg.ns1 if self._progressive else cfg.M // cfg.dim_chunk
        self.p = variables["params"]
        self._jits: dict = {}
        self._ones_cache: dict = {}
        self._med_dev = None
        self._scale_table = jnp.asarray(
            model.cfg.scale_table.values().astype(np.float32)
        )
        if coder_mesh is not None and groups == 1:
            groups = coder_mesh.shape[coder_axis]
        assert lanes % max(groups, 1) == 0
        self.groups = max(groups, 1)
        self.coder_mesh = coder_mesh
        self.coder_axis = coder_axis
        assert lane_policy in ("fixed", "auto")
        self.lane_policy = lane_policy
        # encode-scan implementation: "xla" (lax.scan — portable default)
        # or "pallas" (coder/rans_pallas.py — lane states resident in VMEM
        # across the whole stream; bit-identical, 2.5x faster on TPU in
        # the degraded-dispatch regime, parity in the clean regime).
        # Wire-format-neutral: both produce identical streams.
        assert scan_impl in ("xla", "pallas")
        self.scan_impl = scan_impl

    # ---------- lane policy ----------

    def _estimate_symbols(self, batch: int, z_shape, quality: float) -> int:
        """Coded-symbol estimate from container metadata ONLY (batch,
        z-spatial, quality) — encoder and decoder agree by construction.
        The masked enhancement fraction is quality/10, exact for
        point-based-std (the quantile keeps exactly that fraction) and a
        fine lane heuristic for every other policy."""
        cfg = self.cfg
        hz, wz = z_shape
        hy, wy = hz * 4, wz * 4
        n_z = batch * hz * wz * cfg.N
        n_base = batch * hy * wy * cfg.division_channel
        if self._progressive and quality > 0:
            frac = min(quality, 10.0) / 10.0
            n_prog = int(batch * hy * wy * cfg.delta_dim * frac)
        else:
            n_prog = 0
        return n_z + n_base + n_prog

    def _lanes_for_stream(self, batch: int, z_shape, quality: float) -> int:
        if self.lane_policy != "auto":
            return self.lanes
        est = self._estimate_symbols(batch, z_shape, quality)
        # ~4096 symbols/lane keeps the header <= ~4% of a trained q=0
        # Kodak stream while saturating lanes at high rates
        lanes = 1 << max(int(est // 4096).bit_length() - 1, 0)
        lanes = max(64, min(lanes, self.lanes))
        if self.groups > 1:
            # PCT1-G needs lanes % groups == 0 (each group owns K/G lanes)
            lanes = -(-lanes // self.groups) * self.groups
        return lanes

    # ---------- jitted model-method fragments ----------

    # top-level param modules each fragment needs — passing a filtered
    # subtree keeps the per-dispatch pytree small (the full tree has
    # hundreds of leaves and every call would flatten it on the host)
    _FRAGMENT_MODULES = {
        "analyze": ("g_a", "g_a0", "g_a1"),
        "codec_hyper_enc": ("h_a",),
        "codec_hyper_dec": ("h_mean_s", "h_scale_s", "h_mean_s0", "h_mean_s1",
                            "h_scale_s0", "h_scale_s1"),
        "codec_base_params": ("cc_mean", "cc_scale"),
        "codec_base_recon": ("lrp",),
        "codec_base_step": ("cc_mean", "cc_scale", "lrp"),
        "codec_prog_stacked": ("cc_mean_prog", "cc_scale_prog"),
        "codec_prog_recon_stacked": ("lrp_prog",),
        "codec_synth": ("g_s0", "g_s1", "g_s", "refine", "refine0", "refine1"),
    }

    def _fragment_vars(self, name: str):
        cache = self.__dict__.setdefault("_frag_vars", {})
        if name not in cache:
            prefixes = self._FRAGMENT_MODULES.get(name)
            if prefixes is None:
                cache[name] = self.variables
            else:
                cache[name] = {
                    "params": {
                        k: v for k, v in self.p.items() if k.startswith(prefixes)
                    }
                }
        return cache[name]

    def _call(self, name: str, statics: tuple, *args):
        """Apply model method `name` with leading static args, jitted once
        per (name, statics, arg-structure) — both codec paths reuse it."""
        key = (name,) + tuple(statics)
        if key not in self._jits:
            model = self.model
            meth = getattr(type(model), name)

            def fn(variables, *a, _meth=meth, _st=tuple(statics)):
                return model.apply(variables, *_st, *a, method=_meth)

            self._jits[key] = jax.jit(fn)
        return self._jits[key](self._fragment_vars(name), *args)

    # ---------- coder + glue executables ----------

    @functools.cached_property
    def _J_zquant(self):
        # with the escape extension the coder is lossless, so the encoder's
        # reconstruction is simply the quantized symbol (no clamping);
        # outputs are stage-ready (flattened sym/idx) so no eager
        # reshape/broadcast dispatches follow
        def fn(z, med):
            sym = jnp.round(z.astype(jnp.float32) - med).astype(jnp.int32)
            cz = z.shape[-1]
            idx = jnp.broadcast_to(jnp.arange(cz, dtype=jnp.int32), z.shape)
            z_hat = sym.astype(jnp.float32) + med
            return sym.reshape(-1), idx.reshape(-1), z_hat

        return jax.jit(fn)

    @functools.cached_property
    def _J_quant_slice(self):
        """One executable for ALL base slices: takes the full latent and a
        traced channel offset (lax.dynamic_slice), quantizes against mu and
        returns the stage-ready flattened (symbols, cdf rows).  Replaces
        the eager jnp.split + per-slice elementwise quant + idx/reshape
        glue (~4 dispatches per slice at flagship width)."""
        row0 = self.gauss_row0

        def fn(y, lo, mu, idx):
            dc = mu.shape[-1]
            ys = jax.lax.dynamic_slice_in_dim(y, lo, dc, axis=3)
            sym = jnp.round((ys - mu).astype(jnp.float32)).astype(jnp.int32)
            return sym.reshape(-1), (idx + row0).reshape(-1)

        return jax.jit(fn)

    @functools.cached_property
    def _J_quant_masked_stacked(self):
        """Stacked-prog quant: builds the (slices, b, h, w, dc) progressive
        stack (delta-encoded against the base half when configured) inside
        the executable, then quantizes under the mask.  Folds the former
        _stack_y_prog (stack + per-slice subtract) and all stage-glue
        reshapes into one dispatch."""
        cfg = self.cfg
        row0 = self.gauss_row0
        ns0, n_prog, delta = cfg.ns0, cfg.num_prog_slices, cfg.delta_encode

        def fn(y, mu, mask, keep, idx):
            dc = mu.shape[-1]
            b, h, w, _ = y.shape
            y5 = y.reshape(b, h, w, -1, dc)
            prog = y5[..., ns0 : ns0 + n_prog, :]
            if delta:
                prog = prog - y5[..., :n_prog, :]
            y_prog = jnp.moveaxis(prog, 3, 0)
            sym = jnp.round(((y_prog - mu) * mask).astype(jnp.float32)).astype(jnp.int32)
            return sym.reshape(-1), (idx + row0).reshape(-1), keep.reshape(-1)

        return jax.jit(fn)

    @functools.cached_property
    def _J_quant_prog_slice(self):
        """Unrolled-prog quant for one slice at traced channel offset lo
        (delta baked statically), stage-ready outputs."""
        cfg = self.cfg
        row0 = self.gauss_row0
        base0 = cfg.ns0 * cfg.dim_chunk if self._progressive else 0
        delta = bool(self._progressive and cfg.delta_encode)

        def fn(y, lo, mu, mask, keep, idx):
            dc = mu.shape[-1]
            ys = jax.lax.dynamic_slice_in_dim(y, base0 + lo, dc, axis=3)
            if delta:
                ys = ys - jax.lax.dynamic_slice_in_dim(y, lo, dc, axis=3)
            sym = jnp.round(((ys - mu) * mask).astype(jnp.float32)).astype(jnp.int32)
            return sym.reshape(-1), (idx + row0).reshape(-1), keep.reshape(-1)

        return jax.jit(fn)

    def _J_encode_for(self, lanes: int):
        """Three separate executables (prepare/scan/finalize): composing
        the flat phases with the scan in ONE program degrades both ~3x
        (XLA layout/fusion pathology; see rans_device.encode_stages NOTE).
        One triple per lane count (the auto lane policy varies lanes per
        stream).

        The CDF tables are passed as ARGUMENTS, never closed over: a
        gather from a jit-embedded constant runs ~500x slower on TPU than
        from an argument buffer (measured 19.3 ms vs 0.04 ms for 2M
        gathers from a 3.2 MB table — tools/probe logs, round 4)."""
        cache = self.__dict__.setdefault("_enc_cache", {})
        if lanes not in cache:
            prep = jax.jit(
                lambda t, stages: rans_device.encode_prepare(stages, t, lanes)
            )
            if self.scan_impl == "pallas":
                from progressivecodec_tpu.coder.rans_pallas import encode_scan_rev_pallas

                scan = lambda sf, kp: encode_scan_rev_pallas(sf, kp, lanes)
            else:
                scan = jax.jit(
                    lambda sf, kp: rans_device.encode_scan_rev(sf, kp, lanes)
                )
            fin = jax.jit(
                lambda st, w, f, ef, sym: rans_device.encode_finalize(
                    st, w, f, ef, sym, lanes
                )
            )

            def fn(stages):
                sf_rev, kp_rev, esc_flags, sym = prep(self.device_tables, stages)
                states, words_rev, flags_rev = scan(sf_rev, kp_rev)
                return fin(states, words_rev, flags_rev, esc_flags, sym)

            cache[lanes] = fn
        return cache[lanes]

    @functools.cached_property
    def _J_encode(self):
        return self._J_encode_for(self.lanes)

    def _J_encode_grouped_for(self, lanes: int):
        """Grouped encode executable per lane count (the auto lane policy
        varies lanes per stream; groups is fixed by the codec topology)."""
        cache = self.__dict__.setdefault("_enc_grouped_cache", {})
        if lanes not in cache:
            groups = self.groups
            if self.coder_mesh is not None:
                from progressivecodec_tpu.parallel.sharded_coder import (
                    sharded_encode_stages,
                )

                mesh, axis = self.coder_mesh, self.coder_axis

                def fn(stages):
                    return sharded_encode_stages(
                        stages, self.device_tables, lanes, mesh, axis
                    )

                cache[lanes] = fn  # shard_map path jits internally
            else:
                # tables as arguments, not closure constants (_J_encode_for)
                jfn = jax.jit(
                    lambda t, stages: rans_device.encode_stages_grouped(
                        stages, t, lanes, groups
                    )
                )
                cache[lanes] = lambda stages: jfn(self.device_tables, stages)
        return cache[lanes]

    def _J_decode_stage_grouped_for(self, lanes: int):
        cache = self.__dict__.setdefault("_dec_grouped_cache", {})
        if lanes not in cache:
            groups = self.groups
            if self.coder_mesh is not None:
                from progressivecodec_tpu.parallel.sharded_coder import (
                    sharded_decode_stage,
                )

                mesh, axis = self.coder_mesh, self.coder_axis

                def fn(states, offsets, esc_offsets, streams, escs, indexes, keep, off):
                    dec = rans_device.GroupedDecoderState(states, offsets, esc_offsets)
                    idx = (indexes + off).reshape(-1)
                    dec, vals = sharded_decode_stage(
                        dec, streams, escs, idx, keep.reshape(-1),
                        self.device_tables, lanes, mesh, axis
                    )
                    return dec.states, dec.offsets, dec.esc_offsets, vals

                cache[lanes] = fn
            else:
                # tables as arguments, not closure constants (_J_encode_for)
                def raw(t, states, offsets, esc_offsets, streams, escs, indexes,
                        keep, off):
                    dec = rans_device.GroupedDecoderState(states, offsets, esc_offsets)
                    dec, vals = rans_device.decode_stage_grouped(
                        dec, streams, escs, (indexes + off).reshape(-1),
                        keep.reshape(-1), t, lanes, groups
                    )
                    return dec.states, dec.offsets, dec.esc_offsets, vals

                jfn = jax.jit(raw)
                cache[lanes] = lambda *a: jfn(self.device_tables, *a)
        return cache[lanes]

    def _J_dec_init_for(self, lanes: int):
        cache = self.__dict__.setdefault("_dec_init_cache", {})
        if lanes not in cache:

            def fn(stream):
                head = stream[: 2 * lanes].astype(jnp.uint32)
                return head[0::2] | (head[1::2] << 16), jnp.int32(2 * lanes), jnp.int32(0)

            cache[lanes] = jax.jit(fn)
        return cache[lanes]

    def _J_decode_stage_for(self, lanes: int):
        """Split scan/flat executables (see _J_encode_for).  Takes SHAPED
        indexes/keep plus a traced cdf-row offset; the offset-add and
        flatten are folded into the pad/values executables so the caller
        issues no eager glue dispatches per stage."""
        cache = self.__dict__.setdefault("_dec_cache", {})
        if lanes not in cache:
            pad = jax.jit(
                lambda idx, kp, off: (
                    rans_device._pad_to_grid(
                        (idx + off).reshape(-1).astype(jnp.int32), lanes
                    ),
                    rans_device._pad_to_grid(kp.reshape(-1).astype(bool), lanes),
                )
            )
            # tables are arguments, not closure constants (see _J_encode_for)
            scan = jax.jit(
                lambda t, st, off, stream, ig, kg: rans_device.decode_stage_scan(
                    DecoderState(st, off, jnp.int32(0)), stream, ig, kg, t, lanes
                )
            )
            values = jax.jit(
                lambda t, eo, cums, esc, idx, kp, off: rans_device.decode_stage_values(
                    eo, cums, esc, (idx + off).reshape(-1),
                    kp.reshape(-1), t, lanes
                )
            )

            def fn(states, offset, esc_offset, stream, esc, indexes, keep, row_off):
                t = self.device_tables
                ig, kg = pad(indexes, keep, row_off)
                states, offset, cums = scan(t, states, offset, stream, ig, kg)
                esc_offset, vals = values(
                    t, esc_offset, cums, esc, indexes, keep, row_off
                )
                return states, offset, esc_offset, vals

            cache[lanes] = fn
        return cache[lanes]

    # ---------- helpers ----------

    def _ones(self, n: int):
        if n not in self._ones_cache:
            self._ones_cache[n] = jnp.ones((n,), bool)
        return self._ones_cache[n]

    def _medians(self):
        if self._med_dev is None:
            if self.host_params is not None:
                eb = self.host_params["params"]["entropy_bottleneck"]
            else:
                eb = self.variables["params"]["entropy_bottleneck"]
            self._med_dev = jnp.asarray(
                np.asarray(eb["quantiles"])[:, 0, 1].astype(np.float32)
            )
        return self._med_dev

    @staticmethod
    def _unstack(x_stack):
        s_, b, h, w, dc = x_stack.shape
        return x_stack.transpose(1, 2, 3, 0, 4).reshape(b, h, w, s_ * dc)

    def _stacked(self) -> bool:
        return self._progressive and self.model._use_stacked_prog()

    def _zidx(self, batch: int, hz: int, wz: int):
        """Decoder z-stage cdf rows, cached per shape (constant)."""
        cache = self.__dict__.setdefault("_zidx_cache", {})
        key = (batch, hz, wz)
        if key not in cache:
            cache[key] = jnp.broadcast_to(
                jnp.arange(self.cfg.N, dtype=jnp.int32), (batch, hz, wz, self.cfg.N)
            )
        return cache[key]

    # ---------- shared base pipeline ----------

    def _base_loop(self, lm, ls, vals_fn):
        """Run the ChARM base slices; vals_fn(i, mu, idx) supplies FLAT
        integer values (encoder: quantized; decoder: entropy-decoded).
        Uses the fused codec_base_step fragment (recon i-1 + params i in
        one dispatch) for every interior slice."""
        cfg = self.cfg
        max_sup = cfg.max_support_slices
        y_hat_base, mu_list, std_list = [], [], []
        mu, scale, idx, ms = self._call(
            "codec_base_params", (0,), lm, ls, (), self._scale_table
        )
        for i in range(self._n_base):
            mu_list.append(mu)
            std_list.append(scale)
            vals = vals_fn(i, mu, idx)
            if i + 1 < self._n_base:
                j = i + 1
                sup_needed = min(j, max_sup)
                include_prev = sup_needed > i
                support = tuple(
                    y_hat_base[: sup_needed - 1] if include_prev
                    else y_hat_base[:sup_needed]
                )
                y_prev, mu, scale, idx, ms_next = self._call(
                    "codec_base_step", (j, include_prev), lm, ls, support,
                    self._scale_table, ms, mu_list[i], vals,
                )
                y_hat_base.append(y_prev)
                ms = ms_next
            else:
                y_hat_base.append(
                    self._call("codec_base_recon", (i,), ms, mu_list[i], vals)
                )
        return y_hat_base, mu_list, std_list

    # ---------- public API ----------

    def compress(self, x, quality: float = 0.0, mask_pol: str | None = None,
                 simulate: bool = False, to_host: bool = True, checkpoint_rep=None,
                 cust_map=None):
        self.update()
        y = self._call("analyze", (), x)
        return self.compress_from_latent(
            y, x.shape, quality=quality, mask_pol=mask_pol,
            simulate=simulate, to_host=to_host, checkpoint_rep=checkpoint_rep,
            cust_map=cust_map,
        )

    def compress_from_latent(self, y, x_shape, quality: float = 0.0,
                             mask_pol: str | None = None, simulate: bool = False,
                             to_host: bool = True, checkpoint_rep=None,
                             cust_map=None):
        """Encode from a precomputed latent (e.g. tiled_analyze output)."""
        cfg = self.cfg
        mask_pol = mask_pol or cfg.mask_policy
        self.update()

        z = self._call("codec_hyper_enc", (), y)
        z_sym_flat, z_idx_flat, z_hat = self._J_zquant(z, self._medians())
        lm, ls = self._call("codec_hyper_dec", (), z_hat)

        dc_slice = y.shape[-1] // self._n_split
        stages = [(z_sym_flat, z_idx_flat, self._ones(z_sym_flat.size))]

        def enc_vals(i, mu, idx):
            sym_flat, idx_flat = self._J_quant_slice(y, np.int32(i * dc_slice), mu, idx)
            stages.append((sym_flat, idx_flat, self._ones(sym_flat.size)))
            return sym_flat

        y_hat_base, mu_list, std_list = self._base_loop(lm, ls, enc_vals)

        y_hat_prog_cat = None
        if quality > 0 and self._progressive:
            if self._stacked():
                mu_st, scale_st, mask, keep, idx, ms, base_stack = self._call(
                    "codec_prog_stacked", (float(quality), mask_pol),
                    lm, ls, tuple(y_hat_base), self._scale_table, cust_map,
                )
                sym_flat, idx_flat, keep_flat = self._J_quant_masked_stacked(
                    y, mu_st, mask, keep, idx
                )
                stages.append((sym_flat, idx_flat, keep_flat))
                if simulate:
                    y_hat_st = self._call(
                        "codec_prog_recon_stacked", (), ms, mu_st, sym_flat, keep,
                        base_stack
                    )
                    y_hat_prog_cat = self._unstack(y_hat_st)
            else:
                prog_slices, mu_total, std_total = [], [], []
                for i in range(cfg.num_prog_slices):
                    cps = None
                    if checkpoint_rep is not None:
                        dc = cfg.dim_chunk
                        cps = checkpoint_rep[..., i * dc : (i + 1) * dc]
                    mu, scale, mut, mask, keep, idx, ms = self._call(
                        "codec_prog_params", (i, float(quality), mask_pol),
                        lm, ls, tuple(y_hat_base), tuple(mu_total), tuple(std_total),
                        tuple(prog_slices), mu_list[i], std_list[i], cps,
                        self._scale_table, self._map_slice(cust_map, i),
                    )
                    std_total.append(scale if cfg.support_std else mut)
                    mu_total.append(mut)
                    sym_flat, idx_flat, keep_flat = self._J_quant_prog_slice(
                        y, np.int32(i * dc_slice), mu, mask, keep, idx
                    )
                    stages.append((sym_flat, idx_flat, keep_flat))
                    prog_slices.append(
                        self._call(
                            "codec_prog_recon", (i,), ms, mu, sym_flat, keep,
                            y_hat_base[i]
                        )
                    )
                if simulate:
                    y_hat_prog_cat = jnp.concatenate(prog_slices, axis=-1)

        hz, wz = z.shape[1], z.shape[2]
        stream_lanes = self._lanes_for_stream(int(x_shape[0]), (hz, wz), float(quality))
        common = {
            "z_shape": (hz, wz),
            "batch": int(x_shape[0]),
            "quality": float(quality),
            "mask_pol": mask_pol,
            "lanes": stream_lanes,
        }
        if self.groups > 1:
            streams, n_words, escs, n_escs = self._J_encode_grouped_for(stream_lanes)(stages)
            common["groups"] = self.groups
            if to_host:
                nw = np.asarray(n_words)
                ne = np.asarray(n_escs)
                result = {
                    "streams": [
                        np.asarray(streams[g][: int(nw[g])]) for g in range(self.groups)
                    ],
                    "escs": [
                        np.asarray(escs[g][: 2 * int(ne[g])]) for g in range(self.groups)
                    ],
                    "num_bytes": 2 * (int(nw.sum()) + 2 * int(ne.sum())),
                    **common,
                }
            else:
                result = {
                    "streams_dev": streams, "n_words_dev": n_words,
                    "escs_dev": escs, "n_escs_dev": n_escs, **common,
                }
        else:
            stream, n_words, esc, n_esc = self._J_encode_for(stream_lanes)(stages)
            if to_host:
                n_words = int(n_words)
                n_esc = int(n_esc)
                result = {
                    "stream": np.asarray(stream[:n_words]),
                    "esc": np.asarray(esc[: 2 * n_esc]),
                    "num_bytes": 2 * (n_words + 2 * n_esc),
                    **common,
                }
            else:
                result = {
                    "stream_dev": stream, "n_words_dev": n_words,
                    "esc_dev": esc, "n_esc_dev": n_esc, **common,
                }
        if simulate:
            if quality > 0 and self._progressive:
                result["x_hat"] = self._call("codec_synth", (1,), y_hat_prog_cat)
                result["y_hat"] = y_hat_prog_cat
            else:
                y_hat_b = jnp.concatenate(y_hat_base, axis=-1)
                result["x_hat"] = self._call("codec_synth", (0,), y_hat_b)
                result["y_hat"] = y_hat_b
        return result

    def _map_slice(self, cust_map, i: int):
        if cust_map is None:
            return None
        dc = self.cfg.dim_chunk
        return cust_map[..., i * dc : (i + 1) * dc]

    def decompress(self, data: dict, cust_map=None, checkpoint_rep=None) -> dict:
        out = self.decompress_to_latent(
            data, cust_map=cust_map, checkpoint_rep=checkpoint_rep
        )
        which = 0 if (float(data["quality"]) == 0 or not self._progressive) else 1
        x_hat = self._call("codec_synth", (which,), out["y_hat"])
        return {"x_hat": x_hat, "stream_ok": out["stream_ok"], "y_hat": out["y_hat"]}

    def decompress_to_latent(self, data: dict, cust_map=None, checkpoint_rep=None) -> dict:
        """Entropy decode + slice reconstruction, stopping before g_s."""
        cfg = self.cfg
        self.update()
        quality = float(data["quality"])
        mask_pol = data["mask_pol"] or cfg.mask_policy
        batch = data["batch"]
        hz, wz = data["z_shape"]
        data_groups = int(data.get("groups", 1))
        if data_groups != self.groups:
            # a PCT container coded with a different group count would
            # otherwise decode garbage (only caught if the caller checks
            # stream_ok) or raise an opaque IndexError (ADVICE r4)
            raise ValueError(
                f"container has groups={data_groups} but this codec was "
                f"built with groups={self.groups}"
            )
        if self.groups > 1:
            g = self.groups
            stream_lanes = int(data.get("lanes", self.lanes))
            kt = stream_lanes // g
            if "streams_dev" in data:
                streams, escs = data["streams_dev"], data["escs_dev"]
            else:
                cap_g = (_stream_capacity(batch, (hz, wz), cfg, stream_lanes)
                         - 2 * stream_lanes) // g + 2 * kt
                streams = jnp.zeros((g, cap_g), jnp.uint16)
                escs = jnp.zeros((g, 2 * cap_g), jnp.uint16)
                for gi in range(g):
                    streams = streams.at[gi, : len(data["streams"][gi])].set(
                        jnp.asarray(data["streams"][gi])
                    )
                    escs = escs.at[gi, : len(data["escs"][gi])].set(
                        jnp.asarray(data["escs"][gi])
                    )
            gdec = rans_device.grouped_decoder_init(streams, stream_lanes, g)
            dec_state = {
                "states": gdec.states, "offsets": gdec.offsets,
                "esc_offsets": gdec.esc_offsets,
            }
            _dec_stage_grouped_fn = self._J_decode_stage_grouped_for(stream_lanes)

            def _dec_stage(indexes, keep, row_off):
                s, o, eo, vals = _dec_stage_grouped_fn(
                    dec_state["states"], dec_state["offsets"],
                    dec_state["esc_offsets"], streams, escs, indexes, keep, row_off,
                )
                dec_state["states"], dec_state["offsets"], dec_state["esc_offsets"] = s, o, eo
                return vals

        else:
            stream_lanes = int(data.get("lanes", self.lanes))
            if "stream_dev" in data:
                stream = data["stream_dev"]
                esc = data["esc_dev"]
            else:
                cap = _stream_capacity(batch, (hz, wz), cfg, stream_lanes)
                stream = jnp.zeros((cap,), jnp.uint16).at[: len(data["stream"])].set(
                    jnp.asarray(data["stream"])
                )
                esc_host = data.get("esc", np.zeros(0, np.uint16))
                esc = jnp.zeros((2 * cap,), jnp.uint16).at[: len(esc_host)].set(
                    jnp.asarray(esc_host)
                )

            states, offset, esc_offset = self._J_dec_init_for(stream_lanes)(stream)
            dec_state = {"states": states, "offset": offset, "esc_offset": esc_offset}
            _dec_stage_fn = self._J_decode_stage_for(stream_lanes)

            def _dec_stage(indexes, keep, row_off):
                s, o, eo, vals = _dec_stage_fn(
                    dec_state["states"], dec_state["offset"], dec_state["esc_offset"],
                    stream, esc, indexes, keep, row_off,
                )
                dec_state["states"], dec_state["offset"], dec_state["esc_offset"] = s, o, eo
                return vals

        z_idx = self._zidx(batch, hz, wz)
        z_vals = _dec_stage(z_idx, self._ones(z_idx.size), 0)
        z_hat = z_vals.reshape(batch, hz, wz, cfg.N).astype(jnp.float32) + self._medians()
        lm, ls = self._call("codec_hyper_dec", (), z_hat)

        row0 = self.gauss_row0

        def dec_vals(i, mu, idx):
            return _dec_stage(idx, self._ones(idx.size), row0)

        y_hat_base, mu_list, std_list = self._base_loop(lm, ls, dec_vals)

        if quality == 0 or not self._progressive:
            ok = (dec_state["states"] == jnp.uint32(1 << 16)).all()
            return {"y_hat": jnp.concatenate(y_hat_base, axis=-1), "stream_ok": ok}

        if self._stacked():
            mu_st, scale_st, mask, keep, idx, ms, base_stack = self._call(
                "codec_prog_stacked", (quality, mask_pol),
                lm, ls, tuple(y_hat_base), self._scale_table, cust_map,
            )
            vals = _dec_stage(idx, keep, self.gauss_row0)
            y_hat_st = self._call(
                "codec_prog_recon_stacked", (), ms, mu_st, vals, keep, base_stack
            )
            y_hat = self._unstack(y_hat_st)
        else:
            prog_slices, mu_total, std_total = [], [], []
            for i in range(cfg.num_prog_slices):
                cps = None
                if checkpoint_rep is not None:
                    dc = cfg.dim_chunk
                    cps = checkpoint_rep[..., i * dc : (i + 1) * dc]
                mu, scale, mut, mask, keep, idx, ms = self._call(
                    "codec_prog_params", (i, quality, mask_pol),
                    lm, ls, tuple(y_hat_base), tuple(mu_total), tuple(std_total),
                    tuple(prog_slices), mu_list[i], std_list[i], cps,
                    self._scale_table, self._map_slice(cust_map, i),
                )
                std_total.append(scale if cfg.support_std else mut)
                mu_total.append(mut)
                vals = _dec_stage(idx, keep, self.gauss_row0)
                prog_slices.append(
                    self._call(
                        "codec_prog_recon", (i,), ms, mu, vals, keep, y_hat_base[i]
                    )
                )
            y_hat = jnp.concatenate(prog_slices, axis=-1)

        ok = (dec_state["states"] == jnp.uint32(1 << 16)).all()
        return {"y_hat": y_hat, "stream_ok": ok}


def make_codec(model, variables, lanes: int = DEFAULT_LANES, precision: int = 16,
               host_params=None):
    """GranularCodec for every model family (progressive incl. REM and all
    unrolled variants, and the single-rate WACNN)."""
    return GranularCodec(model, variables, lanes, precision, host_params=host_params)
