"""Codec orchestration: jitted compress/decompress entry points + container.

The reference drives the codec from Python per image per slice
(training/step.py:277-404); here each of compress/decompress is ONE jitted
device program (transforms + mask + rANS), specialized per
(image shape, quality).  The container adds a tiny host-side header so
streams are self-describing.
"""

from __future__ import annotations

import functools
import struct
import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.coder.rans_device import DeviceTables
from progressivecodec_tpu.coder.tables import merge_tables, DEFAULT_LANES
from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.entropy.bottleneck import build_bottleneck_tables
from progressivecodec_tpu.entropy.gaussian import build_gaussian_tables

MAGIC = b"PCT1"


class Codec:
    """Bundles model + params + coder tables; caches jitted paths.

    `update()` (reference: cnn.py:137-142, base.py:41) builds the CDF
    tables from the trained entropy-model params; they are recomputed —
    never checkpointed.
    """

    def __init__(self, model, variables, lanes: int = DEFAULT_LANES, precision: int = 16):
        self.model = model
        self.variables = variables
        self.cfg: ModelConfig = model.cfg
        self.lanes = lanes
        self.precision = precision
        self._tables = None
        self._device_tables = None
        self._gauss_row0 = None

    # -- update ---------------------------------------------------------
    def update(self, force: bool = False):
        if self._tables is not None and not force:
            return self._tables
        eb_params = self.variables["params"]["entropy_bottleneck"]
        bt = build_bottleneck_tables(eb_params, self.precision)
        gt = build_gaussian_tables(self.cfg.scale_table.values(), precision=self.precision)
        merged, starts = merge_tables(bt, gt)
        merged.inverse()  # build the decode table once
        self._tables = merged
        self._gauss_row0 = starts[1]
        self._device_tables = DeviceTables.from_tables(merged)
        return merged

    @property
    def device_tables(self) -> DeviceTables:
        if self._device_tables is None:
            self.update()
        return self._device_tables

    @property
    def gauss_row0(self) -> int:
        if self._gauss_row0 is None:
            self.update()
        return self._gauss_row0

    # -- jitted paths ---------------------------------------------------
    @functools.cached_property
    def _compress_jit(self):
        def fn(variables, x, t, quality, mask_pol, simulate):
            return self.model.apply(
                variables,
                x,
                quality,
                mask_pol,
                t,
                self.lanes,
                self.gauss_row0,
                simulate,
                method=type(self.model).compress,
            )

        return jax.jit(fn, static_argnames=("quality", "mask_pol", "simulate"))

    @functools.cached_property
    def _decompress_jit(self):
        def fn(variables, stream, t, z_hw, batch, quality, mask_pol):
            return self.model.apply(
                variables,
                stream,
                z_hw,
                batch,
                quality,
                mask_pol,
                t,
                self.lanes,
                self.gauss_row0,
                method=type(self.model).decompress,
            )

        return jax.jit(fn, static_argnames=("z_hw", "batch", "quality", "mask_pol"))

    @functools.cached_property
    def _forward_single_jit(self):
        def fn(variables, x, quality, mask_pol):
            return self.model.apply(
                variables, x, quality, mask_pol, training=False,
                method=type(self.model).forward_single_quality,
            )

        return jax.jit(fn, static_argnames=("quality", "mask_pol"))

    # -- public API -----------------------------------------------------
    def compress(
        self, x, quality: float = 0.0, mask_pol: str | None = None, simulate: bool = False
    ) -> dict:
        """x: (B,H,W,3) in [0,1], H,W divisible by 64 -> container dict."""
        out = self._compress_jit(
            self.variables, x, self.device_tables, float(quality), mask_pol, simulate
        )
        n_words = int(out["n_words"])
        result = {
            "stream": np.asarray(out["stream"][:n_words]),
            "z_shape": tuple(int(v) for v in out["z_shape"]),
            "batch": int(x.shape[0]),
            "quality": float(quality),
            "mask_pol": mask_pol,
            "num_bytes": 2 * n_words,
        }
        if simulate:
            result["x_hat"] = out["x_hat"]
        return result

    def decompress(self, data: dict) -> dict:
        cap = _stream_capacity(data["batch"], data["z_shape"], self.cfg, self.lanes)
        stream = jnp.zeros((cap,), jnp.uint16).at[: len(data["stream"])].set(
            jnp.asarray(data["stream"])
        )
        out = self._decompress_jit(
            self.variables,
            stream,
            self.device_tables,
            data["z_shape"],
            data["batch"],
            float(data["quality"]),
            data["mask_pol"],
        )
        return out

    def forward_single_quality(self, x, quality: float, mask_pol: str | None = None):
        return self._forward_single_jit(self.variables, x, float(quality), mask_pol)

    # -- serialization --------------------------------------------------
    def serialize(self, data: dict) -> bytes:
        """Container: magic | quality f32 | batch u16 | z_h u16 | z_w u16 |
        lanes u16 | mask_pol len+utf8 | n_words u32 | words."""
        mp = (data["mask_pol"] or self.cfg.mask_policy).encode()
        head = MAGIC + struct.pack(
            "<fHHHHB", data["quality"], data["batch"], *data["z_shape"],
            self.lanes, len(mp),
        )
        words = np.asarray(data["stream"], dtype="<u2").tobytes()
        return head + mp + struct.pack("<I", len(data["stream"])) + words

    def deserialize(self, blob: bytes) -> dict:
        assert blob[:4] == MAGIC, "bad container magic"
        quality, batch, zh, zw, lanes, mlen = struct.unpack("<fHHHHB", blob[4:17])
        if lanes != self.lanes:
            raise ValueError(
                f"container coded with {lanes} lanes; codec configured for {self.lanes}"
            )
        mp = blob[17 : 17 + mlen].decode()
        (n_words,) = struct.unpack("<I", blob[17 + mlen : 21 + mlen])
        words = np.frombuffer(blob[21 + mlen : 21 + mlen + 2 * n_words], dtype="<u2")
        return {
            "stream": words,
            "z_shape": (zh, zw),
            "batch": batch,
            "quality": quality,
            "mask_pol": mp,
        }


def _stream_capacity(batch: int, z_shape: tuple, cfg: ModelConfig, lanes: int) -> int:
    """Upper bound on words: header + one word per (padded) symbol."""
    hz, wz = z_shape
    hy, wy = hz * 4, wz * 4
    n_z = batch * hz * wz * cfg.N
    n_slices = cfg.M // cfg.dim_chunk
    padded = 0
    for n in [n_z] + [batch * hy * wy * cfg.dim_chunk] * n_slices:
        padded += -(-n // lanes) * lanes
    return 2 * lanes + padded
