"""Pallas TPU kernel for the PCT1 rANS encode scan.

WHY: the XLA `lax.scan` encode path (rans_device.encode_scan_rev) runs at
~25 Msym/s on TPU v5e — each scan step launches a tiny fused body over
one (K,) row, so the VPU is latency-bound on ~25 dependent vector ops
with per-step loop overhead on top.  This kernel runs the whole scan in
ONE Pallas program: lane states live in VMEM scratch across the entire
symbol stream, rows stream through a grid of blocks (TPU grids execute
sequentially, so scratch persists), and the per-row body is the same
exact u32 math — bit-identical words/flags/states by construction.

Layout: the K lanes are viewed as an (8, K//8) tile so every vector op
fills VPU sublanes (K=1024 maps exactly onto the native (8,128) vreg).
The reshape is pure relabeling — elementwise ops are layout-blind, and
the caller reshapes inputs/outputs symmetrically.

Semantics mirror rans_device.encode_scan_rev (reference semantics:
cpp_exts/rans/rans_interface.cpp:166-191 reverse-order flush, redesigned
for K interleaved 32-bit lanes with 16-bit renorm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from progressivecodec_tpu.coder.tables import RANS_L

_MASK16 = 0xFFFF  # python int: jnp scalars would be captured consts in the kernel

# rows per grid block: bounds VMEM block size (BP * K * 4B per operand)
_BLOCK_ROWS = 256


def _u32_to_f32(x):
    """Exact u32 -> f32 with round-to-nearest, Mosaic-safe.

    Mosaic has no direct u32->f32 convert.  Split into 16-bit limbs (both
    < 2^16, sign-safe through i32): hi*65536 is exactly representable in
    f32 for any hi < 2^16 (<= 16 significant bits), so the final add is
    ONE correctly-rounded operation — bit-identical to a direct cast."""
    hi = jax.lax.bitcast_convert_type(x >> 16, jnp.int32).astype(jnp.float32)
    lo = jax.lax.bitcast_convert_type(x & jnp.uint32(_MASK16), jnp.int32).astype(
        jnp.float32
    )
    return hi * 65536.0 + lo


def _f32_to_u32_small(x):
    """f32 -> u32 for values < 2^31 (quotients here are < 2^16)."""
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.uint32)


def _div_u32_by_u16(x, freq):
    """Exact divmod via two chained f32 divisions (rans_device.py:108),
    with Mosaic-safe limb conversions in place of direct u32<->f32 casts
    (same rounding, see _u32_to_f32)."""
    ff = _u32_to_f32(freq)
    hi = x >> 16
    q1 = _f32_to_u32_small(jnp.floor(_u32_to_f32(hi) / ff))
    r1 = hi - q1 * freq
    neg = r1 > jnp.uint32(0x7FFFFFFF)
    q1 = jnp.where(neg, q1 - 1, q1)
    r1 = jnp.where(neg, r1 + freq, r1)
    over = r1 >= freq
    q1 = jnp.where(over, q1 + 1, q1)
    r1 = jnp.where(over, r1 - freq, r1)
    y = (r1 << 16) | (x & jnp.uint32(_MASK16))
    q2 = _f32_to_u32_small(jnp.floor(_u32_to_f32(y) / ff))
    r2 = y - q2 * freq
    neg2 = r2 > jnp.uint32(0x7FFFFFFF)
    q2 = jnp.where(neg2, q2 - 1, q2)
    r2 = jnp.where(neg2, r2 + freq, r2)
    over2 = r2 >= freq
    q2 = jnp.where(over2, q2 + 1, q2)
    r2 = jnp.where(over2, r2 - freq, r2)
    return (q1 << 16) + q2, r2


def _encode_kernel(sf_ref, kp_ref, words_ref, flags_ref, states_out_ref, st):
    """One grid block of _BLOCK_ROWS scan rows.

    sf_ref/kp_ref: (BP, 8, K8) u32 VMEM blocks; words/flags out likewise;
    states_out_ref: (8, K8) u32; st: (8, K8) u32 VMEM scratch persisting
    across grid steps (sequential TPU grid).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        st[:] = jnp.full(st.shape, int(RANS_L), jnp.uint32)

    def row(r, states):
        sf = sf_ref[r]
        ki = kp_ref[r] != 0
        start = sf >> 16
        freq = jnp.where(ki, sf & jnp.uint32(_MASK16), jnp.uint32(1))
        x_max = freq << 16
        flag = ki & (states >= x_max)
        words_ref[r] = states & jnp.uint32(_MASK16)
        flags_ref[r] = flag.astype(jnp.uint32)
        x = jnp.where(flag, states >> 16, states)
        q, r_ = _div_u32_by_u16(x, freq)
        new_states = (q << 16) + r_ + start
        return jnp.where(ki, new_states, states)

    states = jax.lax.fori_loop(0, sf_ref.shape[0], row, st[:])
    st[:] = states
    states_out_ref[:] = states


@functools.partial(jax.jit, static_argnames=("lanes",))
def encode_scan_rev_pallas(sf_rev: jax.Array, kp_rev: jax.Array, lanes: int):
    """Drop-in replacement for rans_device.encode_scan_rev (same
    signature/outputs): (states (K,) u32, words (P, K) u16, flags (P, K)
    bool).  Requires lanes % 8 == 0; rows are padded to the block size
    with keep=False no-ops (state-preserving, never flagged)."""
    assert lanes % 8 == 0, "pallas encode scan needs lanes % 8 == 0"
    p = sf_rev.shape[0]
    k8 = lanes // 8
    bp = min(_BLOCK_ROWS, max(8, p))
    p_pad = -(-p // bp) * bp
    if p_pad != p:
        sf_rev = jnp.pad(sf_rev, ((0, p_pad - p), (0, 0)))
        kp_rev = jnp.pad(kp_rev, ((0, p_pad - p), (0, 0)))
    sf3 = sf_rev.reshape(p_pad, 8, k8)
    kp3 = kp_rev.astype(jnp.uint32).reshape(p_pad, 8, k8)

    grid = (p_pad // bp,)
    words3, flags3, states2 = pl.pallas_call(
        _encode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, 8, k8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8, k8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bp, 8, k8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8, k8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p_pad, 8, k8), jnp.uint32),
            jax.ShapeDtypeStruct((p_pad, 8, k8), jnp.uint32),
            jax.ShapeDtypeStruct((8, k8), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((8, k8), jnp.uint32)],
    )(sf3, kp3)

    words = words3.reshape(p_pad, lanes)[:p].astype(jnp.uint16)
    flags = flags3.reshape(p_pad, lanes)[:p].astype(bool)
    return states2.reshape(lanes), words, flags
