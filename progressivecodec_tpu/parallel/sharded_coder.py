"""Sharded entropy coding: PCT1-G lane groups distributed over a mesh.

VERDICT round-1 gap / SURVEY §7.7: the rANS scans are the dominant codec
phase (~60% of time) and previously ran on one device even under tiling.
The PCT1-G format (see coder/rans_device.py) splits the K lanes into G
independent sub-streams; here each mesh device runs the scan for its own
group via shard_map — byte-identical to the single-device grouped encoder
(tested), so the wire format is topology-independent.

Mechanics: the (P, K) stage grids are resharded to (G, P, K/G) with the
group axis on the mesh; each device executes coder/rans_device.encode_grids
(the same kernel the fused single-device path uses) on its block.  Decode
is stage-wise (later slice params depend on earlier decoded symbols); per
stage each device decodes its lane block from its own sub-stream and the
values are reassembled to global symbol order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from progressivecodec_tpu.coder import rans_device
from progressivecodec_tpu.coder.rans_device import DeviceTables


def _to_group_blocks(grid, groups: int):
    """(P, K) -> (G, P, K/G): group-blocked layout for sharding."""
    p, k = grid.shape
    kt = k // groups
    return grid.reshape(p, groups, kt).transpose(1, 0, 2)


def _tables_arrays(t: DeviceTables):
    """DeviceTables array leaves (lmax is a static int, threaded apart).

    Tables ride through jit/shard_map as ARGUMENTS, never closure
    constants — constant-embedded tables make TPU gathers ~500x slower
    (codec_granular._J_encode_for)."""
    return (t.enc_sf, t.dec_sf, t.dec_val, t.cdf_length, t.offset, t.max_symbol)


def _rebuild_tables(arrs, lmax: int) -> DeviceTables:
    enc_sf, dec_sf, dec_val, cdf_length, offset, max_symbol = arrs
    return DeviceTables(enc_sf, dec_sf, dec_val, lmax, cdf_length, offset, max_symbol)


def sharded_encode_stages(stages, t: DeviceTables, lanes: int, mesh: Mesh,
                          axis: str = "model"):
    """Encode with one lane group per mesh device.

    Returns (streams (G, cap), n_words (G,), escs (G, 2*cap), n_escs (G,))
    — the same PCT1-G results as rans_device.encode_stages_grouped, with
    the G scans executed concurrently across the mesh axis.
    """
    groups = mesh.shape[axis]
    assert lanes % groups == 0, f"lanes {lanes} not divisible by {groups} devices"
    kt = lanes // groups
    lmax = t.lmax

    def prep(ta, stages):
        tt = _rebuild_tables(ta, lmax)
        return rans_device._stage_grids(stages, tt, lanes)

    v, idx, kp, esc, sym = jax.jit(prep)(_tables_arrays(t), stages)
    blocks = [_to_group_blocks(g, groups) for g in (v, idx, kp, esc, sym)]

    def local(ta, vb, ib, kb, eb, sb):
        tt = _rebuild_tables(ta, lmax)
        stream, n_words, esc_seg, n_esc = rans_device.encode_grids(
            vb[0], ib[0], kb[0], eb[0], sb[0], tt, kt
        )
        return stream[None], n_words[None], esc_seg[None], n_esc[None]

    spec = P(axis, None, None)
    out_specs = (P(axis, None), P(axis), P(axis, None), P(axis))
    return jax.jit(
        shard_map(
            local, mesh=mesh, in_specs=(P(), spec, spec, spec, spec, spec),
            out_specs=out_specs, check_vma=False,
        )
    )(_tables_arrays(t), *blocks)


def sharded_decode_stage(dec, streams, escs, indexes, keep, t: DeviceTables,
                         lanes: int, mesh: Mesh, axis: str = "model"):
    """Stage-wise sharded decode: device g advances its own sub-stream.

    dec: rans_device.GroupedDecoderState with states (K,), offsets (G,),
    esc_offsets (G,).  Returns (dec', values (n,) int32, global order).
    """
    groups = mesh.shape[axis]
    kt = lanes // groups
    n = indexes.shape[0]
    lmax = t.lmax
    idx = rans_device._pad_to_grid(indexes.astype(jnp.int32), lanes)
    kp = rans_device._pad_to_grid(keep.astype(bool), lanes)
    idx_b = _to_group_blocks(idx, groups)
    kp_b = _to_group_blocks(kp, groups)
    states_b = dec.states.reshape(groups, kt)

    def local(ta, st, off, eoff, stream, esc, ib, kb):
        tt = _rebuild_tables(ta, lmax)
        d = rans_device.DecoderState(st[0], off[0], eoff[0])
        d, vals = rans_device.decode_stage(
            d, stream[0], esc[0], ib[0].reshape(-1), kb[0].reshape(-1), tt, kt
        )
        return (
            d.states[None], d.offset[None], d.esc_offset[None],
            vals.reshape(ib.shape)[0][None],
        )

    g1, g2 = P(axis, None), P(axis)
    out = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(P(), g1, g2, g2, g1, g1, P(axis, None, None),
                      P(axis, None, None)),
            out_specs=(g1, g2, g2, P(axis, None, None)),
            check_vma=False,
        )
    )(_tables_arrays(t), states_b, dec.offsets, dec.esc_offsets, streams, escs,
      idx_b, kp_b)
    states, offsets, esc_offsets, vals_b = out
    vals = vals_b.transpose(1, 0, 2).reshape(-1)[:n]
    return (
        rans_device.GroupedDecoderState(
            states.reshape(-1), offsets, esc_offsets
        ),
        vals,
    )
