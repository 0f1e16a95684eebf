"""Amortized per-phase device timing of the codec chain — d2h-free.

CRITICAL backend property (measured round 4, tools logs): on the
tunneled TPU backend a single device->host transfer (np.asarray, bool(),
.item(), copy_to_host_async) permanently switches the process into a
degraded dispatch mode (~0.03 ms -> ~11 ms per dispatch).  Every timing
here therefore runs BEFORE any d2h; integrity asserts happen at the end.
block_until_ready() does NOT trigger the degradation.

Params are loaded from a host npz (written by --save-params in a
throwaway process) so building CDF tables needs no d2h either.

Usage:
  python tools/probe_phases.py --save-params   # once (degrades itself)
  python tools/probe_phases.py [--batch 1] [--lanes 512] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.utils.cache import enable_compilation_cache
from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.codec_granular import GranularCodec

PARAMS_NPZ = "/tmp/pct_bench_params.npz"
TREEDEF_PKL = "/tmp/pct_bench_treedef.pkl"


def save_params():
    model = ChannelProgressiveWACNN(cfg=ModelConfig())
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    flat, _ = jax.tree.flatten(variables)
    np.savez(PARAMS_NPZ, *[np.asarray(x) for x in flat])
    with open(TREEDEF_PKL, "wb") as f:
        pickle.dump(jax.tree.structure(jax.tree.map(lambda x: 0, variables)), f)
    print(f"saved {len(flat)} params to {PARAMS_NPZ}")


def load_host_params():
    npz = np.load(PARAMS_NPZ)
    flat = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    with open(TREEDEF_PKL, "rb") as f:
        treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, flat)


def timed(fn, n, *args, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"[{label}] warm+compile {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"[{label}] {1e3*dt:.1f} ms/iter", file=sys.stderr, flush=True)
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--quality", type=float, default=10.0)
    ap.add_argument("--save-params", action="store_true")
    args = ap.parse_args()

    enable_compilation_cache()
    if args.save_params:
        save_params()
        return
    if not os.path.exists(PARAMS_NPZ):
        save_params()
        print("params saved in-process; rerun for clean-mode timings", file=sys.stderr)
        return

    model = ChannelProgressiveWACNN(cfg=ModelConfig())
    host_vars = load_host_params()
    variables = jax.device_put(host_vars)
    codec = GranularCodec(model, variables, lanes=args.lanes, host_params=host_vars)
    codec.update()
    h, w = 512, 768
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch, h, w, 3), jnp.float32
    )
    n = args.n
    res = {"batch": args.batch, "lanes": args.lanes, "n": n}

    def chain(xx):
        d = codec.compress(xx, quality=args.quality, to_host=False)
        return codec.decompress(d)

    t_chain, out = timed(chain, n, x, label="chain")
    res["chain_ms"] = 1e3 * t_chain

    t_enc, d = timed(
        lambda xx: codec.compress(xx, quality=args.quality, to_host=False), n, x,
        label="encode")
    res["encode_ms"] = 1e3 * t_enc

    t_dec, _ = timed(lambda dd: codec.decompress(dd), n, d, label="decode")
    res["decode_ms"] = 1e3 * t_dec

    t_ana, y = timed(lambda xx: codec._call("analyze", (), xx), n, x, label="analyze")
    res["analyze_ms"] = 1e3 * t_ana

    # encode triple on a synthetic full-size stage list (device-resident)
    from progressivecodec_tpu.coder import rans_device

    t = codec.device_tables
    hy, wy = h // 16, w // 16
    cfg = codec.cfg
    key = jax.random.PRNGKey(7)

    def mk(n_, rows):
        nonlocal key
        key, k1, k2, k3 = jax.random.split(key, 4)
        return (
            jax.random.randint(k1, (n_,), -8, 8, jnp.int32),
            jax.random.randint(k2, (n_,), 0, rows, jnp.int32),
            jax.random.uniform(k3, (n_,)) < 0.95,
        )

    b = args.batch
    stages = (
        [mk(b * (hy // 4) * (wy // 4) * cfg.N, cfg.N)]
        + [mk(b * hy * wy * 32, 64) for _ in range(10)]
        + [mk(b * hy * wy * 320, 64)]
    )
    K = args.lanes
    prep = jax.jit(lambda tt, s: rans_device.encode_prepare(s, tt, K))
    scan = jax.jit(lambda sf, kp: rans_device.encode_scan_rev(sf, kp, K))
    fin = jax.jit(
        lambda st, w_, f, ef, sym: rans_device.encode_finalize(st, w_, f, ef, sym, K)
    )
    t_prep, grids = timed(prep, n, t, stages, label="enc_prepare")
    res["enc_prepare_ms"] = 1e3 * t_prep
    sf_rev, kp_rev, ef, sy = grids
    t_scan, so = timed(scan, n, sf_rev, kp_rev, label="enc_scan_xla")
    res["enc_scan_xla_ms"] = 1e3 * t_scan
    try:
        from progressivecodec_tpu.coder.rans_pallas import encode_scan_rev_pallas

        t_scanp, _ = timed(
            lambda a, bb: encode_scan_rev_pallas(a, bb, K), n, sf_rev, kp_rev,
            label="enc_scan_pallas")
        res["enc_scan_pallas_ms"] = 1e3 * t_scanp
    except Exception as e:  # pallas unavailable on this backend
        res["enc_scan_pallas_ms"] = None
    st_, w_, f_ = so
    t_fin, _ = timed(fin, n, st_, w_, f_, ef, sy, label="enc_finalize")
    res["enc_finalize_ms"] = 1e3 * t_fin

    # ---- all timing done; d2h is now safe ----
    assert bool(out["stream_ok"]), "stream integrity failed"
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
