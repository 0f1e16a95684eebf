"""Honest steady-state throughput: scalar-fenced pipelined timing.

Round-4 finding chain (PARITY.md): on the tunneled backend
(1) any d2h permanently degrades dispatch ~300x, and
(2) block_until_ready can return at ENQUEUE time, not completion —
    measured 846 img/s "throughput" = 495% MFU, physically impossible.

Protocol here:
  * warm/compile one chain, then SLEEP long enough for its compute to
    drain (no d2h fence available that wouldn't degrade the process);
  * enqueue N chains back-to-back (clean-mode dispatch, cheap);
  * ONE 4-byte scalar read of the LAST chain's output mean — in-order
    execution means it completes only after all N chains' compute, and
    the transfer itself is negligible.  Timed: first enqueue -> scalar
    value on host.  The first read degrades the process, so each batch
    config runs in its OWN subprocess (bench.py orchestrates).
  * after the fence (process now degraded/synchronous): stream integrity
    asserted for every container, then a per-chain host-materialized
    pass is timed — `forced_sync_images_per_s`, bench.py's HEADLINE.

Round-5 finding (probe_dispatch studies, PARITY.md): keep N SHALLOW
(<= ~4).  The tunnel wedges on deep clean-mode queues — at N=12 the
scalar-fenced figure came out 4-21x SLOWER than the serialized
synchronous floor, i.e. the pipelined number measures tunnel queue
pathology, not device compute.  The serialized forced-sync pass is the
defensible (lower-bound) throughput in this environment.

Usage: python tools/probe_honest.py [--batch 1] [--n 4] [--quality 10]
       [--scan-impl xla|pallas] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_params, PARAMS_NPZ, TREEDEF_PKL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--quality", type=float, default=10.0)
    ap.add_argument("--warm-drain-s", type=float, default=8.0)
    ap.add_argument("--scan-impl", type=str, default="xla",
                    choices=("xla", "pallas"))
    ap.add_argument("--no-floor", action="store_true",
                    help="skip the post-fence forced-sync floor pass")
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()

    ensure_params()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from progressivecodec_tpu.config import ModelConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
    from progressivecodec_tpu.models.codec_granular import GranularCodec

    model = ChannelProgressiveWACNN(cfg=ModelConfig())
    npz = np.load(PARAMS_NPZ)
    flat = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    with open(TREEDEF_PKL, "rb") as f:
        treedef = pickle.load(f)
    host_vars = jax.tree.unflatten(treedef, flat)
    variables = jax.device_put(host_vars)
    codec = GranularCodec(model, variables, lanes=512, host_params=host_vars,
                          scan_impl=args.scan_impl)
    codec.update()

    h, w = 512, 768
    xs = [
        jax.random.uniform(jax.random.PRNGKey(i + 1), (args.batch, h, w, 3))
        for i in range(args.n)
    ]

    def chain(xx):
        d = codec.compress(xx, quality=args.quality, to_host=False)
        return codec.decompress(d)

    # warm/compile, then drain without a fence (sleep >> one chain time)
    out = chain(xs[0])
    jax.block_until_ready(out["x_hat"])
    time.sleep(args.warm_drain_s)

    t0 = time.perf_counter()
    outs = [chain(x) for x in xs]
    fence = jnp.mean(outs[-1]["x_hat"])  # tiny dependent reduction
    val = float(fence)  # 4-byte d2h: waits for ALL queued compute
    dt_total = time.perf_counter() - t0
    per_image = dt_total / (args.n * args.batch)
    # ---- fence crossed: the process is in degraded-dispatch mode now ----
    ok = all(bool(o["stream_ok"]) for o in outs)
    result = {
        "batch": args.batch,
        "n_chains": args.n,
        "quality": args.quality,
        "scan_impl": args.scan_impl,
        "device_kind": getattr(jax.devices()[0], "device_kind", "") or "",
        "images_per_s_scalar_fenced": round(1.0 / per_image, 3),
        "ms_per_image": round(per_image * 1e3, 2),
        "fence_value_finite": bool(np.isfinite(val)),
        "stream_ok_all": ok,
    }
    if not args.no_floor:
        x = xs[0]
        o = chain(x)
        _ = float(jnp.mean(o["x_hat"]))  # warm the degraded path
        t0 = time.perf_counter()
        n_forced = 6
        ok_f = True
        for _i in range(n_forced):
            o = chain(x)
            _ = float(jnp.mean(o["x_hat"]))
            ok_f = ok_f and bool(o["stream_ok"])
        dt = (time.perf_counter() - t0) / (n_forced * args.batch)
        result["forced_sync_images_per_s"] = round(1.0 / dt, 3)
        result["stream_ok_all"] = ok and ok_f
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
