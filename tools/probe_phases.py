"""Per-phase device timing of the codec chain — degraded-sync fenced.

CRITICAL backend properties (measured rounds 4-5, PARITY.md):
  * a single device->host transfer permanently switches the process into
    a SYNCHRONOUS dispatch mode (~0.03 ms -> ~11 ms per dispatch, each op
    completing on device before the dispatch returns),
  * block_until_ready can return at ENQUEUE time, not completion — the
    round-4 version of this tool used it and produced invalid numbers
    (VERDICT r4 item 46), and
  * clean-mode enqueue queues wedge the tunnel (round-5 dispatch studies)
    — so clean-mode pipelined timing is unusable here too.

Round-5 protocol (timed_fenced): each phase runs in its OWN subprocess,
is warmed, then DELIBERATELY degraded (one d2h) and timed synchronously
with a per-iteration 4-byte materialization — completion-true; absolute
numbers include a constant per-dispatch tax, A/B comparisons cancel it.
The orchestrator (no --phase arg) merges results into
runs/probe_phases.json.

Usage:
  python tools/probe_phases.py                 # all phases, subprocesses
  python tools/probe_phases.py --phase chain   # one phase, this process
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS_NPZ = "/tmp/pct_bench_params.npz"
TREEDEF_PKL = "/tmp/pct_bench_treedef.pkl"

PHASES = (
    "chain", "encode", "decode", "analyze",
    "enc_prepare", "enc_scan_xla", "enc_scan_pallas", "enc_finalize",
)


def save_params():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from progressivecodec_tpu.config import ModelConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN

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
    import jax
    import numpy as np

    npz = np.load(PARAMS_NPZ)
    flat = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    with open(TREEDEF_PKL, "rb") as f:
        treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, flat)


def timed_fenced(fn, n, *args, label=""):
    """Deliberately-degraded synchronous timing (round-5 protocol).

    Round-5 measurement (tools/probe_dispatch studies, PARITY.md): through
    the tunneled backend, CLEAN-mode enqueue timing is unusable — queues
    beyond ~10 dispatches wedge (4-20x slowdown), and an idle device costs
    ~100 ms per dispatch in poll backoff.  The only fence whose semantics
    are unimpeachable here is the degraded SYNCHRONOUS mode: after one d2h
    the process dispatches synchronously (each op completes on device
    before returning), so per-iteration wall time = device compute + a
    constant per-dispatch tax.  A/B comparisons between implementations of
    the same phase are therefore valid (the tax cancels); absolute numbers
    are upper bounds including the tax.  One phase per process so warm-up
    state is identical across phases."""
    import jax
    import jax.numpy as jnp

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.mean(jnp.asarray(leaf, jnp.float32)))

    t0 = time.perf_counter()
    out = fn(*args)
    val = fence(out)  # enters degraded/synchronous mode + full warm
    print(f"[{label}] warm+compile+degrade {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        val = fence(out)  # 4-byte materialization: completion-true
    dt = (time.perf_counter() - t0) / n
    assert val == val, f"{label}: non-finite fence"
    print(f"[{label}] {1e3*dt:.2f} ms/iter (degraded-sync fenced)",
          file=sys.stderr, flush=True)
    return dt, out


def run_phase(phase, args):
    import jax
    import jax.numpy as jnp

    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from progressivecodec_tpu.config import ModelConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
    from progressivecodec_tpu.models.codec_granular import GranularCodec

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
    q = args.quality

    if phase == "chain":
        def fn(xx):
            d = codec.compress(xx, quality=q, to_host=False)
            return codec.decompress(d)
        dt, out = timed_fenced(fn, n, x, label=phase)
        assert bool(out["stream_ok"]), "stream integrity failed"
        return dt
    if phase == "encode":
        dt, _ = timed_fenced(
            lambda xx: codec.compress(xx, quality=q, to_host=False), n, x,
            label=phase)
        return dt
    if phase == "decode":
        d = codec.compress(x, quality=q, to_host=False)
        dt, out = timed_fenced(lambda dd: codec.decompress(dd), n, d, label=phase)
        assert bool(out["stream_ok"]), "stream integrity failed"
        return dt
    if phase == "analyze":
        dt, _ = timed_fenced(
            lambda xx: codec._call("analyze", (), xx), n, x, label=phase)
        return dt

    # coder micro-phases on a synthetic full-size stage list
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
    if phase == "enc_prepare":
        dt, _ = timed_fenced(prep, n, t, stages, label=phase)
        return dt
    grids = prep(t, stages)
    sf_rev, kp_rev, ef, sy = grids
    if phase == "enc_scan_xla":
        scan = jax.jit(lambda sf, kp: rans_device.encode_scan_rev(sf, kp, K))
        dt, _ = timed_fenced(scan, n, sf_rev, kp_rev, label=phase)
        return dt
    if phase == "enc_scan_pallas":
        from progressivecodec_tpu.coder.rans_pallas import encode_scan_rev_pallas

        dt, _ = timed_fenced(
            lambda a, bb: encode_scan_rev_pallas(a, bb, K), n, sf_rev, kp_rev,
            label=phase)
        return dt
    if phase == "enc_finalize":
        scan = jax.jit(lambda sf, kp: rans_device.encode_scan_rev(sf, kp, K))
        st_, w_, f_ = scan(sf_rev, kp_rev)
        fin = jax.jit(
            lambda st, ww, f, efv, sym: rans_device.encode_finalize(
                st, ww, f, efv, sym, K)
        )
        dt, _ = timed_fenced(fin, n, st_, w_, f_, ef, sy, label=phase)
        return dt
    raise ValueError(phase)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--quality", type=float, default=10.0)
    ap.add_argument("--save-params", action="store_true")
    ap.add_argument("--phase", choices=PHASES, default=None)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--phases", type=str, default=None,
                    help="comma list for the orchestrator (default: all)")
    args = ap.parse_args()

    if args.save_params:
        from progressivecodec_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        save_params()
        return

    if args.phase:
        dt = run_phase(args.phase, args)
        res = {"phase": args.phase, "batch": args.batch, "lanes": args.lanes,
               "n": args.n, "ms": round(1e3 * dt, 2)}
        print(json.dumps(res))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(res, f)
        return

    # orchestrator: one subprocess per phase (fence degrades a process)
    if not os.path.exists(PARAMS_NPZ):
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--save-params"], check=True, timeout=1200)
    phases = args.phases.split(",") if args.phases else list(PHASES)
    merged = {"batch": args.batch, "lanes": args.lanes, "n": args.n,
              "quality": args.quality,
              "protocol": "degraded-sync fenced (per-iteration 4-byte materialization), one subprocess per phase"}
    for phase in phases:
        out_path = f"/tmp/pct_phase_{phase}.json"
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase,
             "--batch", str(args.batch), "--lanes", str(args.lanes),
             "--n", str(args.n), "--quality", str(args.quality),
             "--json-out", out_path],
            timeout=3600, capture_output=True, text=True)
        if proc.returncode != 0 or not os.path.exists(out_path):
            merged[f"{phase}_ms"] = None
            merged[f"{phase}_error"] = (proc.stderr or proc.stdout)[-300:]
            continue
        merged[f"{phase}_ms"] = json.load(open(out_path))["ms"]
        os.remove(out_path)
    os.makedirs("runs", exist_ok=True)
    with open("runs/probe_phases.json", "w") as f:
        f.write(json.dumps(merged, indent=2))
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
