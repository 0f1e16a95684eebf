"""CLIC-2K-size encode+decode timing on the real chip (VERDICT r3 #5).

BASELINE config 4 analog on one chip: a 2048x1024 image through the full
codec, (a) untiled and (b) through tiled_compress/tiled_decompress with
a degenerate 1-device mesh — the same halo-exchange program that runs
per-device on a pod, so (b)-(a) is the per-tile halo/pipeline overhead.
Multi-tile byte-equality is covered on the virtual CPU mesh
(tests/test_tiling.py); this tool reports real-chip throughput.

Round-5 protocol: scalar-fenced timing (see bench.py docstring — the
round-4 block_until_ready numbers here were enqueue rates).  Each mode
runs in its OWN subprocess because the completion fence's d2h degrades
the process; the parent merges the two results into runs/bench_2k.json.

Usage: python tools/bench_2k.py            # orchestrate both modes
       python tools/bench_2k.py --mode untiled --json-out f.json
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

from bench import ensure_params, PARAMS_NPZ, TREEDEF_PKL


def run_mode(mode: str, n: int, warm_drain_s: float) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from progressivecodec_tpu.config import ModelConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
    from progressivecodec_tpu.models.codec_granular import GranularCodec
    from progressivecodec_tpu.parallel.tiling import tiled_compress, tiled_decompress

    model = ChannelProgressiveWACNN(cfg=ModelConfig())
    npz = np.load(PARAMS_NPZ)
    flat = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    with open(TREEDEF_PKL, "rb") as f:
        treedef = pickle.load(f)
    host_vars = jax.tree.unflatten(treedef, flat)
    variables = jax.device_put(host_vars)
    codec = GranularCodec(model, variables, lanes=512, host_params=host_vars)
    codec.update()

    h, w = 1024, 2048
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), jnp.float32)

    if mode == "untiled":
        def chain(xx):
            d = codec.compress(xx, quality=10.0, to_host=False)
            return codec.decompress(d)
    else:
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("model",))

        def chain(xx):
            d = tiled_compress(codec, xx, mesh, quality=10.0)
            return tiled_decompress(codec, d, mesh)

    out = chain(x)
    jax.block_until_ready(out["x_hat"])  # warm/compile (enqueue), no d2h
    time.sleep(warm_drain_s)  # drain: no non-degrading fence exists

    t0 = time.perf_counter()
    outs = [chain(x) for _ in range(n)]
    val = float(jnp.mean(outs[-1]["x_hat"]))  # 4-byte completion fence
    dt = (time.perf_counter() - t0) / n
    ok = all(bool(o["stream_ok"]) for o in outs)  # degraded-mode d2h, fine

    # ---- fence crossed: process degraded.  Serialized forced-sync floor —
    # the defensible headline in this environment (probe_honest docstring:
    # deep clean-mode queues wedge the tunnel; the fenced figure above can
    # measure queue pathology, not device compute).
    o = chain(x)
    _ = float(jnp.mean(o["x_hat"]))  # warm the degraded path
    t0 = time.perf_counter()
    n_forced = 4
    ok_f = True
    for _i in range(n_forced):
        o = chain(x)
        _ = float(jnp.mean(o["x_hat"]))
        ok_f = ok_f and bool(o["stream_ok"])
    dt_f = (time.perf_counter() - t0) / n_forced
    return {
        "mode": mode,
        "n_chains": n,
        "ms_per_image_fenced": round(dt * 1e3, 2),
        "images_per_s_fenced": round(1.0 / dt, 3),
        "forced_sync_ms_per_image": round(dt_f * 1e3, 2),
        "forced_sync_images_per_s": round(1.0 / dt_f, 3),
        "fence_value_finite": bool(val == val),
        "stream_ok": ok and ok_f,
        "lanes": codec.lanes,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("untiled", "tiled"), default=None)
    ap.add_argument("--n", type=int, default=4,
                    help="shallow queue: deep queues wedge the tunnel")
    ap.add_argument("--warm-drain-s", type=float, default=10.0)
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()

    if args.mode:
        res = run_mode(args.mode, args.n, args.warm_drain_s)
        print(json.dumps(res))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(res, f)
        return

    ensure_params()
    os.makedirs("runs", exist_ok=True)
    tool = os.path.abspath(__file__)
    merged = {"shape": [1024, 2048],
              "protocol": "serialized forced-sync headline + shallow "
                          "scalar-fenced secondary, one subprocess per mode"}
    for mode in ("untiled", "tiled"):
        out_path = f"runs/bench_2k_{mode}.json"
        proc = subprocess.run(
            [sys.executable, tool, "--mode", mode, "--n", str(args.n),
             "--json-out", out_path],
            timeout=3600, capture_output=True, text=True,
        )
        if proc.returncode != 0 or not os.path.exists(out_path):
            raise RuntimeError(
                f"{mode} probe failed rc={proc.returncode}:\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
            )
        r = json.load(open(out_path))
        assert r["stream_ok"] and r["fence_value_finite"], r
        key = "tiled_mesh1" if mode == "tiled" else "untiled"
        # headline: serialized forced-sync floor (see run_mode comment);
        # the shallow-queue fenced figure is kept as a secondary column.
        merged[f"{key}_ms_per_image"] = r["forced_sync_ms_per_image"]
        merged[f"{key}_images_per_s"] = r["forced_sync_images_per_s"]
        merged[f"{key}_ms_per_image_fenced"] = r["ms_per_image_fenced"]
        merged["lanes"] = r["lanes"]
    merged["halo_overhead_pct"] = round(
        100.0 * (merged["tiled_mesh1_ms_per_image"] / merged["untiled_ms_per_image"] - 1.0), 1
    )
    merged["stream_ok"] = True
    with open("runs/bench_2k.json", "w") as f:
        f.write(json.dumps(merged, indent=2))
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
