"""CLIC-2K-size encode+decode timing on the real chip (VERDICT r3 #5).

BASELINE config 4 analog on one chip: a 2048x1024 image through the full
codec, (a) untiled and (b) through tiled_compress/tiled_decompress with
a degenerate 1-device mesh — the same halo-exchange program that runs
per-device on a pod, so (b)-(a) is the per-tile halo/pipeline overhead.
Multi-tile byte-equality is covered on the virtual CPU mesh
(tests/test_tiling.py); this tool reports real-chip throughput.

d2h-free protocol (see bench.py); integrity asserted after timing.
Writes runs/bench_2k.json.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_params, PARAMS_NPZ, TREEDEF_PKL


def main():
    ensure_params()
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
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("model",))

    def untiled(xx):
        d = codec.compress(xx, quality=10.0, to_host=False)
        return codec.decompress(d)

    def tiled(xx):
        d = tiled_compress(codec, xx, mesh, quality=10.0)
        return tiled_decompress(codec, d, mesh)

    res = {"shape": [h, w], "lanes": codec.lanes}
    outs = {}
    for name, fn in [("untiled", untiled), ("tiled_mesh1", tiled)]:
        o = fn(x)
        jax.block_until_ready(o["x_hat"])  # warm/compile, no d2h
        n = 6
        t0 = time.perf_counter()
        last = None
        for _ in range(n):
            last = fn(x)
            jax.block_until_ready(last["x_hat"])
        dt = (time.perf_counter() - t0) / n
        res[f"{name}_ms_per_image"] = round(dt * 1e3, 2)
        res[f"{name}_images_per_s"] = round(1.0 / dt, 3)
        outs[name] = (o, last)
    res["halo_overhead_pct"] = round(
        100.0 * (res["tiled_mesh1_ms_per_image"] / res["untiled_ms_per_image"] - 1.0), 1
    )

    # ---- timing done; integrity (d2h) ----
    for name, (o, last) in outs.items():
        assert bool(o["stream_ok"]) and bool(last["stream_ok"]), f"{name} stream"
    res["stream_ok"] = True
    os.makedirs("runs", exist_ok=True)
    with open("runs/bench_2k.json", "w") as f:
        f.write(json.dumps(res, indent=2))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
