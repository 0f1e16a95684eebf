"""Benchmark: Kodak-size images/s/chip, encode+decode at max quality.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference's published decode-time anchor is 2.30-9.18
s/image (result_list.py:107-127; GPU transforms + single-threaded CPU
rANS).  We take the FASTEST end of that range (2.30 s/image = 0.435
images/s) as the conservative baseline; vs_baseline = ours / 0.435.

Measurement protocol (round 4): the tunneled TPU backend permanently
degrades per-dispatch latency ~300x after the process's first
device->host transfer — including the hidden host fetch when a jit
captures a live device array as a closure constant (see
models/codec.py:Codec docstring).  The bench therefore runs in two
phases:
  1. a throwaway SUBPROCESS initializes the flagship params on device
     and saves them to a host npz (that process degrades itself; we
     discard it);
  2. the main process loads params from disk, uploads (h2d is safe),
     builds CDF tables host-side (host_params), and times fully
     pipelined device-resident chains with ZERO d2h — `value` is this
     steady-state device throughput;
  3. AFTER all timing, every container's stream integrity (all rANS
     lane states back at L) is asserted via d2h, and a forced-sync
     per-chain pass is timed in the now-degraded mode and reported as
     `forced_sync_images_per_s` (a conservative floor that includes the
     degraded-dispatch tax).

MFU: analytic MXU FLOPs of the transform fragments the chain actually
executes (utils/flops.py jaxpr counter; coder/glue excluded — they are
VPU/bandwidth work) divided by chain time x chip bf16 peak.

Weights are random — throughput does not depend on weight values; input
is synthetic 768x512 (Kodak geometry).  In-flight work is bounded (the
tunnel wedges beyond ~20 queued chains).
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys
import time

PARAMS_NPZ = "/tmp/pct_bench_params.npz"
TREEDEF_PKL = "/tmp/pct_bench_treedef.pkl"

_SAVE_SNIPPET = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np, pickle
from progressivecodec_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
model = ChannelProgressiveWACNN(cfg=ModelConfig())
variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
flat, _ = jax.tree.flatten(variables)
np.savez(%(npz)r, *[np.asarray(x) for x in flat])
with open(%(pkl)r, "wb") as f:
    pickle.dump(jax.tree.structure(jax.tree.map(lambda x: 0, variables)), f)
print("params saved")
"""


def ensure_params():
    if os.path.exists(PARAMS_NPZ) and os.path.exists(TREEDEF_PKL):
        return
    repo = os.path.dirname(os.path.abspath(__file__))
    code = _SAVE_SNIPPET % {"repo": repo, "npz": PARAMS_NPZ, "pkl": TREEDEF_PKL}
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)


def main():
    ensure_params()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from progressivecodec_tpu.config import ModelConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
    from progressivecodec_tpu.models.codec_granular import GranularCodec
    from progressivecodec_tpu.utils.flops import count_flops, chip_peak_flops

    cfg = ModelConfig()
    model = ChannelProgressiveWACNN(cfg=cfg)
    npz = np.load(PARAMS_NPZ)
    flat = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    with open(TREEDEF_PKL, "rb") as f:
        treedef = pickle.load(f)
    host_vars = jax.tree.unflatten(treedef, flat)
    variables = jax.device_put(host_vars)
    codec = GranularCodec(model, variables, lanes=512, host_params=host_vars)
    codec.update()  # host-side table build: no d2h

    h, w = 512, 768  # Kodak geometry (multiple of 64 already)

    def chain(xx, quality):
        d = codec.compress(xx, quality=quality, to_host=False)
        return codec.decompress(d)

    def measure(quality, batch, n_images=16, max_inflight=4):
        xs = [
            jax.random.uniform(
                jax.random.PRNGKey(i + 1), (batch, h, w, 3), jnp.float32
            )
            for i in range(max(n_images // batch, 2))
        ]
        outs = [chain(xs[0], quality)]
        jax.block_until_ready(outs[0]["x_hat"])  # warm/compile, no d2h
        t0 = time.perf_counter()
        outs = []
        for i, x in enumerate(xs):
            outs.append(chain(x, quality))
            if (i + 1) % max_inflight == 0:  # bound the tunnel queue
                jax.block_until_ready(outs[-1]["x_hat"])
        jax.block_until_ready([o["x_hat"] for o in outs])
        dt = (time.perf_counter() - t0) / (len(xs) * batch)
        return 1.0 / dt, outs

    # q=5 exercises the sigma-quantile mask path (q=10 short-circuits to
    # all-ones); batch=1 is the per-image-stream figure
    q5_ips, outs_q5 = measure(5.0, batch=8)
    b1_ips, outs_b1 = measure(10.0, batch=1)
    b8_ips, outs_b8 = measure(10.0, batch=8)
    images_per_s = max(b8_ips, b1_ips)

    # analytic transform FLOPs of the chain's fragment dispatches:
    # encode = fsq minus g_s; decode = fsq minus (g_a + h_a)
    x1 = jnp.zeros((1, h, w, 3), jnp.float32)

    def fsq(v, xx):
        return model.apply(v, xx, 10.0, None, training=False,
                           method=type(model).forward_single_quality)

    shapes_only = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), host_vars
    )
    fsq_fl = count_flops(fsq, shapes_only, jax.ShapeDtypeStruct(x1.shape, x1.dtype))

    def analyze(v, xx):
        return model.apply(v, xx, method=type(model).analyze)

    ana_fl = count_flops(analyze, shapes_only, jax.ShapeDtypeStruct(x1.shape, x1.dtype))
    y_sd = jax.eval_shape(analyze, shapes_only, jax.ShapeDtypeStruct(x1.shape, x1.dtype))

    def hyper_enc(v, yy):
        return model.apply(v, yy, method=type(model).codec_hyper_enc)

    he_fl = count_flops(hyper_enc, shapes_only, y_sd)
    # decoder synthesis consumes the 320-ch progressive latent (delta_dim)
    yhat_sd = jax.ShapeDtypeStruct(
        y_sd.shape[:3] + (cfg.division_channel,), y_sd.dtype
    )

    def synth(v, yy):
        return model.apply(v, 1, yy, method=type(model).codec_synth)

    syn_fl = count_flops(synth, shapes_only, yhat_sd)
    enc_fl = fsq_fl - syn_fl
    dec_fl = fsq_fl - ana_fl - he_fl
    chain_fl = enc_fl + dec_fl
    peak, peak_note = chip_peak_flops()
    mfu = chain_fl * images_per_s / peak

    # ---- all timing done: d2h is safe now.  Integrity + forced floor ----
    all_outs = outs_q5 + outs_b1 + outs_b8
    assert all(bool(o["stream_ok"]) for o in all_outs), "stream integrity failed"

    x = jax.random.uniform(jax.random.PRNGKey(99), (1, h, w, 3), jnp.float32)
    o = chain(x, 10.0)
    _ = float(jnp.mean(o["x_hat"]))  # force materialization (degraded now)
    t0 = time.perf_counter()
    n_forced = 4
    for _ in range(n_forced):
        o = chain(x, 10.0)
        _ = float(jnp.mean(o["x_hat"]))
    forced_ips = n_forced / (time.perf_counter() - t0)

    baseline = 1.0 / 2.30
    print(
        json.dumps(
            {
                "metric": "kodak_enc_dec_images_per_s_per_chip_q10",
                "value": round(images_per_s, 4),
                "unit": "images/s",
                "vs_baseline": round(images_per_s / baseline, 2),
                "q5_images_per_s": round(q5_ips, 4),
                "per_image_stream_images_per_s": round(b1_ips, 4),
                "forced_sync_images_per_s": round(forced_ips, 4),
                "transform_gflops_per_image": round(chain_fl / 1e9, 1),
                "mfu": round(mfu, 4),
                "peak_note": peak_note,
                "baseline_note": "ref fastest decode-ONLY anchor 2.30 s/img; ours is encode+decode",
                "protocol_note": "value = d2h-free pipelined device throughput; forced_sync = per-chain host-materialized floor in the backend's degraded dispatch mode",
            }
        )
    )


if __name__ == "__main__":
    main()
