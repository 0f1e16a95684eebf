"""Benchmark: Kodak-size images/s/chip, encode+decode at max quality.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference's published decode-time anchor is 2.30-9.18
s/image (result_list.py:107-127; GPU transforms + single-threaded CPU
rANS).  We take the FASTEST end of that range (2.30 s/image = 0.435
images/s) as the conservative baseline; vs_baseline = ours / 0.435.

Measurement protocol (round 5, replacing the round-4 `block_until_ready`
timing that published an enqueue rate and an impossible 526% MFU, VERDICT
r4 next #1).  Backend facts this protocol is built around (PARITY.md
"measurement protocol" + the round-5 dispatch studies):
  * the first device->host transfer permanently switches the process to a
    synchronous dispatch mode (each op completes on device before the
    dispatch returns, + a per-dispatch tax);
  * `block_until_ready` can return at ENQUEUE time, not completion;
  * clean-mode (no-d2h) queueing is pathological through the tunnel:
    >~10 queued dispatches wedge it (measured 4-20x slowdown, worse than
    the synchronous mode), and an idle device costs ~100 ms/dispatch in
    poll backoff — so "pipelined clean-mode throughput" is not a
    well-defined quantity in this environment.
The HEADLINE `value` is therefore the fully materialized serialized
throughput: each chain's output is read back before the next starts
(`forced_sync_images_per_s`) — an unimpeachable completion fence and a
conservative LOWER bound on real-hardware throughput (it includes the
backend's per-dispatch tax; a local chip without the tunnel only does
better).  The scalar-fenced pipelined figure (enqueue N chains, one
4-byte dependent scalar read) is reported alongside for reference with a
shallow queue (N=4); where it is lower than the serialized number, that
is the tunnel's queue pathology, not device compute.

`bench.py` itself NEVER touches the TPU: it forces the CPU platform and
runs each (quality, batch) config in its own SUBPROCESS
(tools/probe_honest.py) — one config per process because the fence's d2h
degrades the process that performed it.  Each probe asserts stream
integrity for every container (all rANS lane states back at L).

MFU: analytic MXU FLOPs of the transform fragments the chain actually
executes (utils/flops.py jaxpr counter; coder/glue excluded — they are
VPU/bandwidth work) divided by chain time x chip bf16 peak (chip kind
reported by the probe).  A hard `assert mfu < 1.0` gate makes an
impossible number unpublishable.

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


def run_probe(out_path, quality, batch, n=12, scan_impl="xla", timeout=2400):
    """One scalar-fenced measurement in its own process (the fence d2h
    degrades the process that did it; the chip is single-process-exclusive)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    cmd = [
        sys.executable, os.path.join(repo, "tools", "probe_honest.py"),
        "--quality", str(quality), "--batch", str(batch), "--n", str(n),
        "--scan-impl", scan_impl, "--json-out", out_path,
    ]
    proc = subprocess.run(cmd, timeout=timeout, capture_output=True, text=True)
    if proc.returncode != 0 or not os.path.exists(out_path):
        raise RuntimeError(
            f"probe {quality=} {batch=} failed rc={proc.returncode}:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    with open(out_path) as f:
        r = json.load(f)
    assert r["fence_value_finite"], f"probe {quality=} {batch=}: non-finite output"
    assert r["stream_ok_all"], f"probe {quality=} {batch=}: stream integrity failed"
    return r


def main():
    ensure_params()

    # The orchestrator must NEVER initialize the TPU backend: the chip is
    # exclusive to the probe subprocesses, and jax tracing for the FLOP
    # count is pure host work.  (sitecustomize force-selects the tunneled
    # backend; this override must precede any jax import.)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from progressivecodec_tpu.config import ModelConfig
    from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
    from progressivecodec_tpu.utils.flops import count_flops, chip_peak_flops

    cfg = ModelConfig()
    model = ChannelProgressiveWACNN(cfg=cfg)
    npz = np.load(PARAMS_NPZ)
    flat = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    with open(TREEDEF_PKL, "rb") as f:
        treedef = pickle.load(f)
    host_vars = jax.tree.unflatten(treedef, flat)

    h, w = 512, 768  # Kodak geometry (multiple of 64 already)
    os.makedirs("runs", exist_ok=True)

    # q=5 exercises the sigma-quantile mask path (q=10 short-circuits to
    # all-ones); batch=1 is the per-image-stream figure
    probes = {}
    for quality, batch in ((10.0, 8), (10.0, 1), (5.0, 8)):
        out_path = os.path.join(
            "runs", f"probe_honest_q{int(quality)}_b{batch}.json"
        )
        probes[(quality, batch)] = run_probe(out_path, quality, batch, n=4)

    b8 = probes[(10.0, 8)]
    b1 = probes[(10.0, 1)]
    q5 = probes[(5.0, 8)]
    # headline = serialized, fully materialized throughput (see docstring)
    images_per_s = max(
        b8["forced_sync_images_per_s"], b1["forced_sync_images_per_s"]
    )

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
    peak, peak_note = chip_peak_flops(kind=b8["device_kind"])
    mfu = chain_fl * images_per_s / peak

    # Physical sanity gate (VERDICT r4 next #1): a bench that can print
    # MFU >= 1 is broken by construction.  If this trips, the fence is
    # not a completion fence on this backend — fix the protocol, never
    # the assert.
    assert mfu < 1.0, (
        f"IMPOSSIBLE MEASUREMENT: mfu={mfu:.3f} >= 1.0 "
        f"({chain_fl / 1e9:.1f} GF/img x {images_per_s:.1f} img/s vs "
        f"{peak / 1e12:.0f} TF/s peak) — timing fence is not catching compute"
    )

    baseline = 1.0 / 2.30
    print(
        json.dumps(
            {
                "metric": "kodak_enc_dec_images_per_s_per_chip_q10",
                "value": images_per_s,
                "unit": "images/s",
                "vs_baseline": round(images_per_s / baseline, 2),
                "q5_images_per_s": q5["forced_sync_images_per_s"],
                "per_image_stream_images_per_s": b1["forced_sync_images_per_s"],
                "pipelined_shallow_queue_images_per_s":
                    b8["images_per_s_scalar_fenced"],
                "transform_gflops_per_image": round(chain_fl / 1e9, 1),
                "mfu": round(mfu, 4),
                "peak_note": peak_note,
                "baseline_note": "ref fastest decode-ONLY anchor 2.30 s/img; ours is encode+decode",
                "protocol_note": "value = serialized fully-materialized throughput (every chain read back before the next starts) — a conservative LOWER bound incl. the tunneled backend's per-dispatch tax; pipelined_shallow_queue = scalar-fenced 4-chain enqueue (the tunnel's queue pathology makes deeper pipelining unrepresentative, see PARITY.md round-5); probe artifacts in runs/probe_honest_*.json",
            }
        )
    )


if __name__ == "__main__":
    main()
