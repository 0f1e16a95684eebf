"""Round-3 close-out measurement (single process, compile-reuse aware).

The tunneled chip has no persistent compilation cache this round, so a
fresh process pays every compile again (~8 min for the train step; a few
minutes for the 768x512 forward).  This script therefore does everything
in ONE process, cheapest first, writing JSON after every stage so a
hard deadline kill still leaves evidence on disk:

  1. entropy-estimate RD ladder (reference's 14-point test list) on the
     trained flagship checkpoint — forward-only, one compile;
  2. real-codec points at q in {0, 1, 10} — the full rANS chain
     (stream integrity asserted), appended if time allows.
"""

from __future__ import annotations

import json
import os
import sys
import time

# scripts under tools/ get sys.path[0]=tools/, not the repo root (the
# exact crash that ate round-2's lanes sweep, runs/bench_coder.log)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main():
    t0 = time.time()
    import os

    import jax

    from progressivecodec_tpu import config as config_lib
    from progressivecodec_tpu.config import ModelConfig, TrainConfig
    from progressivecodec_tpu.models.registry import get_model
    from progressivecodec_tpu.models.codec_granular import make_codec
    from progressivecodec_tpu.data.datasets import SyntheticKodak
    from progressivecodec_tpu.training.checkpoint import load_checkpoint
    from progressivecodec_tpu.training.evaluate import entropy_estimate_eval, evaluate_codec
    from progressivecodec_tpu.training.step import init_train_state

    ckpt = sys.argv[1] if len(sys.argv) > 1 else "runs/flagship_r3/ckpt_last"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "runs/rd_r3.json"
    cmeta = json.load(open(os.path.join(ckpt, "config.json")))
    mcfg = config_lib._from_dict(ModelConfig, cmeta["model"])
    model = get_model(mcfg)
    state, _ = init_train_state(
        model, jax.random.PRNGKey(0), TrainConfig(), sample_shape=(1, 64, 64, 3)
    )
    state, meta = load_checkpoint(ckpt, state)
    meta = meta.get("extra", {})
    codec = make_codec(model, {"params": state.params})
    kodak = SyntheticKodak()
    imgs = [kodak[i] for i in range(2)]

    ladder = (0.0, 0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 10.0)
    est = entropy_estimate_eval(codec, imgs, pr_list=ladder)
    result = {
        "checkpoint": ckpt,
        "epochs_trained": meta.get("epoch"),
        "qualities": list(ladder),
        "entropy_estimate": est,
        "t_ladder_s": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"stage": "ladder", **{k: result[k] for k in ("epochs_trained", "t_ladder_s")}}), flush=True)

    t1 = time.time()
    codec.update()
    real = evaluate_codec(codec, imgs, pr_list=(0.0, 1.0, 10.0))
    result["real_codec"] = real
    result["real_codec_qualities"] = [0.0, 1.0, 10.0]
    result["t_real_s"] = round(time.time() - t1, 1)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"stage": "real", "real": real}), flush=True)


if __name__ == "__main__":
    main()
