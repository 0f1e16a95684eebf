"""CLI smoke tests: one synthetic training epoch end-to-end + eval."""

import json
import os

import pytest


def test_train_cli_synthetic_smoke(tmp_path, monkeypatch):
    from progressivecodec_tpu.cli.train import main
    import progressivecodec_tpu.cli.train as train_mod
    from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
    from progressivecodec_tpu import config as config_lib

    cfg = ModelConfig(
        N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
        scale_table=ScaleTableConfig(levels=32),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(config_lib.to_json(cfg))
    out = str(tmp_path / "run")
    main(
        [
            "--synthetic",
            "--config", str(cfg_path),
            "--epochs", "1",
            "--batch-size", "2",
            "--out", out,
            "--steps-per-epoch", "2",
            "--eval-every", "1",
        ]
    )
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("train_loss" in l for l in lines)
    assert any("real_codec" in l for l in lines)
    assert os.path.isdir(os.path.join(out, "ckpt_last"))
    real = next(l for l in lines if "real_codec" in l)["real_codec"]
    # bpp grows with quality; psnr finite
    assert real["bpp"][0] < real["bpp"][-1]


def test_eval_cli_synthetic_smoke(tmp_path, capsys):
    # uses a random-init tiny model through the full eval path
    import progressivecodec_tpu.cli.eval as eval_mod
    from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig
    import progressivecodec_tpu.config as config_lib

    tiny = ModelConfig(
        N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
        scale_table=ScaleTableConfig(levels=32),
    )
    # monkeypatch default ModelConfig used when no checkpoint given
    orig = eval_mod.ModelConfig
    eval_mod.ModelConfig = lambda: tiny
    try:
        out_path = tmp_path / "res.json"
        eval_mod.main(["--synthetic", "--qualities", "0,10", "--out", str(out_path), "--max-images", "1"])
        result = json.loads(out_path.read_text())
        assert result["real_codec"]["bpp"][0] < result["real_codec"]["bpp"][1]
        # entropy estimate and real bpp agree within tolerance + lane overhead
        for est, real in zip(result["entropy_estimate"]["bpp"], result["real_codec"]["bpp"]):
            assert real < est * 1.25 + 0.3
    finally:
        eval_mod.ModelConfig = orig


def test_openimages_downloader_gated():
    """The downloader exists (reference parity: downloader_openimages.py)
    and fails actionably without the optional fiftyone dependency."""
    import pytest as _pytest

    from progressivecodec_tpu.data.openimages import download_openimages

    try:
        import fiftyone  # noqa: F401
        _pytest.skip("fiftyone installed; skipping offline-gate check")
    except ImportError:
        pass
    with _pytest.raises(ImportError, match="fiftyone"):
        download_openimages("/tmp/nonexistent-openimages")
