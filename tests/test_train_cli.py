"""End-to-end train-CLI smoke tests on tiny configs (CPU).

Covers the GAN branch of `cosyvoice_tpu/bin/train.py` (reference
`cosyvoice/bin/train.py:39-158` with --model hifigan routed through
`utils/executor.py:84-140` train_one_epoc_gan).
"""
import json
import os
import sys

import numpy as np
import pytest


def _write_data(tmp_path, n=2, seconds=0.65, sr=24000):
    rng = np.random.default_rng(7)
    jsonl = tmp_path / "data.jsonl"
    with open(jsonl, "w") as f:
        for i in range(n):
            wav = (rng.standard_normal(int(sr * seconds)) * 0.1).tolist()
            f.write(json.dumps({
                "utt": f"u{i}", "text": "hello world",
                "speech": wav, "sample_rate": sr,
                "speech_token": rng.integers(0, 100, 30).tolist(),
                "embedding": rng.standard_normal(512).tolist(),
            }) + "\n")
    lst = tmp_path / "train.list"
    lst.write_text(str(jsonl) + "\n")
    return str(lst)


def test_train_cli_gan_hift(tmp_path, monkeypatch):
    import yaml

    conf = {
        "hift": {"kind": "hift", "base_channels": 32, "nb_harmonics": 1,
                 "f0_cond_channels": 8,
                 "resblock_kernel_sizes": [3],
                 "resblock_dilation_sizes": [[1]],
                 "source_resblock_kernel_sizes": [3, 3, 3],
                 "source_resblock_dilation_sizes": [[1], [1], [1]]},
        "gan_conf": {"discriminator": "mpd",
                     "discriminator_conf": {"periods": [2, 3]}},
        "data": {"filter": {"max_length": 40960, "token_max_length": 300},
                 "max_frames_in_batch": 200},
        "train_conf": {"lr": 1e-4, "lr_d": 1e-4, "save_per_step": 2,
                       "log_interval": 1},
    }
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))
    lst = _write_data(tmp_path)
    model_dir = str(tmp_path / "exp_hift")

    from cosyvoice_tpu.bin import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train", "--config", str(cfg_path), "--model", "hift",
        "--train_data", lst, "--model_dir", model_dir, "--epochs", "1"])
    train_cli.main()

    metrics = [json.loads(l) for l in open(os.path.join(model_dir,
                                                        "metrics.jsonl"))]
    assert metrics, "no metrics logged"
    last = metrics[-1]
    for k in ("loss", "d_loss", "loss_mel", "loss_f0"):
        assert np.isfinite(last[k]), (k, last)
    # both nets checkpointed
    from cosyvoice_tpu.train.checkpoint import latest_step
    assert latest_step(model_dir) is not None
    assert latest_step(model_dir + "_disc") is not None


def test_transcribe_stage_injects_text():
    from cosyvoice_tpu.data.transcriber import transcribe_stage

    samples = [{"txt": "", "speech": [0.0], "sample_rate": 16000},
               {"txt": "already", "speech": [0.0], "sample_rate": 16000}]
    out = list(transcribe_stage(transcriber=lambda w, sr: "asr text")(iter(samples)))
    assert out[0]["txt"] == "asr text"
    assert out[1]["txt"] == "already"
