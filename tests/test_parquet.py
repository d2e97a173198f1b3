"""Pure-python Parquet I/O + the v1 parquet training data path.

Round-1 VERDICT missing #6/#10: the reference's v1 corpora are parquet
shards (`dataset/processor.py:29-57`); this image has no pyarrow, so
data/parquet_io.py implements the format subset those files use.
"""
import io
import json
import os
import sys
import wave

import numpy as np
import pytest

from cosyvoice_tpu.data.parquet_io import (read_parquet, snappy_compress,
                                           snappy_decompress, write_parquet)


def _rows(n=3, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rows.append({
            "utt": f"utt_{i}", "spk": "spkA", "text": "你好 hello",
            "audio_data": rng.bytes(100 + i),
            "speech_token": rng.integers(0, 4096, 20 + i).tolist(),
            "utt_embedding": rng.standard_normal(8).tolist(),
            "rate": 22050, "dur": 1.5 + i, "flag": bool(i % 2),
            "maybe": None if i == 1 else "x",
            "empty_list": [] if i == 0 else [1, 2],
        })
    return rows


@pytest.mark.parametrize("codec", ["uncompressed", "snappy"])
def test_parquet_round_trip(tmp_path, codec):
    rows = _rows()
    path = str(tmp_path / f"rt_{codec}.parquet")
    write_parquet(path, rows, codec=codec)
    back = read_parquet(path)
    assert len(back) == len(rows)
    for r, b in zip(rows, back):
        for k, v in r.items():
            if isinstance(v, list):
                assert list(b[k]) == list(v), k
            elif isinstance(v, float):
                assert abs(b[k] - v) < 1e-12, k
            else:
                assert b[k] == v, (k, v, b[k])


def test_snappy_decoder_handles_copies():
    data = b"abcdabcdabcdabcd" * 100 + b"tail"
    assert snappy_decompress(snappy_compress(data)) == data
    # hand-crafted: literal 'abcd' then copy(offset=4, len=8) — the
    # self-overlapping copy form real encoders emit
    hand = bytes([12, 3 << 2]) + b"abcd" + bytes([1 | ((8 - 4) << 2), 4])
    assert snappy_decompress(hand) == b"abcdabcdabcd"


def test_parquet_magic_check(tmp_path):
    p = tmp_path / "bad.parquet"
    p.write_bytes(b"NOPE" + b"\0" * 16)
    with pytest.raises(ValueError, match="not a parquet"):
        read_parquet(str(p))


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_train_cli_v1_llm_from_parquet(tmp_path, monkeypatch):
    """The v1 recipe trains from a 2-row parquet fixture end-to-end:
    parquet rows (wav bytes + offline speech tokens + utt embedding) ->
    decode_audio_bytes -> parse_embedding -> padding -> TransformerLM CE."""
    import yaml

    sr = 22050
    rng = np.random.default_rng(5)
    rows = []
    for i in range(2):
        wav = (rng.standard_normal(int(sr * 0.4)) * 0.1).astype(np.float32)
        rows.append({"utt": f"u{i}", "spk": "s0", "text": "hello world",
                     "audio_data": _wav_bytes(wav, sr),
                     "speech_token": rng.integers(0, 40, 12).tolist(),
                     "utt_embedding": rng.standard_normal(24).tolist(),
                     "spk_embedding": rng.standard_normal(24).tolist()})
    shard = tmp_path / "data.parquet"
    write_parquet(str(shard), rows, codec="snappy")
    lst = tmp_path / "train.list"
    lst.write_text(str(shard) + "\n")

    conf = {
        "llm": {"kind": "transformer_lm",
                "text_encoder_input_size": 24, "llm_input_size": 32,
                "llm_output_size": 32, "text_token_size": 300,
                "speech_token_size": 40, "spk_embed_dim": 24,
                "text_encoder": {"dim": 32, "heads": 2, "linear_units": 48,
                                 "num_blocks": 1, "input_size": 24,
                                 "dropout_rate": 0.0,
                                 "attention_dropout_rate": 0.0,
                                 "static_chunk_size": 1},
                "llm": {"dim": 32, "heads": 2, "linear_units": 48,
                        "num_blocks": 1, "input_size": 32,
                        "dropout_rate": 0.0, "attention_dropout_rate": 0.0,
                        "static_chunk_size": 1,
                        "input_layer": "linear_legacy",
                        "activation": "relu"}},
        "data": {"sample_rate": sr,
                 "fbank": {"n_fft": 256, "hop": 64, "n_mels": 20, "sr": sr},
                 "filter": {"max_length": 99999, "token_max_length": 300},
                 "batch_type": "static", "batch_size": 2,
                 "shuffle_buf": 4, "sort_buf": 2},
        "train_conf": {"lr": 1e-4, "log_interval": 1,
                       "scheduler_conf": {"warmup_steps": 10}},
    }
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))
    model_dir = str(tmp_path / "exp_v1")

    from cosyvoice_tpu.bin import train as train_cli

    monkeypatch.setattr(sys, "argv", [
        "train", "--config", str(cfg_path), "--model", "llm",
        "--train_data", str(lst), "--model_dir", model_dir,
        "--data_format", "parquet", "--epochs", "1", "--mesh_data", "1"])
    train_cli.main()

    metrics = [json.loads(l) for l in open(os.path.join(model_dir,
                                                        "metrics.jsonl"))]
    assert metrics and np.isfinite(metrics[-1]["loss"])
    from cosyvoice_tpu.train.checkpoint import latest_step
    assert latest_step(model_dir) is not None
