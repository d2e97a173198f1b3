"""Batch inference CLI with RTF logging.

Behavioral spec: reference `cosyvoice/bin/inference.py:30-115` and
`inference_online_codec.py:34-147`: read prompt utterances + tts_text lines,
synthesize each, write wavs + per-utterance RTF (the de-facto benchmark,
SURVEY.md section 4).

Input format: a jsonl file with one request per line:
  {"utt": "id", "tts_text": "...", "prompt_text": "...",
   "prompt_wav": "path.wav (16 kHz mono)"}
"""
from __future__ import annotations

import argparse
import json
import os
import time
import wave

import numpy as np


def read_wav(path: str) -> tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
    return (data.astype(np.float32) / 32768.0, sr)


def write_wav(path: str, wav: np.ndarray, sr: int) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", required=True)
    p.add_argument("--requests", required=True, help="jsonl request file")
    p.add_argument("--result_dir", required=True)
    p.add_argument("--mode", default="zero_shot",
                   choices=["zero_shot", "cross_lingual", "sft"])
    p.add_argument("--stream", action="store_true")
    args = p.parse_args()

    from cosyvoice_tpu.runtime.api import from_pretrained
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cv = from_pretrained(args.model_dir)
    os.makedirs(args.result_dir, exist_ok=True)
    rtf_lines = []
    for line in open(args.requests):
        req = json.loads(line)
        wav16, sr = read_wav(req["prompt_wav"])
        assert sr == 16000, "prompt wavs must be 16 kHz"
        t0 = time.time()
        if args.mode == "zero_shot":
            outs = cv.inference_zero_shot(req["tts_text"], req["prompt_text"],
                                          wav16, stream=args.stream)
        elif args.mode == "cross_lingual":
            outs = cv.inference_cross_lingual(req["tts_text"], wav16,
                                              stream=args.stream)
        else:
            outs = cv.inference_sft(req["tts_text"], req["spk_id"],
                                    stream=args.stream)
        wav = np.concatenate([o["tts_speech"] for o in outs])
        dt = time.time() - t0
        dur = len(wav) / cv.sample_rate
        rtf = dt / max(dur, 1e-6)
        rtf_lines.append(f"{req['utt']} rtf {rtf:.4f} dur {dur:.2f}")
        print(rtf_lines[-1], flush=True)
        write_wav(os.path.join(args.result_dir, f"{req['utt']}.wav"), wav,
                  cv.sample_rate)
    with open(os.path.join(args.result_dir, "rtf.log"), "w") as f:
        f.write("\n".join(rtf_lines) + "\n")


if __name__ == "__main__":
    main()
