"""Offline speaker-vector extraction (reference bin/extract_speaker_vec.py):
wav list -> .npy vectors for the offline-embedding training path."""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_scp", required=True, help="utt -> wav path (24 kHz)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ckpt", default=None, help=".pt SpeakerEmbedding ckpt")
    args = p.parse_args()

    import jax

    from cosyvoice_tpu.bin.inference import read_wav
    from cosyvoice_tpu.models.speaker import (SpeakerEmbedding,
                                              import_speaker_embedding_torch,
                                              speaker_embed)

    model = SpeakerEmbedding()
    if args.ckpt:
        import torch

        variables = import_speaker_embedding_torch(
            torch.load(args.ckpt, map_location="cpu"), model.cfg)
    else:
        raise SystemExit("--ckpt required (random vectors are useless)")
    os.makedirs(args.out_dir, exist_ok=True)
    for line in open(args.wav_scp):
        utt, path = line.strip().split(maxsplit=1)
        wav, sr = read_wav(path)
        vec = speaker_embed(model, variables, wav, jax.random.PRNGKey(0))
        np.save(os.path.join(args.out_dir, f"{utt}.npy"), vec)
        print(utt)


if __name__ == "__main__":
    main()
