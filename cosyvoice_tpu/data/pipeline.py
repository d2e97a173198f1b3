"""Composable streaming data pipeline for training (host-side, numpy).

Behavioral spec: reference `cosyvoice/dataset/dataset.py` (DataList shard
list + rank->worker partition + Processor generator chain, :52-164) and
`cosyvoice/dataset/processor.py` (filter:59, resample:111, compute_fbank:160,
tokenize:221, shuffle:240, sort:264, static_batch:292, dynamic_batch:312,
padding:355).  TPU-first: emits right-padded fixed-bucket numpy batches ready
for `shard_batch` (no torch, no DataLoader workers — stages are generator
transforms composed functionally; parallelism comes from the data mesh axis,
sharded per-host by `shard(rank, world)`).
"""
from __future__ import annotations

import json
import random
from typing import Callable, Iterable, Iterator

import numpy as np

from cosyvoice_tpu.ops.mel import log_mel_spectrogram


class Pipeline:
    """source iterable + chain of generator transforms."""

    def __init__(self, source: Iterable, *stages: Callable):
        self.source = source
        self.stages = list(stages)

    def map(self, stage: Callable) -> "Pipeline":
        return Pipeline(self.source, *self.stages, stage)

    def __iter__(self) -> Iterator:
        it = iter(self.source)
        for stage in self.stages:
            it = stage(it)
        return it


def shard_list(items: list, rank: int, world_size: int, shuffle: bool = True,
               seed: int = 0, epoch: int = 0) -> list:
    """Partition the shard list across hosts (dataset.py:52-105 semantics)."""
    items = list(items)
    if shuffle:
        random.Random(seed + epoch).shuffle(items)
    return items[rank::world_size]


# ---- stages (each: iterator -> iterator) ---------------------------------

def jsonl_opener(it):
    """lines of json files -> sample dicts (dataset_jsondata-style lists).

    'speech' may be an inline list (tests/tiny sets) or a wav path."""
    for path in it:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                s = json.loads(line)
                if isinstance(s.get("speech"), str):
                    from cosyvoice_tpu.bin.inference import read_wav

                    s["speech"], s["sample_rate"] = read_wav(s["speech"])
                elif isinstance(s.get("speech"), list):
                    s["speech"] = np.asarray(s["speech"], np.float32)
                yield s


def filter_samples(max_length=10240, min_length=10, token_max_length=200,
                   token_min_length=1, min_output_input_ratio=0.0005,
                   max_output_input_ratio=30.0):
    """Length/ratio gates (processor.py:59-108); lengths in 10ms frames."""

    def stage(it):
        for s in it:
            dur_frames = len(s["speech"]) / s["sample_rate"] * 100
            if not (min_length <= dur_frames <= max_length):
                continue
            if "text_token" in s:
                n = len(s["text_token"])
                if not (token_min_length <= n <= token_max_length):
                    continue
                r = n / dur_frames
                if not (min_output_input_ratio <= r <= max_output_input_ratio):
                    continue
            yield s

    return stage


def resample(target_sr=24000, min_sample_rate=16000):
    def stage(it):
        from cosyvoice_tpu.runtime.frontend import resample_poly

        for s in it:
            sr = s["sample_rate"]
            if sr != target_sr:
                if sr < min_sample_rate:
                    continue
                s["speech"] = resample_poly(s["speech"], sr, target_sr)
                s["sample_rate"] = target_sr
            peak = np.abs(s["speech"]).max()
            if peak > 1.0:  # peak normalize (processor.py:131-134)
                s["speech"] = s["speech"] / peak
            yield s

    return stage


def compute_fbank(n_fft=1920, hop=480, n_mels=80, sr=24000):
    """Canonical log-mel (processor_kaldidata.mel_spectrogram) -> [T, n_mels]."""

    def stage(it):
        for s in it:
            mel = log_mel_spectrogram(s["speech"][None], n_fft=n_fft,
                                      n_mels=n_mels, sr=sr, hop=hop, win=n_fft)
            s["speech_feat"] = np.asarray(mel)[0].T.astype(np.float32)
            yield s

    return stage


def tokenize(tokenizer):
    def stage(it):
        for s in it:
            s["text_token"] = np.asarray(tokenizer.encode(s["text"]), np.int32)
            yield s

    return stage


def parquet_opener(it):
    """v1 parquet corpus source (reference `dataset/processor.py:29-57`),
    via the pure-python reader in data/parquet_io.py."""
    from cosyvoice_tpu.data.parquet_io import parquet_opener as _po

    yield from _po(it)


def decode_audio_bytes():
    """'audio_data' (in-row WAV bytes, the v1 parquet layout) -> float
    speech + sample_rate (reference loads via torchaudio in resample)."""
    import io
    import wave

    def stage(it):
        for s in it:
            if "audio_data" in s and "speech" not in s:
                # non-PCM-WAV bytes (flac/opus/mp3 — the reference decodes
                # via torchaudio) drop the SAMPLE, not the epoch, mirroring
                # parquet_opener's per-shard error guard
                try:
                    with wave.open(io.BytesIO(s["audio_data"])) as w:
                        sr = w.getframerate()
                        data = np.frombuffer(w.readframes(w.getnframes()),
                                             dtype=np.int16)
                        if w.getnchannels() > 1:
                            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
                except (wave.Error, EOFError, ValueError) as e:
                    import logging
                    logging.warning("decode_audio_bytes: dropping %s (%s)",
                                    s.get("utt", "<sample>"), e)
                    continue
                s = dict(s, speech=data.astype(np.float32) / 32768.0,
                         sample_rate=sr)
                s.pop("audio_data")
            yield s

    return stage


def parse_embedding(normalize: bool = True):
    """utt_embedding / spk_embedding list columns -> float32 vectors,
    L2-normalized like the reference (`processor.py:203-218`); 'embedding'
    aliases utt_embedding for the padding stage's utt-level default."""

    def stage(it):
        for s in it:
            for k in ("utt_embedding", "spk_embedding"):
                if k in s:
                    v = np.asarray(s[k], np.float32)
                    if normalize:
                        v = v / max(float(np.linalg.norm(v)), 1e-12)
                    s[k] = v
            if "utt_embedding" in s:
                s.setdefault("embedding", s["utt_embedding"])
            yield s

    return stage


def truncate_phoneme_sequence(prob: float = 0.5, prosody_weights=None,
                              prosody_len=None, min_len: int = 2,
                              min_dur: float = 0.08, seed: int = 0):
    """MFA-duration-aligned random crop at a prosody boundary
    (reference `processor_kaldidata.py:217-262`): with probability `prob`,
    pick a #1/#2/#3 prosody mark (index > min_len, weighted), cut the audio
    at the summed MFA duration, append the mark's silence, and keep only the
    phonemes up to the cut.  Samples whose durations disagree with the audio
    (> 0.2 s) or whose phoneme/duration counts differ are DROPPED (reference
    'continue's without yielding).  Needs 'phoneme' + 'durations' fields
    (spk-json corpora); passes through samples without them."""
    prosody_weights = prosody_weights or {"#1": 0.5, "#2": 1.0, "#3": 1.0}
    prosody_len = prosody_len or {"#1": 0.001, "#2": 0.25, "#3": 0.35}

    def stage(it):
        r = random.Random(seed)
        for s in it:
            pho, dur = s.get("phoneme"), s.get("durations")
            if pho is None or dur is None:
                yield s
                continue
            if isinstance(pho, str):
                pho = pho.split()
            wav, sr = s["speech"], s["sample_rate"]
            if r.random() < prob:
                if len(wav) / sr - float(np.sum(dur)) > 0.2:
                    continue  # MFA duration does not match the audio: drop
                if len(pho) != len(dur):
                    continue  # phoneme/duration length mismatch: drop
                idxs = [i for i, x in enumerate(pho)
                        if x in prosody_weights and i > min_len]
                if idxs:
                    i = r.choices(idxs, [prosody_weights[pho[j]] for j in idxs])[0]
                    d = float(np.sum(np.asarray(dur[: i + 1], np.float64)))
                    if d > min_dur:
                        wav = np.pad(wav[: int(d * sr)],
                                     (0, int(prosody_len[pho[i]] * sr)))
                        pho = pho[: i + 1]
            out = dict(s, phoneme=pho, speech=wav)
            out.pop("durations", None)
            yield out

    return stage


def tokenize_phoneme(tokenizer, drop_bad: bool = True):
    """phoneme strings -> 4-way factored id streams
    (reference `processor_kaldidata.py:342-380`): pho_token / text_tone /
    text_lang / text_prsd on the sample; unknown phonemes drop the sample
    (reference logs + 'continue's)."""
    import logging as _logging

    def stage(it):
        for s in it:
            pho = s.get("phoneme")
            if pho is None:
                yield s
                continue
            if isinstance(pho, str):
                pho = pho.split()
            try:
                pho_ids, tone_ids, lang_ids, prsd_ids = tokenizer.encode(pho)
            except (KeyError, ValueError, IndexError) as e:
                _logging.warning("%s: phoneme encode failed (%s) — dropped",
                                 s.get("utt", "?"), e)
                if drop_bad:
                    continue
                raise
            yield dict(s, pho_token=pho_ids, text_tone=tone_ids,
                       text_lang=lang_ids, text_prsd=prsd_ids)

    return stage


def shuffle(buf_size=10000, seed=0):
    def stage(it):
        rng = random.Random(seed)
        buf = []
        for s in it:
            buf.append(s)
            if len(buf) >= buf_size:
                rng.shuffle(buf)
                yield from buf
                buf = []
        rng.shuffle(buf)
        yield from buf

    return stage


def sort_by_feat_len(buf_size=500):
    """Local sort so batches have homogeneous lengths (processor.py:264-290)."""

    def stage(it):
        buf = []
        for s in it:
            buf.append(s)
            if len(buf) >= buf_size:
                buf.sort(key=lambda x: x["speech_feat"].shape[0])
                yield from buf
                buf = []
        buf.sort(key=lambda x: x["speech_feat"].shape[0])
        yield from buf

    return stage


def static_batch(batch_size=8, drop_last=False):
    """Fixed-size batches (processor.py:292-309).  `drop_last=True` is
    required for multi-host training: every process must contribute the
    same local batch size to `shard_batch`'s global array assembly."""

    def stage(it):
        buf = []
        for s in it:
            buf.append(s)
            if len(buf) >= batch_size:
                yield buf
                buf = []
        if buf and not drop_last:
            yield buf

    return stage


def dynamic_batch(max_frames_in_batch=2000):
    """Batch until total padded frames exceed the cap (processor.py:312-352)."""

    def stage(it):
        buf, longest = [], 0
        for s in it:
            n = s["speech_feat"].shape[0]
            longest = max(longest, n)
            if longest * (len(buf) + 1) > max_frames_in_batch and buf:
                yield buf
                buf, longest = [], n
            buf.append(s)
        if buf:
            yield buf

    return stage


def _pad_to(arrs: list[np.ndarray], length: int, value=0) -> np.ndarray:
    out = np.full((len(arrs), length) + arrs[0].shape[1:], value,
                  dtype=arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out


def round_up(n, m):
    return ((n + m - 1) // m) * m


def padding(use_spk_embedding=False, gan=False, bucket_multiple=32,
            static_lens: dict | None = None):
    """list of samples -> padded numpy batch dict (processor.py:355-431).

    Lengths are rounded UP to `bucket_multiple` so the jit sees a small set
    of static shapes (the TPU replacement for torch's per-batch dynamic pad).
    `static_lens` pins FIXED padded lengths per key (e.g. {"speech_feat": 512,
    "speech_token": 256, "text_token": 64}) — required for multi-host
    training, where every process must compile the identical program; pair it
    with `filter_samples` caps so no sample exceeds its pin.
    """
    static_lens = static_lens or {}

    def pad_len(key, longest, multiple):
        if key in static_lens:
            assert longest <= static_lens[key], (
                f"{key}: sample length {longest} exceeds static_lens pin "
                f"{static_lens[key]} — tighten filter_samples")
            return static_lens[key]
        return round_up(longest, multiple)

    def stage(it):
        for samples in it:
            samples = sorted(samples, key=lambda s: s["speech_feat"].shape[0],
                             reverse=True)
            batch = {"utts": [s.get("utt", "") for s in samples]}
            feat_len = np.asarray([s["speech_feat"].shape[0] for s in samples], np.int32)
            L = pad_len("speech_feat", int(feat_len.max()), bucket_multiple)
            batch["speech_feat"] = _pad_to([s["speech_feat"] for s in samples], L)
            batch["speech_feat_len"] = feat_len
            if "speech_token" in samples[0]:
                tok_len = np.asarray([len(s["speech_token"]) for s in samples], np.int32)
                Lt = pad_len("speech_token", int(tok_len.max()), bucket_multiple // 2)
                batch["speech_token"] = _pad_to(
                    [np.asarray(s["speech_token"], np.int32) for s in samples], Lt)
                batch["speech_token_len"] = tok_len
            if "text_token" in samples[0]:
                txt_len = np.asarray([len(s["text_token"]) for s in samples], np.int32)
                Lx = pad_len("text_token", int(txt_len.max()), 8)
                batch["text_token"] = _pad_to(
                    [np.asarray(s["text_token"], np.int32) for s in samples], Lx)
                batch["text_token_len"] = txt_len
            if "text_tone" in samples[0]:
                # factored phoneme ids -> pho_token [B, T, 4]
                # (reference processor_kaldidata.py:556-574)
                pho_len = np.asarray([len(s["pho_token"]) for s in samples],
                                     np.int32)
                Lp = pad_len("pho_token", int(pho_len.max()), 8)
                streams = [
                    _pad_to([np.asarray(s[k], np.int32) for s in samples], Lp)
                    for k in ("pho_token", "text_tone", "text_lang", "text_prsd")]
                batch["pho_token"] = np.stack(streams, axis=-1)
                batch["pho_token_len"] = pho_len
            if "embedding" in samples[0]:
                key = "spk_embedding" if use_spk_embedding else "embedding"
                batch["embedding"] = np.stack(
                    [np.asarray(s.get(key, s["embedding"]), np.float32) for s in samples])
            if gan:
                # align waveform padding with the mel padding (L frames x hop
                # samples) so vocoder output and real speech share a static
                # length; the tail beyond L*hop never has a mel frame anyway
                hop = gan if not isinstance(gan, bool) else 480
                Ls = L * hop
                sp_len = np.minimum(
                    np.asarray([len(s["speech"]) for s in samples], np.int32), Ls)
                batch["speech"] = _pad_to(
                    [np.asarray(s["speech"][:Ls], np.float32) for s in samples], Ls)
                batch["speech_len"] = sp_len
                if "pitch_feat" in samples[0]:
                    batch["pitch_feat"] = _pad_to(
                        [np.asarray(s["pitch_feat"], np.float32)
                         for s in samples], L)
            yield batch

    return stage


# ---- alternative dataset sources (reference dataset_* variants) -----------

def kaldi_dir_source(data_dir: str):
    """wav.scp/text/utt2spk directory source
    (reference `dataset_kaldidata.py:155-246`)."""
    import os

    def read_map(name):
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            return {}
        out = {}
        for line in open(path):
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
        return out

    wavs = read_map("wav.scp")
    texts = read_map("text")
    utt2spk = read_map("utt2spk")
    from cosyvoice_tpu.bin.inference import read_wav

    for utt, path in wavs.items():
        wav, sr = read_wav(path)
        yield {"utt": utt, "speech": wav, "sample_rate": sr,
               "text": texts.get(utt, ""), "spk": utt2spk.get(utt, utt)}


def spk_json_source(json_paths: list, rng_seed: int = 0,
                    rich_sample_short_utt: bool = False):
    """Speaker-keyed JSON source (reference `dataset_jsondata.py:29-332`):
    each file maps spk -> list of {utt, wav, duration, text|phoneme, ...};
    weighted list entries [path, en_flag, weight] are expanded upstream."""
    import json as _json
    import random as _random

    r = _random.Random(rng_seed)
    from cosyvoice_tpu.bin.inference import read_wav

    for path in json_paths:
        with open(path) as f:
            data = _json.load(f)
        items = []
        for spk, utts in data.items():
            for u in utts:
                items.append((spk, u))
        r.shuffle(items)
        for spk, u in items:
            wav, sr = read_wav(u["wav"])
            sample = {"utt": u.get("utt", u["wav"]), "speech": wav,
                      "sample_rate": sr, "spk": spk,
                      "text": u.get("text", "")}
            if "phoneme" in u:
                sample["phoneme"] = u["phoneme"]
            if "durations" in u:
                sample["durations"] = u["durations"]
            if "embedding" in u:
                # offline speaker vector (reference get_codec_and_spkemb's
                # offline spk-vec cache path, train_utils.py:459-545)
                sample["embedding"] = np.asarray(u["embedding"], np.float32)
            yield sample
            if rich_sample_short_utt and len(wav) / sr < 2.0:
                yield dict(sample)  # oversample short utterances


def truncate(max_seconds: float = 30.0):
    """Random-crop long audio (processor.py:139-158)."""
    import random as _random

    def stage(it):
        for s in it:
            limit = int(max_seconds * s["sample_rate"])
            if len(s["speech"]) > limit:
                start = _random.randint(0, len(s["speech"]) - limit)
                s["speech"] = s["speech"][start: start + limit]
            yield s

    return stage


def compute_f0(sr=24000, frame=1024, hop=480):
    """Pitch targets interpolated to mel length (processor.py:182-200)."""

    def stage(it):
        from cosyvoice_tpu.ops.f0 import autocorr_f0, interp_to_len
        import jax.numpy as jnp

        for s in it:
            f0 = autocorr_f0(jnp.asarray(s["speech"]), sr=sr, frame=frame, hop=hop)
            s["pitch_feat"] = np.asarray(
                interp_to_len(f0, s["speech_feat"].shape[0]), np.float32)
            yield s

    return stage
