"""Online-codec training: labels computed on-device during training.

Behavioral spec: reference `cosyvoice/utils/executor_online_codec.py:39-196` +
`utils/train_utils.py:434-585` (init_codec_and_embed_model /
get_codec_and_spkemb): each batch runs the FROZEN s3 speech tokenizer over
the batch audio to produce the speech-token targets, and the frozen
SpeakerEmbedding over a 10 s random crop (repeat-padded if shorter,
train_utils.py:546-568) to produce speaker vectors — i.e. no offline label
extraction pass.

TPU-native: both label models are jitted pure functions folded into the same
device queue as the train step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def random_crop_or_repeat(wav: np.ndarray, target_len: int,
                          rng: np.random.Generator) -> np.ndarray:
    """10 s crop for speaker-vector extraction; repeat-pad short audio
    (train_utils.py:546-568)."""
    if len(wav) >= target_len:
        start = int(rng.integers(0, len(wav) - target_len + 1))
        return wav[start: start + target_len]
    reps = -(-target_len // len(wav))
    return np.tile(wav, reps)[:target_len]


@dataclass
class OnlineCodecLabeler:
    """Frozen label models: wav -> (speech tokens, speaker vec)."""

    s3_model: object                 # models.s3tokenizer.S3TokenizerV2
    s3_params: dict
    spk_model: Optional[object] = None   # models.speaker.SpeakerEmbedding
    spk_params: Optional[dict] = None
    spk_crop_seconds: float = 10.0
    sample_rate: int = 24000

    def __post_init__(self):
        from cosyvoice_tpu.models.s3tokenizer import S3TokenizerV2

        s3 = self.s3_model

        @jax.jit
        def _tokenize(mel, mel_len):
            return s3.apply(self.s3_params, mel, mel_len)

        self._tokenize = _tokenize

    def label_batch(self, batch: dict, rng: np.random.Generator,
                    jrng) -> dict:
        """Adds speech_token(+len) and embedding to a padded audio batch
        ({'speech' [B, S], 'speech_len'})."""
        from cosyvoice_tpu.models.s3tokenizer import whisper_log_mel
        from cosyvoice_tpu.runtime.frontend import resample_poly

        speech = np.asarray(batch["speech"])
        lens = np.asarray(batch["speech_len"])
        B = speech.shape[0]
        wav16 = resample_poly(speech, self.sample_rate, 16000)
        mels, mel_lens = [], []
        for i in range(B):
            n16 = int(lens[i] * 16000 / self.sample_rate)
            mel = whisper_log_mel(jnp.asarray(wav16[i]))
            mels.append(mel)
            mel_lens.append(max(n16 // 160 - 1, 4))
        mel = jnp.stack(mels)
        toks, tok_len = self._tokenize(mel, jnp.asarray(mel_lens))
        batch = dict(batch, speech_token=np.asarray(toks),
                     speech_token_len=np.asarray(tok_len))

        if self.spk_model is not None:
            from cosyvoice_tpu.models.speaker import speaker_embed

            crop = int(self.spk_crop_seconds * self.sample_rate)
            embs = []
            for i in range(B):
                w = random_crop_or_repeat(speech[i, : lens[i]], crop, rng)
                embs.append(speaker_embed(self.spk_model, self.spk_params, w,
                                          jrng))
            batch["embedding"] = np.stack(embs)
        return batch


def online_codec_epoch(executor, state, labeler: OnlineCodecLabeler,
                       audio_batches, cv_batches=None, to_device=lambda b: b,
                       seed: int = 0):
    """Executor wrapper: label each audio batch on-device, then step
    (executor_online_codec.train_one_epoc:39-95)."""
    rng = np.random.default_rng(seed)

    def labeled(it):
        for i, b in enumerate(it):
            yield labeler.label_batch(b, rng, jax.random.PRNGKey(seed + i))

    cv = list(labeled(cv_batches)) if cv_batches is not None else None
    return executor.train_one_epoch(state, labeled(audio_batches), cv_data=cv,
                                    to_device=to_device)
