"""Frontend: text -> tokens, prompt audio -> (speech tokens, mel, spk vec).

Behavioral spec: reference `cosyvoice/cli/frontend.py:37-195`
(CosyVoiceFrontEnd).  The reference runs two frozen ONNX models (s3tokenizer
speech tokenizer, CAMPPlus speaker vec); here those are injected callables —
use the native JAX ports (models/campplus, models/s3tokenizer) or any
function with the same contract.  The canonical 24 kHz mel comes from
ops/mel.  Zero-shot enforces feat == 2 * token length at 24 kHz
(frontend.py:147-151).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from cosyvoice_tpu.ops.mel import log_mel_spectrogram
from cosyvoice_tpu.runtime import textnorm


def resample_poly(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    from scipy.signal import resample_poly as _rp
    from math import gcd

    g = gcd(orig_sr, new_sr)
    return _rp(x, new_sr // g, orig_sr // g, axis=-1).astype(np.float32)


@dataclass
class CosyVoiceFrontEnd:
    tokenizer: object                      # TextTokenizer
    speech_tokenizer: Optional[Callable] = None   # wav16k [S] -> token ids [T]
    spk_embedder: Optional[Callable] = None       # wav16k [S] -> vec [D]
    spk2info: dict = field(default_factory=dict)  # spk_id -> {'embedding': vec}
    sample_rate: int = 24000
    n_mels: int = 80
    mel_n_fft: int = 1920
    mel_hop: int = 480
    text_normalizer: Optional[Callable] = None    # text -> list[str] override

    # ---- pieces ------------------------------------------------------

    def _extract_text_token(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text), np.int32)

    def _extract_speech_feat(self, speech_resampled: np.ndarray) -> np.ndarray:
        mel = log_mel_spectrogram(speech_resampled[None], n_fft=self.mel_n_fft,
                                  n_mels=self.n_mels, sr=self.sample_rate,
                                  hop=self.mel_hop, win=self.mel_n_fft,
                                  fmax=min(8000.0, self.sample_rate / 2))
        return np.asarray(mel)[0].T  # [T, 80]

    def _extract_speech_token(self, speech_16k: np.ndarray) -> np.ndarray:
        assert self.speech_tokenizer is not None, "no speech tokenizer wired"
        assert len(speech_16k) / 16000 <= 30, "prompt audio must be <= 30 s"
        return np.asarray(self.speech_tokenizer(speech_16k), np.int32)

    def _extract_spk_embedding(self, speech_16k: np.ndarray) -> np.ndarray:
        assert self.spk_embedder is not None, "no speaker embedder wired"
        return np.asarray(self.spk_embedder(speech_16k), np.float32)

    def text_normalize(self, text: str, split: bool = True):
        if self.text_normalizer is not None:
            return self.text_normalizer(text, split)
        return textnorm.basic_normalize(text, self.tokenizer.encode, split)

    # ---- per-mode input builders (frontend.py:135-195) ---------------

    def frontend_sft(self, tts_text: str, spk_id: str) -> dict:
        emb = np.asarray(self.spk2info[spk_id]["embedding"], np.float32)
        return {"text": self._extract_text_token(tts_text),
                "llm_embedding": emb, "flow_embedding": emb}

    def frontend_zero_shot(self, tts_text: str, prompt_text: str,
                           prompt_speech_16k: np.ndarray) -> dict:
        text = self._extract_text_token(tts_text)
        ptext = self._extract_text_token(prompt_text)
        resampled = resample_poly(prompt_speech_16k, 16000, self.sample_rate)
        feat = self._extract_speech_feat(resampled)
        token = self._extract_speech_token(prompt_speech_16k)
        if self.sample_rate == 24000:
            n = min(feat.shape[0] // 2, len(token))
            feat, token = feat[: 2 * n], token[:n]
        emb = self._extract_spk_embedding(prompt_speech_16k)
        return {"text": text, "prompt_text": ptext,
                "llm_prompt_speech_token": token,
                "flow_prompt_speech_token": token,
                "prompt_speech_feat": feat,
                "llm_embedding": emb, "flow_embedding": emb}

    def frontend_cross_lingual(self, tts_text: str,
                               prompt_speech_16k: np.ndarray) -> dict:
        d = self.frontend_zero_shot(tts_text, "", prompt_speech_16k)
        d.pop("prompt_text")
        d.pop("llm_prompt_speech_token")
        return d

    def frontend_instruct2(self, tts_text: str, instruct_text: str,
                           prompt_speech_16k: np.ndarray) -> dict:
        d = self.frontend_zero_shot(tts_text, instruct_text + "<|endofprompt|>",
                                    prompt_speech_16k)
        d.pop("llm_prompt_speech_token")
        return d

    def frontend_instruct(self, tts_text: str, spk_id: str,
                          instruct_text: str) -> dict:
        """v1 instruct mode (frontend.py:171-178): sft inputs minus the llm
        spk embedding (information leakage), instruct text as prompt."""
        d = self.frontend_sft(tts_text, spk_id)
        d.pop("llm_embedding")
        d["prompt_text"] = self._extract_text_token(instruct_text + "<endofprompt>")
        return d

    def frontend_vc(self, source_speech_16k: np.ndarray,
                    prompt_speech_16k: np.ndarray) -> dict:
        ptoken = self._extract_speech_token(prompt_speech_16k)
        resampled = resample_poly(prompt_speech_16k, 16000, self.sample_rate)
        feat = self._extract_speech_feat(resampled)
        emb = self._extract_spk_embedding(prompt_speech_16k)
        return {"source_speech_token": self._extract_speech_token(source_speech_16k),
                "flow_prompt_speech_token": ptoken,
                "prompt_speech_feat": feat, "flow_embedding": emb}
