"""Batched serving: the TPU-native replacement for the vLLM / sglang / CUDA-
graph serving backends.

The reference accelerates LLM decode with external engines
(`cosyvoice/llm/llm.py:2094-2716` sglang/vLLM variants,
`llm/qwen2_5.py`+`qwen2_infer.py` CUDA-graph decode, `vllm/cosyvoice2.py`
plugin).  On TPU all of that collapses into the padded-batch one-jit decode:
the per-step cost is HBM-bandwidth on the (bf16) weights, shared by every
sequence in the batch, so batch-B serving multiplies throughput nearly Bx
(see bench.py: 28x real-time single stream vs 55x at B=8 on one v5e chip).

`BatchedSynthesizer` is the serving core: collect requests, right-pad to
shared buckets, run batched LLM -> flow -> vocoder, return per-request wavs.
A network front-end (gRPC/HTTP) wraps `synthesize_batch` unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec
from cosyvoice_tpu.models.hift import HiFTGenerator
from cosyvoice_tpu.models.llm import lm_generate
from cosyvoice_tpu.runtime.model import CosyVoice2Model, round_up


@dataclass
class TTSRequest:
    text_tokens: np.ndarray            # prompt_text ++ text ids
    prompt_text_len: int
    prompt_speech_tokens: np.ndarray
    prompt_feat: np.ndarray            # [P, 80]
    embedding: np.ndarray              # [spk_dim]


@dataclass
class BatchedSynthesizer:
    model: CosyVoice2Model
    text_bucket: int = 32              # pad text lengths to multiples
    speech_bucket: int = 64

    def synthesize_batch(self, requests: Sequence[TTSRequest],
                         rng=None) -> list[np.ndarray]:
        """Synthesize B requests concurrently (non-streaming)."""
        m = self.model
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        B = len(requests)
        Tt = round_up(max(len(r.text_tokens) for r in requests), self.text_bucket)
        Ts = round_up(max((len(r.prompt_speech_tokens) for r in requests),
                          default=0) or 1, self.speech_bucket)
        text = np.zeros((B, Tt), np.int32)
        tlen = np.zeros(B, np.int32)
        psp = np.zeros((B, Ts), np.int32)
        plen = np.zeros(B, np.int32)
        min_len = np.zeros(B, np.int32)
        max_len = np.zeros(B, np.int32)
        for i, r in enumerate(requests):
            n = len(r.text_tokens)
            text[i, :n] = r.text_tokens
            tlen[i] = n
            k = len(r.prompt_speech_tokens)
            psp[i, :k] = r.prompt_speech_tokens
            plen[i] = k
            new_text = n - r.prompt_text_len
            min_len[i] = int(new_text * m.llm.cfg.min_token_text_ratio)
            max_len[i] = min(int(new_text * m.llm.cfg.max_token_text_ratio),
                             m.max_decode_tokens)
        cap = m.max_decode_tokens
        cache_len = round_up(2 + Tt + Ts + cap, 128)
        out, count = lm_generate(m.llm, m.llm_params, jnp.asarray(text),
                                 jnp.asarray(tlen), jnp.asarray(psp),
                                 jnp.asarray(plen), jnp.asarray(min_len),
                                 jnp.asarray(max_len), rng, max_steps=cap,
                                 cache_len=cache_len)
        out = np.asarray(out)
        count = np.asarray(count)
        # flow + vocoder per request (prompt shapes differ); device queue
        # overlaps these dispatches
        wavs = []
        for i, r in enumerate(requests):
            tokens = out[i, : count[i]]
            session = {"hift": None}
            wavs.append(m.token2wav(tokens, r.prompt_speech_tokens,
                                    r.prompt_feat, r.embedding, 0, session,
                                    finalize=True))
        return wavs
