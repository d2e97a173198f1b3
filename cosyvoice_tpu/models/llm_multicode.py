"""Multi-codebook (delay-pattern) phoneme LM — 6 x 40 Hz codec codes per step.

Behavioral spec: reference `cosyvoice/llm/llm.py:1773-2093`
(Qwen2LM_Phoneme_MultiCode): phoneme/text fused by `src_attn_layers` (4)
DecoderLayers; per-codebook embeddings SUMMED into one 896-d input
(:1944-1947); ARDecoder head -> [B, maxid, T, n_codebooks] logits
(`llm/decoder.py:5-21`); FocalLoss(gamma=1) over the delay-patterned targets
(+EOS column); decode samples all codebooks each step, windows of the delay
pattern are reverted and yielded chunk-wise (:2062-2091).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.llm import SamplingConfig
from cosyvoice_tpu.models.llm_phoneme import (DecoderLayer, PhonemeLMConfig,
                                              _PhonemeLMBase)
from cosyvoice_tpu.models.qwen2 import KVCache, causal_prefill_bias
from cosyvoice_tpu.ops import sampling as samp
from cosyvoice_tpu.ops.delay import focal_loss, get_delay_pattern
from cosyvoice_tpu.ops.masks import NEG_INF, make_non_pad_mask


@dataclass(frozen=True)
class MultiCodeLMConfig(PhonemeLMConfig):
    codebooknum: int = 6
    src_attn_layers: int = 4

    @property
    def eos_id(self) -> int:
        return self.speech_token_size

    @property
    def bos_id(self) -> int:
        return self.speech_token_size + 1

    @property
    def max_id(self) -> int:
        return self.speech_token_size + 2  # vocab per codebook (bos+1)


class ARDecoder(nn.Module):
    """hidden [B, T, D] -> logits [B, T, max_id, codebooks] (decoder.py:5-21)."""

    codebooknum: int
    max_id: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        y = nn.Dense(self.codebooknum * self.max_id, name="model")(x)
        return y.reshape(B, T, self.max_id, self.codebooknum)


class Qwen2LMPhonemeMultiCode(_PhonemeLMBase):
    cfg: MultiCodeLMConfig = field(default_factory=MultiCodeLMConfig)

    def _setup_extra(self):
        cfg = self.cfg
        self.src_attention = [DecoderLayer(cfg.llm_input_size, cfg.fusion_heads,
                                           cfg.fusion_ffn, name=f"src_attention_{i}")
                              for i in range(cfg.src_attn_layers)]
        self.code_embeddings = [nn.Embed(cfg.max_id, cfg.llm_input_size,
                                         name=f"code_embed_{i}")
                                for i in range(cfg.codebooknum)]
        self.ar_decoder = ARDecoder(cfg.codebooknum, cfg.max_id,
                                    name="ar_decoder")

    def fuse(self, text, text_len, pho_token, pho_len, deterministic=True):
        pho = self.encode_pho(pho_token, pho_len, deterministic)
        txt = self.llm.embed(text)
        pho_mask = make_non_pad_mask(pho_len, pho.shape[1])[:, None, :]
        txt_mask = make_non_pad_mask(text_len, txt.shape[1])[:, None, :]
        for layer in self.src_attention:
            pho = layer(pho, pho_mask, txt, txt_mask)
        return pho

    def code_emb(self, codes: jax.Array) -> jax.Array:
        """codes [..., N] -> summed embedding [..., D] (llm.py:1944-1947)."""
        e = 0.0
        for i, emb in enumerate(self.code_embeddings):
            e = e + emb(codes[..., i])
        return e

    def decode_logits(self, hidden):
        return self.ar_decoder(hidden)

    def __call__(self, text, text_len, pho_token, pho_len, codes, codes_len,
                 embedding, rng=None, deterministic: bool = True) -> dict:
        """codes [B, T, N] aligned; training applies the delay pattern, feeds
        [sos, spk, fused, task, delayed-code embeddings] and focal-losses the
        delayed targets + trailing EOS column (llm.py:1891-1913,1959-1983)."""
        cfg = self.cfg
        fused = self.fuse(text, text_len, pho_token, pho_len, deterministic)
        delayed = get_delay_pattern(codes, cfg.bos_id, cfg.eos_id)
        d_len = codes_len + cfg.codebooknum - 1
        code_emb = self.code_emb(delayed)
        emb, seq_len = self.build_prefix([(fused, pho_len)], embedding,
                                         jnp.zeros((codes.shape[0], 0), jnp.int32),
                                         jnp.zeros_like(codes_len))
        # graft the code embeddings after the task slot
        B, N0, D = emb.shape
        Td = delayed.shape[1]
        emb = jnp.concatenate([emb, jnp.zeros((B, Td, D), emb.dtype)], axis=1)
        N = emb.shape[1]
        pos = jnp.arange(N)[None, :]
        idx = jnp.clip(pos - seq_len[:, None], 0, Td - 1)
        g = jnp.take_along_axis(code_emb, jnp.broadcast_to(idx, (B, N))[..., None], axis=1)
        in_code = (pos >= seq_len[:, None]) & (pos < (seq_len + d_len)[:, None])
        emb = jnp.where(in_code[..., None], g, emb)
        total_len = seq_len + d_len

        pad = make_non_pad_mask(total_len, N)
        causal = jnp.arange(N)[None, :] <= jnp.arange(N)[:, None]
        bias = jnp.where(causal[None, None] & pad[:, None, None, :], 0.0,
                         NEG_INF).astype(emb.dtype)
        positions = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
        hidden, _ = self.llm(emb, positions, bias)
        logits = self.ar_decoder(hidden)  # [B, N, V, C]

        # target at position p (for p >= seq_len - 1): delayed[p - seq_len + 1]
        # with an EOS row appended (lm_target = pad(delayed, +1 row of eos))
        tgt_idx = jnp.clip(pos - seq_len[:, None] + 1, 0, Td - 1)
        tgt = jnp.take_along_axis(
            delayed, jnp.broadcast_to(tgt_idx, (B, N))[..., None].repeat(cfg.codebooknum, -1),
            axis=1)
        is_eos_row = pos == (seq_len - 1 + d_len)[:, None]
        tgt = jnp.where(is_eos_row[..., None], cfg.eos_id, tgt)
        valid = (pos >= (seq_len - 1)[:, None]) & (pos <= (seq_len - 1 + d_len)[:, None])
        loss = focal_loss(jnp.swapaxes(logits, 2, 3), tgt, gamma=1.0,
                          mask=jnp.broadcast_to(valid[..., None], tgt.shape).astype(jnp.float32))
        return {"loss": loss}

    def prefix_for_decode(self, text, text_len, pho_token, pho_len,
                          prompt_codes, prompt_codes_len, embedding):
        """prompt_codes [B, Tc, N] (aligned, no delay at inference prompt)."""
        fused = self.fuse(text, text_len, pho_token, pho_len)
        emb, seq_len, pos = self._pack([(fused, pho_len)],
                                       tail=prompt_codes.shape[1])
        emb = jnp.where((pos == 1)[..., None], self._spk(embedding), emb)
        ce = self.code_emb(prompt_codes)
        emb = self._finish_pack(emb, pos, seq_len, ce, prompt_codes_len)
        return emb, seq_len + prompt_codes_len


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len"))
def multicode_generate(model: Qwen2LMPhonemeMultiCode, params, text, text_len,
                       pho_token, pho_len, prompt_codes, prompt_codes_len,
                       embedding, max_len, rng, max_steps: int, cache_len: int):
    """AR decode over all codebooks per step (llm.py:2044-2091).  Returns
    (delayed codes [B, max_steps+1, N] incl. leading BOS row, count, done).
    Host code reverts windows with ops.delay.revert_delay_pattern."""
    cfg = model.cfg
    B = text.shape[0]
    Ncb = cfg.codebooknum
    embeds, seq_len = model.apply(params, text, text_len, pho_token, pho_len,
                                  prompt_codes, prompt_codes_len, embedding,
                                  method=Qwen2LMPhonemeMultiCode.prefix_for_decode)
    Tp = embeds.shape[1]
    cache = KVCache.create(cfg.qwen, B, cache_len, dtype=embeds.dtype)
    bias = causal_prefill_bias(Tp, cache_len, seq_len, B, embeds.dtype)
    positions = jnp.broadcast_to(jnp.arange(Tp)[None], (B, Tp))
    hidden, cache = model.apply(params, embeds, positions, bias, cache,
                                method=Qwen2LMPhonemeMultiCode.forward_hidden)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)

    out = jnp.full((B, max_steps + 1, Ncb), cfg.bos_id, jnp.int32)

    def sample_codes(hidden_last, rng):
        logits = model.apply(params, hidden_last,
                             method=Qwen2LMPhonemeMultiCode.decode_logits)
        logp = jax.nn.log_softmax(logits[:, 0].astype(jnp.float32), axis=1)  # [B, V, C]
        logp = jnp.swapaxes(logp, 1, 2)  # [B, C, V]
        rng, k = jax.random.split(rng)
        if cfg.sampling.method == "greedy":
            toks = jnp.argmax(logp, axis=-1)
        else:
            toks = samp.nucleus_sample(k, logp, cfg.sampling.top_p,
                                       cfg.sampling.top_k)
        return toks.astype(jnp.int32), rng  # [B, C]

    class St(NamedTuple):
        cache: KVCache
        prev_emb: jax.Array
        step: jax.Array
        done: jax.Array
        out: jax.Array
        rng: jax.Array

    toks0, rng = sample_codes(last, rng)
    done0 = jnp.all(toks0 == cfg.eos_id, axis=-1)
    out = out.at[:, 1].set(jnp.where(done0[:, None], out[:, 1], toks0))
    emb0 = model.apply(params, toks0[:, None, :],
                       method=Qwen2LMPhonemeMultiCode.code_emb)
    state = St(cache, emb0, jnp.ones((), jnp.int32), done0, out, rng)

    def cond(s):
        return (~jnp.all(s.done)) & (s.step < max_steps) & \
               jnp.all(s.step < max_len)

    def body(s):
        slot = jnp.arange(cache_len)[None, None, None, :]
        valid = (slot < seq_len[:, None, None, None]) | \
                ((slot >= Tp) & (slot <= s.cache.pos))
        bias = jnp.where(valid, 0.0, NEG_INF).astype(s.prev_emb.dtype)
        pos = (seq_len + s.step - 1)[:, None]
        hidden, cache = model.apply(params, s.prev_emb, pos, bias, s.cache,
                                    method=Qwen2LMPhonemeMultiCode.forward_hidden)
        toks, rng = sample_codes(hidden, s.rng)
        done = s.done | jnp.all(toks == cfg.eos_id, axis=-1)
        out = jax.vmap(lambda o, i, t, d: jnp.where(d, o, o.at[i + 1].set(t)),
                       in_axes=(0, None, 0, 0))(s.out, s.step, toks, done)
        emb = model.apply(params, toks[:, None, :],
                          method=Qwen2LMPhonemeMultiCode.code_emb)
        prev = jnp.where(done[:, None, None], s.prev_emb, emb)
        return St(cache, prev, s.step + 1, done, out, rng)

    state = jax.lax.while_loop(cond, body, state)
    return state.out, state.step, state.done
