"""Phoneme-conditioned Qwen2 speech LLMs — the fork's production v2 path.

Behavioral spec: reference `cosyvoice/llm/llm.py` —
  * Qwen2LM_Phoneme (:877-1153): 4-way factored phoneme embeddings
    (phoneme 140/400d + tone 16/64d + lang 2/16d + prosody 6/32d = 512,
    prosody zeroed unless use_frontend_prsd) -> conformer text_encoder ->
    affine to 896; BPE text through Qwen's embed_tokens, randomly zeroed
    (p=text_emb_mask_prob) or dropout(0.2) during training (:1015-1019);
    input [sos, spk, text, pho, task, speech]; target IGNORE x (2+Tt+Tp)
  * Qwen2LM_Phoneme_Src2 (:1450-1772, the production config
    cosyvoice_pho.yaml:26): text & phoneme fused by ONE cross-attention
    DecoderLayer (16-head MHA, ffn 4096; query = phoneme stream); input
    [sos, spk, fused_pho, task, speech]; target IGNORE x (2+Tp)
  * Qwen2LM_Phoneme_Src (:1156-1449): same fusion but query = text stream.

All reference masks reduce to causal+pad inside HF Qwen2 (see llm.py notes),
so these reuse the shared lm_generate_from_embeds loop.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.conformer import ConformerConfig, ConformerEncoder
from cosyvoice_tpu.models.llm import (IGNORE_ID, LMConfig, SamplingConfig,
                                      lm_generate_from_embeds, masked_accuracy,
                                      masked_ce_loss)
from cosyvoice_tpu.models.qwen2 import Qwen2Config, Qwen2Model
from cosyvoice_tpu.ops.masks import NEG_INF, make_non_pad_mask


@dataclass(frozen=True)
class PhonemeEmbedConfig:
    text_token_size: int = 140
    text_token_dim: int = 400
    text_tone_size: int = 16
    text_tone_dim: int = 64
    text_lang_size: int = 2
    text_lang_dim: int = 16
    text_prsd_size: int = 6
    text_prsd_dim: int = 32
    use_frontend_prsd: bool = True

    @property
    def total_dim(self) -> int:
        return (self.text_token_dim + self.text_tone_dim + self.text_lang_dim
                + self.text_prsd_dim)


class PhonemeEmbedding(nn.Module):
    """pho_token [B, T, 4] (phoneme, tone, lang, prosody) -> [B, T, 512]."""

    cfg: PhonemeEmbedConfig

    @nn.compact
    def __call__(self, pho_token: jax.Array) -> jax.Array:
        c = self.cfg
        parts = []
        for i, (size, dim) in enumerate([(c.text_token_size, c.text_token_dim),
                                         (c.text_tone_size, c.text_tone_dim),
                                         (c.text_lang_size, c.text_lang_dim),
                                         (c.text_prsd_size, c.text_prsd_dim)]):
            e = nn.Embed(size, dim, name=f"embed_{i}")(pho_token[..., i])
            if i == 3 and not c.use_frontend_prsd:
                e = e * 0.0
            parts.append(e)
        return jnp.concatenate(parts, axis=-1)


class MultiHeadedAttention(nn.Module):
    """Plain wenet MHA (attention.py:26-197) for the src-attention fusion."""

    heads: int
    dim: int
    key_bias: bool = True

    @nn.compact
    def __call__(self, q_in, k_in, v_in, mask=None):
        H, D = self.heads, self.dim // self.heads
        B, Tq = q_in.shape[:2]
        Tk = k_in.shape[1]
        q = nn.Dense(self.dim, name="linear_q")(q_in).reshape(B, Tq, H, D)
        k = nn.Dense(self.dim, use_bias=self.key_bias, name="linear_k")(k_in).reshape(B, Tk, H, D)
        v = nn.Dense(self.dim, name="linear_v")(v_in).reshape(B, Tk, H, D)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(D)
        if mask is not None:
            m = mask[:, None, :, :]
            scores = jnp.where(m, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, Tq, self.dim)
        return nn.Dense(self.dim, name="linear_out")(out)


class DecoderLayer(nn.Module):
    """wenet DecoderLayer (decoder_layer.py:22-132): pre-norm self-attn +
    cross-attn + ffn; used as the text<->phoneme "src_attention" fusion."""

    dim: int
    heads: int = 16
    ffn_hidden: int = 4096

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask):
        """tgt [B, Tt, D] + pad mask [B, 1, Tt]; memory [B, Tm, D] + mask."""
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt = tgt + MultiHeadedAttention(self.heads, self.dim,
                                         name="self_attn")(h, h, h, tgt_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        tgt = tgt + MultiHeadedAttention(self.heads, self.dim,
                                         name="src_attn")(h, memory, memory,
                                                          memory_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        h = nn.Dense(self.ffn_hidden, name="ff_w1")(h)
        h = jax.nn.relu(h)
        tgt = tgt + nn.Dense(self.dim, name="ff_w2")(h)
        return tgt


@dataclass(frozen=True)
class PhonemeLMConfig:
    llm_input_size: int = 896
    llm_output_size: int = 896
    speech_token_size: int = 6561
    spk_embed_dim: int = 512
    length_normalized_loss: bool = True
    lsm_weight: float = 0.0
    text_emb_mask_prob: float = 0.5
    sampling: SamplingConfig = field(default_factory=lambda: SamplingConfig(
        method="non_random_ras", top_p=0.8, top_k=10, win_size=10, tau_r=0.1))
    phoneme: PhonemeEmbedConfig = field(default_factory=PhonemeEmbedConfig)
    encoder: ConformerConfig = field(default_factory=lambda: ConformerConfig(
        dim=1024, heads=16, linear_units=4096, num_blocks=6, input_size=512,
        dropout_rate=0.1, attention_dropout_rate=0.0))
    qwen: Qwen2Config = field(default_factory=Qwen2Config)
    fusion_heads: int = 16
    fusion_ffn: int = 4096
    min_token_text_ratio: float = 2.0
    max_token_text_ratio: float = 20.0

    @property
    def eos_token(self) -> int:
        return self.speech_token_size


class _PhonemeLMBase(nn.Module):
    """Shared pieces: phoneme encoder, qwen body, heads, decode methods."""

    cfg: PhonemeLMConfig = field(default_factory=PhonemeLMConfig)

    def setup(self):
        cfg = self.cfg
        self.text_embedding = PhonemeEmbedding(cfg.phoneme)
        self.text_encoder = ConformerEncoder(cfg.encoder)
        self.text_encoder_affine_layer = nn.Dense(cfg.llm_input_size)
        self.llm = Qwen2Model(cfg.qwen)
        self.llm_embedding = nn.Embed(2, cfg.llm_input_size)
        self.speech_embedding = nn.Embed(cfg.speech_token_size + 3,
                                         cfg.llm_input_size)
        self.llm_decoder = nn.Dense(cfg.speech_token_size + 3)
        self.spk_embed_affine_layer = nn.Dense(cfg.llm_input_size)
        self._setup_extra()

    def _setup_extra(self):
        pass

    def encode_pho(self, pho_token, pho_len, deterministic=True):
        h = self.text_embedding(pho_token)
        h, _ = self.text_encoder(h, pho_len, deterministic=deterministic)
        return self.text_encoder_affine_layer(h)

    # decode-loop contract (lm_generate_from_embeds)
    def forward_hidden(self, embeds, positions, attn_bias, cache=None):
        return self.llm(embeds, positions, attn_bias, cache)

    def decode_logits(self, hidden):
        return self.llm_decoder(hidden)

    def speech_emb(self, tokens):
        return self.speech_embedding(tokens)

    def _spk(self, embedding):
        spk = embedding / jnp.linalg.norm(embedding, axis=-1,
                                          keepdims=True).clip(1e-12)
        return self.spk_embed_affine_layer(spk)[:, None, :]

    def _pack(self, streams, tail: int = 0):
        """Pack [sos, spk] + [(stream, len), ...] + [task] into a right-padded
        sequence via index arithmetic, reserving `tail` extra slots for the
        speech segment.  streams: list of (tensor [B, T_i, D], len [B])."""
        B = streams[0][0].shape[0]
        D = self.cfg.llm_input_size
        sos = self.llm_embedding(jnp.full((B, 1), 0))
        task = self.llm_embedding(jnp.full((B, 1), 1))
        N = 2 + sum(s.shape[1] for s, _ in streams) + 1 + tail
        out = jnp.zeros((B, N, D), streams[0][0].dtype)
        pos = jnp.arange(N)[None, :]
        out = jnp.where(pos[..., None] == 0, sos, out)
        offset = jnp.full((B,), 2)  # after sos + spk
        for s, sl in streams:
            idx = jnp.clip(pos - offset[:, None], 0, s.shape[1] - 1)
            g = jnp.take_along_axis(s, jnp.broadcast_to(idx, (B, N))[..., None], axis=1)
            in_seg = (pos >= offset[:, None]) & (pos < (offset + sl)[:, None])
            out = jnp.where(in_seg[..., None], g, out)
            offset = offset + sl
        out = jnp.where((pos == offset[:, None])[..., None], task, out)
        seq_len = offset + 1
        return out, seq_len, pos

    def _finish_pack(self, out, pos, offset_after_task, speech_emb, speech_len):
        B, N, D = out.shape
        idx = jnp.clip(pos - offset_after_task[:, None], 0,
                       max(speech_emb.shape[1] - 1, 0))
        if speech_emb.shape[1] > 0:
            g = jnp.take_along_axis(speech_emb,
                                    jnp.broadcast_to(idx, (B, N))[..., None], axis=1)
            in_seg = (pos >= offset_after_task[:, None]) & \
                     (pos < (offset_after_task + speech_len)[:, None])
            out = jnp.where(in_seg[..., None], g, out)
        return out

    def build_prefix(self, streams, embedding, speech, speech_len):
        """[sos, spk, streams..., task, speech_emb] -> (emb, seq_len)."""
        emb, seq_len, pos = self._pack(streams, tail=speech.shape[1])
        emb = jnp.where((pos == 1)[..., None], self._spk(embedding), emb)
        sp = self.speech_embedding(speech)
        emb = self._finish_pack(emb, pos, seq_len, sp, speech_len)
        return emb, seq_len + speech_len

    def _loss(self, emb, seq_len, n_ignore, speech, speech_len):
        cfg = self.cfg
        B, N, _ = emb.shape
        pad = make_non_pad_mask(seq_len, N)
        causal = jnp.arange(N)[None, :] <= jnp.arange(N)[:, None]
        bias = jnp.where(causal[None, None] & pad[:, None, None, :], 0.0,
                         NEG_INF).astype(emb.dtype)
        positions = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
        hidden, _ = self.llm(emb, positions, bias)
        logits = self.llm_decoder(hidden)
        pos = jnp.arange(N)[None, :]
        ni = n_ignore[:, None]
        sl = speech_len[:, None]
        sp_idx = jnp.clip(pos - ni, 0, speech.shape[1] - 1)
        tgt_sp = jnp.take_along_axis(speech, jnp.broadcast_to(sp_idx, (B, N)), axis=1)
        is_speech = (pos >= ni) & (pos < ni + sl)
        is_eos = pos == ni + sl
        target = jnp.where(is_speech, tgt_sp,
                 jnp.where(is_eos, cfg.eos_token, IGNORE_ID))
        return {"loss": masked_ce_loss(logits, target, cfg.lsm_weight,
                                       cfg.length_normalized_loss),
                "acc": masked_accuracy(logits, target)}


class Qwen2LMPhoneme(_PhonemeLMBase):
    """Text + phoneme streams both fed (llm.py:877-1153)."""

    def __call__(self, text, text_len, pho_token, pho_len, speech, speech_len,
                 embedding, rng=None, deterministic: bool = True) -> dict:
        cfg = self.cfg
        pho = self.encode_pho(pho_token, pho_len, deterministic)
        txt = self.llm.embed(text)
        if not deterministic and rng is not None:
            k_zero, k_drop = jax.random.split(rng)
            zero = jax.random.bernoulli(k_zero, cfg.text_emb_mask_prob)
            keep = jax.random.bernoulli(k_drop, 0.8, txt.shape)
            dropped = jnp.where(keep, txt / 0.8, 0.0)
            txt = jnp.where(zero, 0.0, dropped)
        emb, seq_len = self.build_prefix([(txt, text_len), (pho, pho_len)],
                                         embedding, speech, speech_len)
        n_ignore = 2 + text_len + pho_len
        return self._loss(emb, seq_len, n_ignore, speech, speech_len)

    def prefix_for_decode(self, text, text_len, pho_token, pho_len,
                          prompt_speech, prompt_speech_len, embedding):
        pho = self.encode_pho(pho_token, pho_len)
        txt = self.llm.embed(text)
        return self.build_prefix([(txt, text_len), (pho, pho_len)], embedding,
                                 prompt_speech, prompt_speech_len)


class Qwen2LMPhonemeSrc2(_PhonemeLMBase):
    """Cross-attention fusion, phoneme stream predicts (llm.py:1450-1772;
    the production config)."""

    def _setup_extra(self):
        self.src_attention = DecoderLayer(self.cfg.llm_input_size,
                                          self.cfg.fusion_heads,
                                          self.cfg.fusion_ffn)

    def fuse(self, text, text_len, pho_token, pho_len, deterministic=True):
        pho = self.encode_pho(pho_token, pho_len, deterministic)
        txt = self.llm.embed(text)
        pho_mask = make_non_pad_mask(pho_len, pho.shape[1])[:, None, :]
        txt_mask = make_non_pad_mask(text_len, txt.shape[1])[:, None, :]
        return self.src_attention(pho, pho_mask, txt, txt_mask)

    def __call__(self, text, text_len, pho_token, pho_len, speech, speech_len,
                 embedding, rng=None, deterministic: bool = True) -> dict:
        fused = self.fuse(text, text_len, pho_token, pho_len, deterministic)
        emb, seq_len = self.build_prefix([(fused, pho_len)], embedding,
                                         speech, speech_len)
        n_ignore = 2 + pho_len
        return self._loss(emb, seq_len, n_ignore, speech, speech_len)

    def prefix_for_decode(self, text, text_len, pho_token, pho_len,
                          prompt_speech, prompt_speech_len, embedding):
        fused = self.fuse(text, text_len, pho_token, pho_len)
        return self.build_prefix([(fused, pho_len)], embedding, prompt_speech,
                                 prompt_speech_len)


class Qwen2LMPhonemeSrc(Qwen2LMPhonemeSrc2):
    """Fusion with text as the predicted sequence (llm.py:1156-1449)."""

    def fuse(self, text, text_len, pho_token, pho_len, deterministic=True):
        pho = self.encode_pho(pho_token, pho_len, deterministic)
        txt = self.llm.embed(text)
        pho_mask = make_non_pad_mask(pho_len, pho.shape[1])[:, None, :]
        txt_mask = make_non_pad_mask(text_len, txt.shape[1])[:, None, :]
        return self.src_attention(txt, txt_mask, pho, pho_mask)

    def __call__(self, text, text_len, pho_token, pho_len, speech, speech_len,
                 embedding, rng=None, deterministic: bool = True) -> dict:
        fused = self.fuse(text, text_len, pho_token, pho_len, deterministic)
        emb, seq_len = self.build_prefix([(fused, text_len)], embedding,
                                         speech, speech_len)
        n_ignore = 2 + text_len
        return self._loss(emb, seq_len, n_ignore, speech, speech_len)

    def prefix_for_decode(self, text, text_len, pho_token, pho_len,
                          prompt_speech, prompt_speech_len, embedding):
        fused = self.fuse(text, text_len, pho_token, pho_len)
        return self.build_prefix([(fused, text_len)], embedding, prompt_speech,
                                 prompt_speech_len)


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len"))
def phoneme_lm_generate(model, params, text, text_len, pho_token, pho_len,
                        prompt_speech, prompt_speech_len, embedding,
                        min_len, max_len, rng, max_steps: int, cache_len: int):
    """AR generation for any phoneme-LM variant."""
    embeds, seq_len = model.apply(params, text, text_len, pho_token, pho_len,
                                  prompt_speech, prompt_speech_len, embedding,
                                  method=type(model).prefix_for_decode)
    return lm_generate_from_embeds(model, params, embeds, seq_len, min_len,
                                   max_len, rng, max_steps, cache_len)


def import_phoneme_lm_torch(state_dict, cfg: PhonemeLMConfig,
                            variant: str = "src2") -> dict:
    """reference Qwen2LM_Phoneme* state_dict -> params pytree."""
    from cosyvoice_tpu.models.conformer import (_dense,
                                                import_conformer_encoder_torch)
    from cosyvoice_tpu.models.qwen2 import import_qwen2_torch

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_sd = {k[len("text_encoder."):]: v for k, v in sd.items()
              if k.startswith("text_encoder.")}
    qwen_sd = {k[len("llm.model."):]: v for k, v in sd.items()
               if k.startswith("llm.model.")}
    params = {
        "text_embedding": {f"embed_{i}": {"embedding": jnp.asarray(sd[f"text_embedding.{i}.weight"])}
                           for i in range(4)},
        "text_encoder": import_conformer_encoder_torch(enc_sd, cfg.encoder)["params"],
        "text_encoder_affine_layer": _dense(sd, "text_encoder_affine_layer"),
        "llm": import_qwen2_torch(qwen_sd, cfg.qwen)["params"],
        "llm_embedding": {"embedding": jnp.asarray(sd["llm_embedding.weight"])},
        "speech_embedding": {"embedding": jnp.asarray(sd["speech_embedding.weight"])},
        "llm_decoder": _dense(sd, "llm_decoder"),
        "spk_embed_affine_layer": _dense(sd, "spk_embed_affine_layer"),
    }
    if variant in ("src", "src2"):
        pre = "src_attention.0"
        params["src_attention"] = {
            "norm1": {"scale": jnp.asarray(sd[f"{pre}.norm1.weight"]),
                      "bias": jnp.asarray(sd[f"{pre}.norm1.bias"])},
            "norm2": {"scale": jnp.asarray(sd[f"{pre}.norm2.weight"]),
                      "bias": jnp.asarray(sd[f"{pre}.norm2.bias"])},
            "norm3": {"scale": jnp.asarray(sd[f"{pre}.norm3.weight"]),
                      "bias": jnp.asarray(sd[f"{pre}.norm3.bias"])},
            "self_attn": {k: _dense(sd, f"{pre}.self_attn.{k}")
                          for k in ("linear_q", "linear_k", "linear_v", "linear_out")},
            "src_attn": {k: _dense(sd, f"{pre}.src_attn.{k}")
                         for k in ("linear_q", "linear_k", "linear_v", "linear_out")},
            "ff_w1": _dense(sd, f"{pre}.feed_forward.w_1"),
            "ff_w2": _dense(sd, f"{pre}.feed_forward.w_2"),
        }
    return {"params": params}
