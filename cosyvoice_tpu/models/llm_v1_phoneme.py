"""v1 phoneme-conditioned TransformerLMs.

Behavioral spec: reference `cosyvoice/llm/llm.py` —
TransformerLM_Phoneme (:240-482): 4-way factored phoneme embeddings concat to
512 -> conformer text_encoder -> affine; LM body = the v1 transformer encoder
(decode via KV-cached conformer path); input [sos, spk, pho_enc, task,
speech]; target IGNORE x (2 + pho_len).
TransformerLM_Phoneme_SpkAdapt (:485-742): the same with a speaker-adaptive
text encoder (ConformerEncoder_SpkAdapt, encoder.py:478: spk vector injected
at every layer entry through a per-layer Linear).

`cosyvoice/llm/llm_with_spk.py` co-trains the SpeakerEmbedding with a VICReg
regularizer between utterance- and speaker-level vectors; that composition is
`ops.delay.vicreg_loss` applied between two embeddings at the training-step
level (see train/online_codec.py for the label-model wiring).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.conformer import ConformerConfig, ConformerEncoder, ConformerKVCache
from cosyvoice_tpu.models.llm import (IGNORE_ID, SamplingConfig,
                                      TransformerLMConfig, masked_accuracy,
                                      masked_ce_loss)
from cosyvoice_tpu.models.llm_phoneme import PhonemeEmbedConfig, PhonemeEmbedding
from cosyvoice_tpu.ops.masks import make_non_pad_mask


@dataclass(frozen=True)
class V1PhonemeLMConfig(TransformerLMConfig):
    phoneme: PhonemeEmbedConfig = field(default_factory=PhonemeEmbedConfig)
    spk_adapt: bool = False  # SpkAdapt text encoder variant


class TransformerLMPhoneme(nn.Module):
    cfg: V1PhonemeLMConfig = field(default_factory=V1PhonemeLMConfig)

    def setup(self):
        cfg = self.cfg
        self.text_embedding = PhonemeEmbedding(cfg.phoneme)
        te_cfg = cfg.text_encoder
        if cfg.spk_adapt:
            te_cfg = dataclass_replace(te_cfg, spk_adapt=True,
                                       spk_emb_size=cfg.spk_embed_dim)
        self.text_encoder = ConformerEncoder(te_cfg)
        self.text_encoder_affine_layer = nn.Dense(cfg.llm_input_size)
        self.llm_embedding = nn.Embed(2, cfg.llm_input_size)
        self.llm = ConformerEncoder(cfg.llm)
        self.llm_decoder = nn.Dense(cfg.speech_token_size + 1)
        self.speech_embedding = nn.Embed(cfg.speech_token_size, cfg.llm_input_size)
        self.spk_embed_affine_layer = nn.Dense(cfg.llm_input_size)

    def encode_pho(self, pho_token, pho_len, spk_raw=None, deterministic=True):
        h = self.text_embedding(pho_token)
        h, _ = self.text_encoder(h, pho_len, deterministic=deterministic,
                                 spk_emb=spk_raw if self.cfg.spk_adapt else None)
        return self.text_encoder_affine_layer(h)

    def prefill_embeds(self, pho_token, pho_len, prompt_speech,
                       prompt_speech_len, embedding, deterministic=True):
        cfg = self.cfg
        B = pho_token.shape[0]
        Ts = prompt_speech.shape[1]
        D = cfg.llm_input_size
        pho_h = self.encode_pho(pho_token, pho_len, embedding, deterministic)
        speech_emb = self.speech_embedding(prompt_speech)
        sos = self.llm_embedding(jnp.full((B, 1), 0))
        task = self.llm_embedding(jnp.full((B, 1), 1))
        spk = embedding / jnp.linalg.norm(embedding, axis=-1,
                                          keepdims=True).clip(1e-12)
        spk = self.spk_embed_affine_layer(spk)[:, None, :]
        Tt = pho_h.shape[1]
        N = 2 + Tt + 1 + Ts
        pos = jnp.arange(N)[None, :]
        tl = pho_len[:, None]
        in_text = (pos >= 2) & (pos < 2 + tl)
        is_task = pos == 2 + tl
        in_speech = (pos > 2 + tl) & (pos < 3 + tl + prompt_speech_len[:, None])
        t_idx = jnp.clip(pos - 2, 0, Tt - 1)
        s_idx = jnp.clip(pos - 3 - tl, 0, max(Ts - 1, 0))
        gt = jnp.take_along_axis(pho_h, jnp.broadcast_to(t_idx, (B, N))[..., None], axis=1)
        gs = (jnp.take_along_axis(speech_emb, jnp.broadcast_to(s_idx, (B, N))[..., None], axis=1)
              if Ts > 0 else jnp.zeros((B, N, D), pho_h.dtype))
        emb = jnp.where(pos[..., None] == 0, sos,
              jnp.where(pos[..., None] == 1, spk,
              jnp.where(in_text[..., None], gt,
              jnp.where(is_task[..., None], task,
              jnp.where(in_speech[..., None], gs, 0.0)))))
        return emb, 3 + pho_len + prompt_speech_len

    def __call__(self, pho_token, pho_len, speech, speech_len, embedding,
                 deterministic: bool = True) -> dict:
        cfg = self.cfg
        emb, seq_len = self.prefill_embeds(pho_token, pho_len, speech,
                                           speech_len, embedding, deterministic)
        B, N, _ = emb.shape
        hidden, _ = self.llm(emb, seq_len, deterministic=deterministic)
        logits = self.llm_decoder(hidden)
        pos = jnp.arange(N)[None, :]
        tl = pho_len[:, None]
        sl = speech_len[:, None]
        sp_idx = jnp.clip(pos - 2 - tl, 0, speech.shape[1] - 1)
        tgt = jnp.take_along_axis(speech, jnp.broadcast_to(sp_idx, (B, N)), axis=1)
        is_speech = (pos >= 2 + tl) & (pos < 2 + tl + sl)
        is_eos = pos == 2 + tl + sl
        target = jnp.where(is_speech, tgt,
                 jnp.where(is_eos, cfg.eos_token, IGNORE_ID))
        return {"loss": masked_ce_loss(logits, target, cfg.lsm_weight,
                                       cfg.length_normalized_loss),
                "acc": masked_accuracy(logits, target)}

    # v1 decode contract (lm_generate_v1-compatible methods)
    def llm_prefill(self, embeds, cache):
        return self.llm.prefill(embeds, cache)

    def llm_decode_step(self, x, cache):
        return self.llm.decode_step(x, cache)

    def decode_logits(self, hidden):
        return self.llm_decoder(hidden)

    def speech_emb(self, tokens):
        return self.speech_embedding(tokens)


def dataclass_replace(dc, **kw):
    import dataclasses

    return dataclasses.replace(dc, **kw)


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len"))
def v1_phoneme_generate(model: TransformerLMPhoneme, params, pho_token, pho_len,
                        prompt_speech, prompt_speech_len, embedding,
                        min_len, max_len, rng, max_steps: int, cache_len: int):
    """AR generation mirroring lm_generate_v1 with the phoneme prefix."""
    from cosyvoice_tpu.models.llm import GenState, _sample
    from cosyvoice_tpu.ops.masks import NEG_INF

    cfg = model.cfg
    eos = cfg.eos_token
    B = pho_token.shape[0]
    embeds, seq_len = model.apply(params, pho_token, pho_len, prompt_speech,
                                  prompt_speech_len, embedding,
                                  method=TransformerLMPhoneme.prefill_embeds)
    cache = ConformerKVCache.create(cfg.llm, B, cache_len, embeds.dtype)
    hidden, cache = model.apply(params, embeds, cache,
                                method=TransformerLMPhoneme.llm_prefill)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)
    win = cfg.sampling.win_size
    state = GenState(cache=cache,
                     prev_emb=jnp.zeros((B, 1, cfg.llm_input_size), embeds.dtype),
                     step=jnp.zeros((), jnp.int32),
                     count=jnp.zeros((B,), jnp.int32),
                     done=jnp.zeros((B,), bool),
                     out=jnp.zeros((B, max_steps), jnp.int32),
                     recent=jnp.zeros((B, win), jnp.int32),
                     recent_n=jnp.zeros((B,), jnp.int32), rng=rng)

    def sample_from(hidden_last, state):
        logits = model.apply(params, hidden_last,
                             method=TransformerLMPhoneme.decode_logits)
        logp = jax.nn.log_softmax(logits[:, 0, :].astype(jnp.float32), axis=-1)
        suppress = state.step == 0
        logp = jnp.where(suppress & (jnp.arange(logp.shape[-1])[None] == eos),
                         NEG_INF, logp)
        rng, k = jax.random.split(state.rng)
        rv = jnp.arange(win)[None] < state.recent_n[:, None]
        tok = _sample(cfg.sampling, k, logp, state.recent, rv)
        return tok, rng

    def advance(state, tok, rng):
        emitted = (tok < eos) & ~state.done
        done = state.done | (tok >= eos) | (state.step + 1 >= max_len)
        out = jax.vmap(lambda o, c, t, e: jnp.where(e, o.at[c].set(t), o))(
            state.out, state.count, tok, emitted)
        recent = jax.vmap(lambda r, t, e: jnp.where(e, jnp.roll(r, -1).at[-1].set(t), r))(
            state.recent, tok, emitted)
        recent_n = jnp.minimum(state.recent_n + emitted, win)
        new_emb = model.apply(params, jnp.minimum(tok, eos - 1)[:, None],
                              method=TransformerLMPhoneme.speech_emb)
        prev_emb = jnp.where(emitted[:, None, None], new_emb, state.prev_emb)
        return state._replace(prev_emb=prev_emb, step=state.step + 1,
                              count=state.count + emitted, done=done, out=out,
                              recent=recent, recent_n=recent_n, rng=rng)

    tok0, rng0 = sample_from(last, state)
    state = advance(state, tok0, rng0)

    def cond(state):
        return (~jnp.all(state.done)) & (state.step < max_steps)

    def body(state):
        hidden, cache = model.apply(params, state.prev_emb, state.cache,
                                    method=TransformerLMPhoneme.llm_decode_step)
        tok, rng = sample_from(hidden, state)
        return advance(state._replace(cache=cache), tok, rng)

    state = jax.lax.while_loop(cond, body, state)
    return state.out, state.count


# --------------------------------------------------------------------------
# speaker-co-training variant (reference llm/llm_with_spk.py)
# --------------------------------------------------------------------------

def spec_augment(x: jax.Array, rng: jax.Array, freq_mask: int = 10,
                 time_mask_frac: float = 0.1, n_masks: int = 2) -> jax.Array:
    """Light SpecAugment for the speaker-branch augmentation pass
    (reference SpeakerEmbedding spec_aug_config, speaker_encoder.py): zero
    `n_masks` random frequency bands (width <= freq_mask) and time spans
    (width <= time_mask_frac * T).  x [B, T, F]."""
    B, T, F = x.shape
    tmax = max(int(T * time_mask_frac), 1)
    for i in range(n_masks):
        kf0, kf1, kt0, kt1, rng = jax.random.split(rng, 5)
        f0 = jax.random.randint(kf0, (B, 1, 1), 0, max(F - freq_mask, 1))
        fw = jax.random.randint(kf1, (B, 1, 1), 0, freq_mask + 1)
        fpos = jnp.arange(F)[None, None, :]
        x = jnp.where((fpos >= f0) & (fpos < f0 + fw), 0.0, x)
        t0 = jax.random.randint(kt0, (B, 1, 1), 0, max(T - tmax, 1))
        tw = jax.random.randint(kt1, (B, 1, 1), 0, tmax + 1)
        tpos = jnp.arange(T)[None, :, None]
        x = jnp.where((tpos >= t0) & (tpos < t0 + tw), 0.0, x)
    return x


@dataclass(frozen=True)
class WithSpkConfig:
    lm: V1PhonemeLMConfig = field(default_factory=V1PhonemeLMConfig)
    spk: "SpeakerEmbeddingConfig" = None  # set via registry/_mk
    sim_coeff: float = 0.5
    std_coeff: float = 0.4
    cov_coeff: float = 0.1
    use_vicreg: bool = True


class TransformerLMPhonemeWithSpk(nn.Module):
    """v1 phoneme LM co-training its SpeakerEmbedding with a VICReg
    regularizer between a clean and a SpecAugment'ed speaker-encoder pass
    (reference `llm/llm_with_spk.py:68-260`: encode_speaker:151-184,
    VICReg:24-66, forward:195-259).

    TPU-native split of responsibilities: the reference's random wave crop /
    repeat-pad (:156-175) and featurization happen in the data pipeline
    (`data/pipeline.py` + `train/online_codec.random_crop_or_repeat`), so
    this module takes static-shape fbank/linear-spec features; the aug pass
    runs inside the same jitted loss with stop_gradient (the torch
    `no_grad()` at :253-255).
    """

    cfg: WithSpkConfig = field(default_factory=WithSpkConfig)

    def setup(self):
        from cosyvoice_tpu.models.speaker import (SpeakerEmbedding,
                                                  SpeakerEmbeddingConfig)

        self.lm = TransformerLMPhoneme(self.cfg.lm)
        self.speaker_embed = SpeakerEmbedding(
            self.cfg.spk or SpeakerEmbeddingConfig())

    def encode_speaker(self, fbank, spec, spec_len, rng):
        return self.speaker_embed(fbank, spec, spec_len, rng)

    def __call__(self, pho_token, pho_len, speech, speech_len,
                 fbank, spec, spec_len, rng,
                 deterministic: bool = True) -> dict:
        from cosyvoice_tpu.ops.delay import vicreg_loss

        cfg = self.cfg
        k_clean, k_aug_sample, k_aug1, k_aug2 = jax.random.split(rng, 4)
        emb = self.speaker_embed(fbank, spec, spec_len, k_clean)
        out = self.lm(pho_token, pho_len, speech, speech_len, emb,
                      deterministic=deterministic)
        if cfg.use_vicreg and not deterministic:
            fb_aug = spec_augment(fbank, k_aug1)
            sp_aug = spec_augment(spec, k_aug2)
            emb_aug = jax.lax.stop_gradient(
                self.speaker_embed(fb_aug, sp_aug, spec_len, k_aug_sample))
            vr = vicreg_loss(emb, emb_aug, cfg.sim_coeff, cfg.std_coeff,
                             cfg.cov_coeff)
            out = dict(out, loss=out["loss"] + vr, vicreg=vr)
        return out
