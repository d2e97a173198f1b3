"""CosyVoice2 speech-token LLM: Qwen2 body + speech head + AR decode loop.

Behavioral spec: reference `cosyvoice/llm/llm.py:769-874` (Qwen2LM):
  * inputs: [sos_eos_emb, qwen_embed(prompt_text ++ text), task_id_emb,
    speech_embedding(prompt_speech_tokens)]; vocab = speech_token_size+3
    (eos = 6561, then 2 "fill" ids); llm_embedding has exactly 2 rows
    (sos_eos=0, task_id=1)
  * decode: causal, KV-cached, one token/step; log_softmax -> RAS/nucleus
    sampling; EOS rejected while step < min_len (= 2x new-text tokens);
    stop at EOS or max_len (= 20x new-text tokens); sampled ids above EOS are
    NOT emitted and the previous input embedding is fed again (llm.py:869-870)
  * training target (shape per Qwen2LM_Phoneme, llm.py:996-1001, minus the
    phoneme stream): [IGNORE x (1 + text_len), speech tokens, EOS], masked
    label-smoothing CE.

TPU-first: the whole decode loop is ONE jitted lax.while_loop over a static
KV cache (no per-token host round-trip — the reference pays a .item() sync
every token, llm.py:866); sampling runs on device (ops/sampling); min_len EOS
suppression is a logit mask rather than the reference's re-draw loop
(distribution equal conditional on the nucleus set, and deterministic).
Sequence construction for training uses index arithmetic on static shapes
instead of unpad/concat/repad.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.qwen2 import (KVCache, Qwen2Config, Qwen2Model,
                                        causal_prefill_bias, decode_step_bias)
from cosyvoice_tpu.ops import sampling as samp
from cosyvoice_tpu.ops.masks import NEG_INF, make_non_pad_mask

IGNORE_ID = -1


@dataclass(frozen=True)
class SamplingConfig:
    method: str = "ras"  # ras | non_random_ras | nucleus | greedy
    top_p: float = 0.8
    top_k: int = 25
    win_size: int = 10
    tau_r: float = 0.1
    expand_scale: int = 2


@dataclass(frozen=True)
class LMConfig:
    llm_input_size: int = 896
    llm_output_size: int = 896
    speech_token_size: int = 6561
    length_normalized_loss: bool = True
    lsm_weight: float = 0.0
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    qwen: Qwen2Config = field(default_factory=Qwen2Config)
    min_token_text_ratio: float = 2.0
    max_token_text_ratio: float = 20.0

    @property
    def sos_eos(self) -> int:
        return 0

    @property
    def task_id(self) -> int:
        return 1

    @property
    def eos_token(self) -> int:
        return self.speech_token_size  # 6561


class Qwen2LM(nn.Module):
    cfg: LMConfig = field(default_factory=LMConfig)

    def setup(self):
        cfg = self.cfg
        self.llm = Qwen2Model(cfg.qwen)
        self.llm_embedding = nn.Embed(2, cfg.llm_input_size)
        self.speech_embedding = nn.Embed(cfg.speech_token_size + 3, cfg.llm_input_size)
        self.llm_decoder = nn.Dense(cfg.speech_token_size + 3)

    # ---- embedding builders -------------------------------------------------

    def prefill_embeds(self, text: jax.Array, text_len: jax.Array,
                       prompt_speech: jax.Array, prompt_speech_len: jax.Array
                       ) -> tuple[jax.Array, jax.Array]:
        """Pack [sos, text_emb, task, speech_emb] per batch row (right-padded).

        text [B, Tt] (prompt_text ++ text, padded), prompt_speech [B, Ts].
        Returns (embeds [B, 1+Tt+1+Ts, D], seq_len [B]).
        """
        B, Tt = text.shape
        Ts = prompt_speech.shape[1]
        D = self.cfg.llm_input_size
        text_emb = self.llm.embed(text)                       # [B, Tt, D]
        speech_emb = self.speech_embedding(prompt_speech)     # [B, Ts, D]
        sos = self.llm_embedding(jnp.full((B, 1), self.cfg.sos_eos))
        task = self.llm_embedding(jnp.full((B, 1), self.cfg.task_id))

        N = 1 + Tt + 1 + Ts
        pos = jnp.arange(N)[None, :]                          # [1, N]
        tl = text_len[:, None]
        # segment boundaries per row
        in_text = (pos >= 1) & (pos < 1 + tl)
        is_task = pos == 1 + tl
        in_speech = (pos > 1 + tl) & (pos < 2 + tl + prompt_speech_len[:, None])
        text_idx = jnp.clip(pos - 1, 0, Tt - 1)
        speech_idx = jnp.clip(pos - 2 - tl, 0, max(Ts - 1, 0))
        # gather along time with per-row indices
        gt = jnp.take_along_axis(text_emb, jnp.broadcast_to(text_idx, (B, N))[..., None], axis=1)
        gs = (jnp.take_along_axis(speech_emb, jnp.broadcast_to(speech_idx, (B, N))[..., None], axis=1)
              if Ts > 0 else jnp.zeros((B, N, D), text_emb.dtype))
        emb = jnp.where(pos[..., None] == 0, sos,
              jnp.where(in_text[..., None], gt,
              jnp.where(is_task[..., None], task,
              jnp.where(in_speech[..., None], gs, 0.0))))
        seq_len = 2 + text_len + prompt_speech_len
        return emb, seq_len

    # ---- forward pieces (jit-composable) -----------------------------------

    def forward_hidden(self, embeds, positions, attn_bias, cache=None):
        return self.llm(embeds, positions, attn_bias, cache)

    def decode_logits(self, hidden):
        return self.llm_decoder(hidden)

    def speech_emb(self, tokens):
        return self.speech_embedding(tokens)

    # ---- training -----------------------------------------------------------

    def __call__(self, text: jax.Array, text_len: jax.Array,
                 speech: jax.Array, speech_len: jax.Array) -> dict:
        """Masked CE over [IGNORE x (1+text_len), speech, EOS] (llm.py:996-1001)."""
        cfg = self.cfg
        emb, seq_len = self.prefill_embeds(text, text_len, speech, speech_len)
        B, N, _ = emb.shape
        pad = make_non_pad_mask(seq_len, N)
        # the reference passes a full-context [B,T,T] mask, but
        # Qwen2Encoder.forward_one_step reduces it to its pad row
        # (llm.py:756-757) and HF Qwen2 always adds causal masking —
        # so training attention is causal + padding.
        causal = jnp.arange(N)[None, :] <= jnp.arange(N)[:, None]
        bias = jnp.where(causal[None, None] & pad[:, None, None, :],
                         0.0, NEG_INF).astype(emb.dtype)
        positions = jnp.broadcast_to(jnp.arange(N)[None], (B, N))
        hidden, _ = self.llm(emb, positions, bias)
        logits = self.llm_decoder(hidden)

        pos = jnp.arange(N)[None, :]
        tl = text_len[:, None]
        sl = speech_len[:, None]
        sp_idx = jnp.clip(pos - 1 - tl, 0, speech.shape[1] - 1)
        tgt_speech = jnp.take_along_axis(speech, jnp.broadcast_to(sp_idx, (B, N)), axis=1)
        is_speech = (pos >= 1 + tl) & (pos < 1 + tl + sl)
        is_eos = pos == 1 + tl + sl
        target = jnp.where(is_speech, tgt_speech,
                 jnp.where(is_eos, cfg.eos_token, IGNORE_ID))
        return {"loss": masked_ce_loss(logits, target, cfg.lsm_weight,
                                       cfg.length_normalized_loss),
                "acc": masked_accuracy(logits, target)}

    def packed_call(self, ids: jax.Array, types: jax.Array,
                    positions: jax.Array, seg: jax.Array,
                    target: jax.Array) -> dict:
        """Sequence-PACKED training step: each row holds several
        [sos, text, task, speech] examples back to back (train/packing.py
        builds the arrays).  Short utterances dominate TTS corpora, so the
        unpacked step (bs 8 x ~450 tokens) leaves most MXU rows idle;
        packing fills rows to ~2k tokens at the same memory.

        ids [B, N]: per-type embedding indices; types [B, N]: 0 pad, 1 text,
        2 sos/task (llm_embedding), 3 speech; positions [B, N] restart per
        example; seg [B, N] example id (1-based, 0 = pad); target [B, N]
        next-token labels with IGNORE_ID outside speech/eos.

        Attention is BLOCK-DIAGONAL causal (same-seg & causal & non-pad), so
        the loss equals the unpacked __call__ on the same examples exactly
        (same valid-position set -> same masked-CE mean; test_train.py).
        With length_normalized_loss=False the divisor is the EXAMPLE count
        (sum of per-row max seg id), matching the unpacked step's batch-size
        divisor — not the packed row count (ADVICE r4)."""
        cfg = self.cfg
        B, N = ids.shape
        te = self.llm.embed(jnp.where(types == 1, ids, 0))
        le = self.llm_embedding(jnp.where(types == 2, jnp.minimum(ids, 1), 0))
        se = self.speech_embedding(jnp.where(types == 3, ids, 0))
        emb = jnp.where((types == 1)[..., None], te,
              jnp.where((types == 2)[..., None], le,
              jnp.where((types == 3)[..., None], se, 0.0)))
        causal = jnp.arange(N)[None, :] <= jnp.arange(N)[:, None]
        same = (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0)
        bias = jnp.where(causal[None] & same, 0.0, NEG_INF
                         ).astype(emb.dtype)[:, None]
        hidden, _ = self.llm(emb, positions, bias)
        logits = self.llm_decoder(hidden)
        denom = None if cfg.length_normalized_loss \
            else jnp.sum(jnp.max(seg, axis=1))
        return {"loss": masked_ce_loss(logits, target, cfg.lsm_weight,
                                       cfg.length_normalized_loss,
                                       denom=denom),
                "acc": masked_accuracy(logits, target)}


def masked_ce_loss(logits, target, smoothing=0.0, length_normalized=True,
                   denom=None):
    """wenet LabelSmoothingLoss semantics with IGNORE_ID masking.  `denom`
    overrides the divisor (packed batches pass their true example count when
    length_normalized is False — rows != examples there)."""
    V = logits.shape[-1]
    valid = target != IGNORE_ID
    tgt = jnp.maximum(target, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if smoothing > 0.0:
        # wenet LabelSmoothingLoss: KL(true_dist || p) with true_dist =
        # confidence at target, smoothing/(V-1) elsewhere.  CLOSED FORM —
        # sum_v td_v (log td_v - logp_v)
        #   = [conf log conf + (V-1) sm log sm]            (entropy, const)
        #     - conf logp_tgt - sm (sum_v logp_v - logp_tgt)
        # identical math without materializing the [.., V] one-hot / KL
        # tensors (at the 0.5B head that was ~3 extra fp32 [B,N,6564]
        # passes per step through HBM)
        conf = 1.0 - smoothing
        sm = smoothing / (V - 1)
        ent = conf * np.log(conf) + (V - 1) * sm * np.log(sm)
        logp_tgt = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        nll = ent - conf * logp_tgt - sm * (jnp.sum(logp, axis=-1) - logp_tgt)
    else:
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if denom is None:
        denom = jnp.sum(valid) if length_normalized else logits.shape[0]
    return jnp.sum(nll) / jnp.maximum(denom, 1)


def masked_accuracy(logits, target):
    valid = target != IGNORE_ID
    pred = jnp.argmax(logits, axis=-1)
    return jnp.sum((pred == target) & valid) / jnp.maximum(jnp.sum(valid), 1)


# --------------------------------------------------------------------------
# jitted AR generation
# --------------------------------------------------------------------------

class GenState(NamedTuple):
    cache: KVCache
    prev_emb: jax.Array     # [B, 1, D] next input embedding
    step: jax.Array         # decode step counter (incl. non-emitted)
    count: jax.Array        # number of emitted tokens
    done: jax.Array         # [B] bool
    out: jax.Array          # [B, cap] emitted tokens
    recent: jax.Array       # [B, win] last emitted (for RAS)
    recent_n: jax.Array     # [B] number valid in recent
    rng: jax.Array


def _sample(cfg: SamplingConfig, rng, logp, recent, recent_valid):
    if cfg.method == "greedy":
        return samp.greedy_sample(logp)
    if cfg.method == "nucleus":
        return samp.nucleus_sample(rng, logp, cfg.top_p, cfg.top_k)
    if cfg.method == "ras":
        return samp.ras_sample(rng, logp, recent, recent_valid, cfg.top_p,
                               cfg.top_k, cfg.win_size, cfg.tau_r)
    if cfg.method == "non_random_ras":
        return samp.non_random_ras_sample(rng, logp, recent, recent_valid,
                                          cfg.top_p, cfg.top_k, cfg.win_size,
                                          cfg.tau_r, cfg.expand_scale)
    raise ValueError(cfg.method)


def collect_act_stats(model, params, text, text_len, speech, speech_len):
    """AWQ calibration: one teacher-forced pass collecting per-channel
    activation amax at every quantized projection's input (the sow taps in
    models/qwen2.Qwen2Layer).  Returns {layer_idx: {attn_in, mlp_in,
    down_in}} numpy arrays for utils.quant.awq_equalize; call with one or
    more representative batches and np.maximum-merge the results."""
    cls = type(model)
    emb, seq_len = model.apply(params, text, text_len, speech, speech_len,
                               method=cls.prefill_embeds)
    B, T = emb.shape[:2]
    bias = causal_prefill_bias(T, T, seq_len, B, emb.dtype)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    _, inter = model.apply(params, emb, pos, bias,
                           method=cls.forward_hidden,
                           mutable=["intermediates"])
    stats = {}
    for name, sub in inter["intermediates"]["llm"].items():
        if name.startswith("layers_"):
            stats[int(name.split("_")[1])] = {
                "attn_in": np.asarray(sub["attn_in_amax"][0]),
                "mlp_in": np.asarray(sub["mlp_in_amax"][0]),
                "down_in": np.asarray(sub["down_in_amax"][0])}
    return stats


def _decode_params(model, params):
    """int4xla: cast int8 nibble kernels to native int4 ONCE at the top of
    each decode-loop program (int4 cannot cross the program boundary on
    this backend, and an in-body cast would rely on XLA loop hoisting)."""
    if getattr(model.cfg, "qwen", None) is not None \
            and model.cfg.qwen.quant == "int4xla":
        from cosyvoice_tpu.utils.quant import int4_device_cast
        return int4_device_cast(params)
    return params


def lm_generate_from_embeds(model, params, embeds, seq_len, min_len, max_len,
                            rng, max_steps: int, cache_len: int,
                            causal_prefill: bool = True):
    """Generic AR loop over a Qwen2-body model given packed prefix embeds.

    The model must expose forward_hidden / decode_logits / speech_emb methods
    and cfg.{eos_token, sampling}.  NOTE: the reference passes "full" masks in
    several variants (llm.py:1141, 1435-1437), but HF reduces them to pad rows
    and Qwen2 always applies causal masking — so causal_prefill=True matches
    every reference variant; False is exposed for experimentation only.
    Returns (tokens [B, max_steps], count [B]).
    """
    cfg = model.cfg
    cls = type(model)
    B = embeds.shape[0]
    params = _decode_params(model, params)

    Tp = embeds.shape[1]
    cache = KVCache.create(cfg.qwen, B, cache_len, dtype=embeds.dtype)
    if causal_prefill:
        bias = causal_prefill_bias(Tp, cache_len, seq_len, B, embeds.dtype)
    else:
        key_ok = jnp.arange(cache_len)[None, :] < seq_len[:, None]
        bias = jnp.where(key_ok[:, None, None, :], 0.0, NEG_INF).astype(embeds.dtype)
        bias = jnp.broadcast_to(bias, (B, 1, Tp, cache_len))
    positions = jnp.broadcast_to(jnp.arange(Tp)[None], (B, Tp))
    hidden, cache = model.apply(params, embeds, positions, bias, cache,
                                method=cls.forward_hidden)
    # cache.pos advanced by Tp; rows shorter than Tp leave garbage K/V in
    # their padding slots — masked per-row by the decode bias.
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)

    win = cfg.sampling.win_size
    state = GenState(
        cache=cache,
        prev_emb=jnp.zeros((B, 1, embeds.shape[-1]), embeds.dtype),
        step=jnp.zeros((), jnp.int32),
        count=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        out=jnp.zeros((B, max_steps), jnp.int32),
        recent=jnp.zeros((B, win), jnp.int32),
        recent_n=jnp.zeros((B,), jnp.int32),
        rng=rng,
    )

    sample_from, advance, body = _decode_machinery(model, params, seq_len, Tp,
                                                   cache_len, max_steps)
    tok0, rng0 = sample_from(last, state, min_len)
    state = advance(state, tok0, rng0, max_len)

    def cond(state):
        return (~jnp.all(state.done)) & (state.step < max_steps)

    state = jax.lax.while_loop(
        cond, lambda st: body(st, min_len, max_len), state)
    return state.out, state.count


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len"))
def lm_generate(model: Qwen2LM, params, text, text_len, prompt_speech,
                prompt_speech_len, min_len, max_len, rng,
                max_steps: int, cache_len: int):
    """CosyVoice2 Qwen2LM generation (packed [sos,text,task,speech] prefix)."""
    embeds, seq_len = model.apply(params, text, text_len, prompt_speech,
                                  prompt_speech_len, method=Qwen2LM.prefill_embeds)
    return lm_generate_from_embeds(model, params, embeds, seq_len, min_len,
                                   max_len, rng, max_steps, cache_len)


class FusedGenState(NamedTuple):
    """GenState twin for the whole-step decode kernel: the cache lives in
    the kernel's stacked [L, C, kvH*D] layout instead of KVCache."""

    kc: jax.Array
    vc: jax.Array
    prev_emb: jax.Array
    step: jax.Array
    count: jax.Array
    done: jax.Array
    out: jax.Array
    recent: jax.Array
    recent_n: jax.Array
    rng: jax.Array


def lm_step_supported(cfg: Qwen2Config) -> bool:
    """Shapes/quant the whole-step kernel handles (Qwen2-0.5B serving)."""
    return (cfg.quant == "int8" and cfg.head_dim in (64, 128)
            and (cfg.num_kv_heads * cfg.head_dim) % 128 == 0
            and cfg.hidden_size % 128 == 0
            and cfg.num_heads % cfg.num_kv_heads == 0)


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len",
                                   "interpret"))
def lm_generate_fused_step(model: Qwen2LM, params, step_w, text, text_len,
                           prompt_speech, prompt_speech_len, min_len,
                           max_len, rng, max_steps: int, cache_len: int,
                           interpret: bool = False):
    """B=1 generation with the persistent whole-step decode kernel
    (ops/pallas/lm_step.py): prefill runs the normal flax path into a
    head-major cache, which is repacked once into the kernel's stacked
    [L, C, kvH*D] layout; every decode step is then ONE pallas_call (all
    layers, weights streamed once) + the small head/sample/embed tail in
    XLA.  step_w = pack_step_weights(params) (build once at load).
    Sampling/stopping math is identical to lm_generate — greedy tokens
    match it exactly at tiny scale (tests) and by argmax-agreement at 0.5B
    (bench)."""
    from cosyvoice_tpu.models.qwen2 import rms_norm, rope_cos_sin

    cfg = model.cfg
    q = cfg.qwen
    assert text.shape[0] == 1, "fused-step decode is B=1"
    embeds, seq_len = model.apply(params, text, text_len, prompt_speech,
                                  prompt_speech_len,
                                  method=Qwen2LM.prefill_embeds)
    Tp = embeds.shape[1]
    cache = KVCache.create(q, 1, cache_len, dtype=embeds.dtype)
    bias = causal_prefill_bias(Tp, cache_len, seq_len, 1, embeds.dtype)
    positions = jnp.broadcast_to(jnp.arange(Tp)[None], (1, Tp))
    hidden, cache = model.apply(params, embeds, positions, bias, cache,
                                method=Qwen2LM.forward_hidden)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)

    from cosyvoice_tpu.ops.pallas.lm_step import (cache_to_step_layout,
                                                  lm_step_fused)

    kc, vc = cache_to_step_layout(cache.k, cache.v, cache_len)
    win = cfg.sampling.win_size
    state = FusedGenState(
        kc=kc, vc=vc,
        prev_emb=jnp.zeros((1, 1, embeds.shape[-1]), embeds.dtype),
        step=jnp.zeros((), jnp.int32), count=jnp.zeros((1,), jnp.int32),
        done=jnp.zeros((1,), bool), out=jnp.zeros((1, max_steps), jnp.int32),
        recent=jnp.zeros((1, win), jnp.int32),
        recent_n=jnp.zeros((1,), jnp.int32), rng=rng)

    sample_from, advance = _sample_advance(model, params)
    tok0, rng0 = sample_from(last, state, min_len)
    state = advance(state, tok0, rng0, max_len)

    norm_w = params["params"]["llm"]["norm"]
    nq, nkv, hd = q.num_heads, q.num_kv_heads, q.head_dim

    def body(st: FusedGenState) -> FusedGenState:
        pos = seq_len[0] + st.step - 1
        x8 = jnp.pad(st.prev_emb[0], ((0, 7), (0, 0)))
        cos, sin = rope_cos_sin(pos[None, None], hd, q.rope_theta)
        y, nk, nv = lm_step_fused(step_w, x8, st.kc, st.vc, pos, cos[0],
                                  sin[0], nq=nq, nkv=nkv, hd=hd,
                                  eps=q.rms_norm_eps, interpret=interpret)
        hid = rms_norm(y[0:1], norm_w, q.rms_norm_eps)[None]
        kc = jax.vmap(lambda c, u: jax.lax.dynamic_update_slice(
            c, u[None], (pos, 0)))(st.kc, nk)
        vc = jax.vmap(lambda c, u: jax.lax.dynamic_update_slice(
            c, u[None], (pos, 0)))(st.vc, nv)
        tok, rng2 = sample_from(hid, st, min_len)
        return advance(st._replace(kc=kc, vc=vc), tok, rng2, max_len)

    def cond(st):
        return (~jnp.all(st.done)) & (st.step < max_steps)

    state = jax.lax.while_loop(cond, body, state)
    return state.out, state.count


def import_qwen2lm_torch(state_dict, cfg: LMConfig) -> dict:
    """reference Qwen2LM state_dict -> params (llm.model.model.* = qwen body)."""
    from cosyvoice_tpu.models.qwen2 import import_qwen2_torch

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    qwen_sd = {k[len("llm.model."):]: v for k, v in sd.items()
               if k.startswith("llm.model.")}
    return {"params": {
        "llm": import_qwen2_torch(qwen_sd, cfg.qwen)["params"],
        "llm_embedding": {"embedding": jnp.asarray(sd["llm_embedding.weight"])},
        "speech_embedding": {"embedding": jnp.asarray(sd["speech_embedding.weight"])},
        "llm_decoder": {"kernel": jnp.asarray(sd["llm_decoder.weight"].T),
                        "bias": jnp.asarray(sd["llm_decoder.bias"])},
    }}


# --------------------------------------------------------------------------
# v1: TransformerLM (conformer text encoder + transformer-encoder LM body)
# --------------------------------------------------------------------------

from cosyvoice_tpu.models.conformer import (ConformerConfig, ConformerEncoder,
                                            ConformerKVCache)


@dataclass(frozen=True)
class TransformerLMConfig:
    """Reference `cosyvoice/llm/llm.py:42-237` + v1 yaml
    (examples/tts_vc/cosyvoice/conf/cosyvoice.yaml:17-63)."""

    text_encoder_input_size: int = 512
    llm_input_size: int = 1024
    llm_output_size: int = 1024
    text_token_size: int = 60515
    speech_token_size: int = 4096
    spk_embed_dim: int = 192
    length_normalized_loss: bool = True
    lsm_weight: float = 0.0
    sampling: SamplingConfig = field(default_factory=lambda: SamplingConfig(
        method="non_random_ras", top_p=0.8, top_k=10, win_size=50, tau_r=0.1))
    text_encoder: ConformerConfig = field(default_factory=lambda: ConformerConfig(
        dim=1024, heads=16, linear_units=4096, num_blocks=6, input_size=512,
        dropout_rate=0.1, attention_dropout_rate=0.0, static_chunk_size=1))
    llm: ConformerConfig = field(default_factory=lambda: ConformerConfig(
        dim=1024, heads=16, linear_units=4096, num_blocks=14, input_size=1024,
        dropout_rate=0.1, attention_dropout_rate=0.0, static_chunk_size=1,
        input_layer="linear_legacy", activation="relu"))
    min_token_text_ratio: float = 2.0
    max_token_text_ratio: float = 20.0

    @property
    def eos_token(self) -> int:
        return self.speech_token_size


class TransformerLM(nn.Module):
    cfg: TransformerLMConfig = field(default_factory=TransformerLMConfig)

    def setup(self):
        cfg = self.cfg
        self.text_embedding = nn.Embed(cfg.text_token_size,
                                       cfg.text_encoder_input_size)
        self.text_encoder = ConformerEncoder(cfg.text_encoder)
        self.text_encoder_affine_layer = nn.Dense(cfg.llm_input_size)
        self.llm_embedding = nn.Embed(2, cfg.llm_input_size)
        self.llm = ConformerEncoder(cfg.llm)
        self.llm_decoder = nn.Dense(cfg.speech_token_size + 1)
        self.speech_embedding = nn.Embed(cfg.speech_token_size, cfg.llm_input_size)
        self.spk_embed_affine_layer = nn.Dense(cfg.llm_input_size)

    def encode_text(self, text: jax.Array, text_len: jax.Array,
                    deterministic: bool = True) -> jax.Array:
        """text ids -> llm-dim features through the causal conformer
        (llm.py:88-94; decoding_chunk_size=1 == static chunk 1 causal)."""
        h = self.text_embedding(text)
        h, _ = self.text_encoder(h, text_len, deterministic=deterministic)
        return self.text_encoder_affine_layer(h)

    def prefill_embeds(self, text, text_len, prompt_speech, prompt_speech_len,
                       embedding, deterministic: bool = True):
        """[sos, spk_emb, text_enc, task, speech_emb] (llm.py:100-152,201-206).
        embedding [B, spk_dim] or None (zero-shot without spk vec keeps the
        slot out, matching the reference's empty-embedding concat)."""
        cfg = self.cfg
        B, Tt = text.shape
        Ts = prompt_speech.shape[1]
        D = cfg.llm_input_size
        text_h = self.encode_text(text, text_len, deterministic)
        speech_emb = self.speech_embedding(prompt_speech)
        sos = self.llm_embedding(jnp.full((B, 1), 0))
        task = self.llm_embedding(jnp.full((B, 1), 1))
        has_spk = embedding is not None and embedding.shape[-1] > 0
        if has_spk:
            spk = embedding / jnp.linalg.norm(embedding, axis=-1,
                                              keepdims=True).clip(1e-12)
            spk = self.spk_embed_affine_layer(spk)[:, None, :]
        n_fixed = 2 if has_spk else 1  # sos (+ spk)
        N = n_fixed + Tt + 1 + Ts
        pos = jnp.arange(N)[None, :]
        tl = text_len[:, None]
        in_text = (pos >= n_fixed) & (pos < n_fixed + tl)
        is_task = pos == n_fixed + tl
        in_speech = (pos > n_fixed + tl) & (pos < n_fixed + 1 + tl + prompt_speech_len[:, None])
        text_idx = jnp.clip(pos - n_fixed, 0, Tt - 1)
        speech_idx = jnp.clip(pos - n_fixed - 1 - tl, 0, max(Ts - 1, 0))
        gt = jnp.take_along_axis(text_h, jnp.broadcast_to(text_idx, (B, N))[..., None], axis=1)
        gs = (jnp.take_along_axis(speech_emb, jnp.broadcast_to(speech_idx, (B, N))[..., None], axis=1)
              if Ts > 0 else jnp.zeros((B, N, D), text_h.dtype))
        emb = jnp.where(pos[..., None] == 0, sos,
              jnp.where(in_text[..., None], gt,
              jnp.where(is_task[..., None], task,
              jnp.where(in_speech[..., None], gs, 0.0))))
        if has_spk:
            emb = jnp.where(pos[..., None] == 1, spk, emb)
        seq_len = n_fixed + 1 + text_len + prompt_speech_len
        return emb, seq_len

    def __call__(self, text, text_len, speech, speech_len, embedding,
                 deterministic: bool = True) -> dict:
        """Training CE over [IGNORE x (2+text_len), speech, EOS] (llm.py:125-128)."""
        cfg = self.cfg
        emb, seq_len = self.prefill_embeds(text, text_len, speech, speech_len,
                                           embedding, deterministic)
        B, N, _ = emb.shape
        pad = make_non_pad_mask(seq_len, N)
        # v1 trains causally: the llm body itself applies static_chunk_size=1
        hidden, _ = self.llm(emb, seq_len, deterministic=deterministic)
        logits = self.llm_decoder(hidden)
        pos = jnp.arange(N)[None, :]
        tl = text_len[:, None]
        sl = speech_len[:, None]
        sp_idx = jnp.clip(pos - 2 - tl, 0, speech.shape[1] - 1)
        tgt_speech = jnp.take_along_axis(speech, jnp.broadcast_to(sp_idx, (B, N)), axis=1)
        is_speech = (pos >= 2 + tl) & (pos < 2 + tl + sl)
        is_eos = pos == 2 + tl + sl
        target = jnp.where(is_speech, tgt_speech,
                 jnp.where(is_eos, cfg.eos_token, IGNORE_ID))
        return {"loss": masked_ce_loss(logits, target, cfg.lsm_weight,
                                       cfg.length_normalized_loss),
                "acc": masked_accuracy(logits, target)}

    # decode pieces
    def llm_prefill(self, embeds, cache):
        return self.llm.prefill(embeds, cache)

    def llm_decode_step(self, x, cache):
        return self.llm.decode_step(x, cache)

    def decode_logits(self, hidden):
        return self.llm_decoder(hidden)

    def speech_emb(self, tokens):
        return self.speech_embedding(tokens)


def _v1_machinery(model: TransformerLM, params, max_len):
    """v1 per-step sample/advance/body closures, shared by the one-shot
    decode and the chunked streaming driver.  Reference semantics
    (llm.py:163-168, 217-237): EOS forced off at step 0 only (the fork's
    sampling_ids does NOT re-draw on EOS), done on tok >= eos or max_len."""
    cfg = model.cfg
    eos = cfg.eos_token
    win = cfg.sampling.win_size

    def sample_from(hidden_last, state):
        logits = model.apply(params, hidden_last, method=TransformerLM.decode_logits)
        logp = jax.nn.log_softmax(logits[:, 0, :].astype(jnp.float32), axis=-1)
        suppress = state.step == 0  # force continue on the first token
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
                              method=TransformerLM.speech_emb)
        prev_emb = jnp.where(emitted[:, None, None], new_emb, state.prev_emb)
        return state._replace(prev_emb=prev_emb, step=state.step + 1,
                              count=state.count + emitted, done=done, out=out,
                              recent=recent, recent_n=recent_n, rng=rng)

    def body(state):
        hidden, cache = model.apply(params, state.prev_emb, state.cache,
                                    method=TransformerLM.llm_decode_step)
        tok, rng = sample_from(hidden, state)
        return advance(state._replace(cache=cache), tok, rng)

    return sample_from, advance, body


def _v1_prefill_state(model: TransformerLM, params, text, text_len,
                      prompt_speech, prompt_speech_len, embedding, max_len,
                      rng, max_steps: int, cache_len: int, has_spk: bool):
    """Prefill the conformer cache + sample the first token."""
    cfg = model.cfg
    B = text.shape[0]
    embeds, seq_len = model.apply(params, text, text_len, prompt_speech,
                                  prompt_speech_len,
                                  embedding if has_spk else None,
                                  method=TransformerLM.prefill_embeds)
    cache = ConformerKVCache.create(cfg.llm, B, cache_len, embeds.dtype)
    hidden, cache = model.apply(params, embeds, cache,
                                method=TransformerLM.llm_prefill)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)
    # NOTE: prefill writes seq_len..Tp garbage for short rows; B=1 exact
    # (guarded by the B==1 assert in lm_generate_v1 / the v1 runtime).

    win = cfg.sampling.win_size
    state = GenState(cache=cache,
                     prev_emb=jnp.zeros((B, 1, cfg.llm_input_size), embeds.dtype),
                     step=jnp.zeros((), jnp.int32),
                     count=jnp.zeros((B,), jnp.int32),
                     done=jnp.zeros((B,), bool),
                     out=jnp.zeros((B, max_steps), jnp.int32),
                     recent=jnp.zeros((B, win), jnp.int32),
                     recent_n=jnp.zeros((B,), jnp.int32), rng=rng)
    sample_from, advance, _ = _v1_machinery(model, params, max_len)
    tok0, rng0 = sample_from(last, state)
    return advance(state, tok0, rng0)


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len", "has_spk"))
def lm_generate_v1(model: TransformerLM, params, text, text_len, prompt_speech,
                   prompt_speech_len, embedding, min_len, max_len, rng,
                   max_steps: int, cache_len: int, has_spk: bool = True):
    """v1 AR generation (llm.py:171-237): conformer-decode with KV cache.
    min_len is accepted for signature parity but — like the reference — only
    step 0 suppresses EOS.  Prefill masks per-row padding only at B=1."""
    assert text.shape[0] == 1, (
        "lm_generate_v1 is exact for B=1 only (prefill leaves unmasked "
        "garbage K/V for rows shorter than the padded prefix); batch v1 "
        "decode rows independently or use the v2 engine")
    state = _v1_prefill_state(model, params, text, text_len, prompt_speech,
                              prompt_speech_len, embedding, max_len, rng,
                              max_steps, cache_len, has_spk)
    _, _, body = _v1_machinery(model, params, max_len)

    def cond(state):
        return (~jnp.all(state.done)) & (state.step < max_steps)

    state = jax.lax.while_loop(cond, body, state)
    return state.out, state.count


class StreamStateV1(NamedTuple):
    """Carry for v1 chunked decode (llm producer interleaved with synthesis,
    replacing the reference's producer thread, cli/model.py:116-128)."""

    gen: GenState


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len", "has_spk"))
def lm_prefill_stream_v1(model, params, text, text_len, prompt_speech,
                         prompt_speech_len, embedding, max_len, rng,
                         max_steps: int, cache_len: int,
                         has_spk: bool = True) -> StreamStateV1:
    assert text.shape[0] == 1, "v1 streaming decode is B=1 (see lm_generate_v1)"
    gen = _v1_prefill_state(model, params, text, text_len, prompt_speech,
                            prompt_speech_len, embedding, max_len, rng,
                            max_steps, cache_len, has_spk)
    return StreamStateV1(gen)


@partial(jax.jit, static_argnames=("model", "n_steps", "max_steps"))
def lm_decode_chunk_v1(model, params, state: StreamStateV1, max_len,
                       n_steps: int, max_steps: int) -> StreamStateV1:
    """Advance the v1 decode by up to n_steps (stops early on EOS/max_len)."""
    _, _, body = _v1_machinery(model, params, max_len)
    start = state.gen.step

    def cond(gen):
        return (~jnp.all(gen.done)) & (gen.step < max_steps) & \
               (gen.step - start < n_steps)

    return StreamStateV1(jax.lax.while_loop(cond, body, state.gen))


def import_transformer_lm_torch(state_dict, cfg: TransformerLMConfig) -> dict:
    from cosyvoice_tpu.models.conformer import (_dense,
                                                import_conformer_encoder_torch)

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    te_sd = {k[len("text_encoder."):]: v for k, v in sd.items()
             if k.startswith("text_encoder.")}
    llm_sd = {k[len("llm."):]: v for k, v in sd.items() if k.startswith("llm.")}
    return {"params": {
        "text_embedding": {"embedding": jnp.asarray(sd["text_embedding.weight"])},
        "text_encoder": import_conformer_encoder_torch(te_sd, cfg.text_encoder)["params"],
        "text_encoder_affine_layer": _dense(sd, "text_encoder_affine_layer"),
        "llm_embedding": {"embedding": jnp.asarray(sd["llm_embedding.weight"])},
        "llm": import_conformer_encoder_torch(llm_sd, cfg.llm,
                                              transformer_layer=True)["params"],
        "llm_decoder": _dense(sd, "llm_decoder"),
        "speech_embedding": {"embedding": jnp.asarray(sd["speech_embedding.weight"])},
        "spk_embed_affine_layer": _dense(sd, "spk_embed_affine_layer"),
    }}


# --------------------------------------------------------------------------
# incremental (chunked) generation — the streaming producer
# --------------------------------------------------------------------------

class StreamState(NamedTuple):
    """Carry for chunked decode: GenState + per-row prefix lengths."""

    gen: GenState
    seq_len: jax.Array      # [B] prefix lengths
    min_len: jax.Array
    max_len: jax.Array


def _sample_advance(model, params):
    """The per-step sample/advance closures, shared by every decode driver
    (one-shot lm_generate, chunked streaming, and the continuous-batching
    engine).  Work on any state NamedTuple carrying {cache, prev_emb, step,
    count, done, out, recent, recent_n, rng}; `step` may be a scalar (whole
    batch in lockstep) or a [B] vector (per-slot engine) — the math
    broadcasts either way, which is what keeps engine decode token-identical
    to lm_generate."""
    cfg = model.cfg
    eos = cfg.eos_token
    cls = type(model)
    win = cfg.sampling.win_size

    def sample_from(hidden_last, state, min_len):
        logits = model.apply(params, hidden_last, method=cls.decode_logits)
        logp = jax.nn.log_softmax(logits[:, 0, :].astype(jnp.float32), axis=-1)
        suppress = state.step < min_len
        if suppress.ndim == 0:
            suppress = suppress[None]
        logp = jnp.where(suppress[:, None] & (jnp.arange(logp.shape[-1])[None] == eos),
                         NEG_INF, logp)
        rng, k = jax.random.split(state.rng)
        rv = jnp.arange(win)[None] < state.recent_n[:, None]
        tok = _sample(cfg.sampling, k, logp, state.recent, rv)
        return tok, rng

    def advance(state, tok, rng, max_len):
        emitted = (tok < eos) & ~state.done
        done = state.done | (tok == eos) | (state.step + 1 >= max_len)
        out = jax.vmap(lambda o, c, t, e: jnp.where(e, o.at[c].set(t), o))(
            state.out, state.count, tok, emitted)
        recent = jax.vmap(lambda r, t, e: jnp.where(e, jnp.roll(r, -1).at[-1].set(t), r))(
            state.recent, tok, emitted)
        recent_n = jnp.minimum(state.recent_n + emitted, win)
        new_emb = model.apply(params, tok[:, None], method=cls.speech_emb)
        prev_emb = jnp.where(emitted[:, None, None], new_emb, state.prev_emb)
        return state._replace(prev_emb=prev_emb, step=state.step + 1,
                              count=state.count + emitted, done=done, out=out,
                              recent=recent, recent_n=recent_n, rng=rng)

    return sample_from, advance


def _decode_machinery(model, params, seq_len, Tp, cache_len, max_steps):
    """sample/advance + the lockstep decode body (same prefix Tp per row)."""
    cfg = model.cfg
    cls = type(model)
    sample_from, advance = _sample_advance(model, params)

    def body(state, min_len, max_len):
        pos = (seq_len + state.step - 1)[:, None]
        slot = jnp.arange(cache_len)[None, None, None, :]
        valid = (slot < seq_len[:, None, None, None]) | \
                ((slot >= Tp) & (slot <= state.cache.pos))
        bias = jnp.where(valid, 0.0, NEG_INF).astype(state.prev_emb.dtype)
        hidden, cache = model.apply(params, state.prev_emb, pos, bias,
                                    state.cache, method=cls.forward_hidden)
        tok, rng = sample_from(hidden, state, min_len)
        return advance(state._replace(cache=cache, rng=rng), tok, rng, max_len)

    return sample_from, advance, body


@partial(jax.jit, static_argnames=("model", "max_steps", "cache_len"))
def lm_prefill_stream(model, params, text, text_len, prompt_speech,
                      prompt_speech_len, min_len, max_len, rng,
                      max_steps: int, cache_len: int) -> StreamState:
    """Prefill + first sample; returns a StreamState for lm_decode_chunk."""
    cfg = model.cfg
    cls = type(model)
    B = text.shape[0]
    params = _decode_params(model, params)
    embeds, seq_len = model.apply(params, text, text_len, prompt_speech,
                                  prompt_speech_len, method=cls.prefill_embeds)
    Tp = embeds.shape[1]
    cache = KVCache.create(cfg.qwen, B, cache_len, dtype=embeds.dtype)
    bias = causal_prefill_bias(Tp, cache_len, seq_len, B, embeds.dtype)
    positions = jnp.broadcast_to(jnp.arange(Tp)[None], (B, Tp))
    hidden, cache = model.apply(params, embeds, positions, bias, cache,
                                method=cls.forward_hidden)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)
    win = cfg.sampling.win_size
    gen = GenState(cache=cache,
                   prev_emb=jnp.zeros((B, 1, embeds.shape[-1]), embeds.dtype),
                   step=jnp.zeros((), jnp.int32),
                   count=jnp.zeros((B,), jnp.int32),
                   done=jnp.zeros((B,), bool),
                   out=jnp.zeros((B, max_steps), jnp.int32),
                   recent=jnp.zeros((B, win), jnp.int32),
                   recent_n=jnp.zeros((B,), jnp.int32), rng=rng)
    sample_from, advance, _ = _decode_machinery(model, params, seq_len, Tp,
                                                cache_len, max_steps)
    tok0, rng0 = sample_from(last, gen, min_len)
    gen = advance(gen, tok0, rng0, max_len)
    return StreamState(gen, seq_len, min_len, max_len)


@partial(jax.jit, static_argnames=("model", "n_steps", "prefix_len",
                                   "cache_len", "max_steps"))
def lm_decode_chunk(model, params, state: StreamState, n_steps: int,
                    prefix_len: int, cache_len: int, max_steps: int) -> StreamState:
    """Advance the decode by up to n_steps (stops early on EOS/max_len)."""
    params = _decode_params(model, params)
    _, _, body = _decode_machinery(model, params, state.seq_len, prefix_len,
                                   cache_len, max_steps)
    start = state.gen.step

    def cond(gen):
        return (~jnp.all(gen.done)) & (gen.step < max_steps) & \
               (gen.step - start < n_steps)

    gen = jax.lax.while_loop(
        cond, lambda g: body(g, state.min_len, state.max_len), state.gen)
    return state._replace(gen=gen)
