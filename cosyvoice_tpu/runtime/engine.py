"""Continuous-batching LM serving engine (slot-based, JetStream-style).

The reference reaches high LM throughput by delegating decode to vLLM/sglang
servers (`cosyvoice/llm/llm.py:2094-2716`), whose core trick is CONTINUOUS
batching: requests join and leave a running decode batch, so the batch stays
full even though sequences finish at different times.  `BatchedSynthesizer`
(runtime/serving.py) gets the batching win but synchronizes the whole batch —
a long request holds every slot hostage (head-of-line blocking).

This module is the TPU-native continuous engine:
  * a fixed number of SLOTS (the decode batch, static shape);
  * `engine_admit` — one jitted prefill that computes a request's prefix K/V
    with B=1 and INSERTS it into the slot's rows of the engine-wide cache
    (donated buffers: XLA updates in place);
  * `engine_decode_segment` — one jitted lax.while_loop advancing ALL slots
    up to n steps; every slot sits at its own sequence length, so the KV
    cache carries a per-row frontier `pos [S]` (the fused Pallas decode
    kernel takes the vector directly; the XLA path vmaps the cache append);
  * a host scheduler that admits pending requests into free slots between
    segments, streams each slot's new tokens to its consumer, and recycles
    slots the moment a sequence finishes.

Decode math is IDENTICAL to models/llm.lm_generate (greedy token parity is
tested under staggered admissions); with stochastic sampling the rng SCHEDULE
differs (one shared chain across slots), which changes draws but not the
distribution.

Differences from the reference's engines, by TPU design: static shapes
everywhere (slot count, cache length, output cap are compile-time), no paged
KV (one contiguous region per slot — CosyVoice sequences are short and
bounded by 20x text len, so fragmentation is not a concern), admission cost
is one bucketed B=1 prefill instead of chunked prefill.
"""
from __future__ import annotations

import queue
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.llm import Qwen2LM, _sample, _sample_advance
from cosyvoice_tpu.models.qwen2 import KVCache, causal_prefill_bias
from cosyvoice_tpu.ops.masks import NEG_INF
from cosyvoice_tpu.runtime.model import round_up


class EngineState(NamedTuple):
    """All decode state, one row per slot.  done=True marks both finished and
    empty slots, so a segment's while_loop exits early when nothing is live."""

    cache: KVCache          # k/v per layer; pos [S] per-row frontier
    prev_emb: jax.Array     # [S, 1, D] next input embedding
    step: jax.Array         # [S] decode steps taken (incl. non-emitted)
    count: jax.Array        # [S] emitted tokens
    done: jax.Array         # [S] bool
    out: jax.Array          # [S, max_out] emitted tokens
    recent: jax.Array       # [S, win] last emitted (RAS window)
    recent_n: jax.Array     # [S]
    min_len: jax.Array      # [S]
    max_len: jax.Array      # [S]
    rng: jax.Array


def engine_init(model: Qwen2LM, num_slots: int, cache_len: int, max_out: int,
                rng, dtype) -> EngineState:
    cfg = model.cfg
    base = KVCache.create(cfg.qwen, num_slots, cache_len, dtype=dtype)
    S = num_slots
    win = cfg.sampling.win_size
    return EngineState(
        cache=KVCache(base.k, base.v, jnp.zeros((S,), jnp.int32)),
        prev_emb=jnp.zeros((S, 1, cfg.llm_input_size), dtype),
        step=jnp.zeros((S,), jnp.int32),
        count=jnp.zeros((S,), jnp.int32),
        done=jnp.ones((S,), bool),
        out=jnp.zeros((S, max_out), jnp.int32),
        recent=jnp.zeros((S, win), jnp.int32),
        recent_n=jnp.zeros((S,), jnp.int32),
        min_len=jnp.zeros((S,), jnp.int32),
        max_len=jnp.full((S,), 1, jnp.int32),
        rng=rng)


@partial(jax.jit, static_argnames=("model",), donate_argnames=("state",))
def engine_admit(model: Qwen2LM, params, state: EngineState, slot,
                 text, text_len, prompt_speech, prompt_speech_len,
                 min_len, max_len) -> EngineState:
    """Prefill one request (B=1, bucketed lengths) and install it in `slot`.

    Compiles once per (text, prompt_speech) bucket shape.  The prefix K/V is
    computed against a small [1, Tp] cache and inserted into the slot's rows;
    rows past the true prefix length hold garbage but sit beyond the slot's
    frontier (pos = seq_len), and decode overwrites them one by one.
    """
    cls = type(model)
    embeds, seq_len = model.apply(params, text[None], text_len[None],
                                  prompt_speech[None], prompt_speech_len[None],
                                  method=cls.prefill_embeds)
    return _engine_install(model, params, state, slot, embeds, seq_len,
                           min_len, max_len)


@partial(jax.jit, static_argnames=("model",), donate_argnames=("state",))
def engine_admit_pho(model, params, state: EngineState, slot,
                     text, text_len, pho_token, pho_len,
                     prompt_speech, prompt_speech_len, embedding,
                     min_len, max_len) -> EngineState:
    """Admit for the phoneme LM variants (Qwen2LMPhoneme/_Src/_Src2 — the
    reference's production serving model behind sglang/vllm,
    llm/llm.py:2094-2716): prefix built by `prefix_for_decode` (text+phoneme
    fusion + speaker embedding); decode machinery is shared."""
    cls = type(model)
    embeds, seq_len = model.apply(
        params, text[None], text_len[None], pho_token[None], pho_len[None],
        prompt_speech[None], prompt_speech_len[None], embedding[None],
        method=cls.prefix_for_decode)
    return _engine_install(model, params, state, slot, embeds, seq_len,
                           min_len, max_len)


@partial(jax.jit, static_argnames=("model",), donate_argnames=("state",))
def engine_admit_many(model: Qwen2LM, params, state: EngineState, slots,
                      text, text_len, prompt_speech, prompt_speech_len,
                      min_len, max_len) -> EngineState:
    """Admit K requests in ONE jitted program (batched prefill + scatter
    install).  slots [K] int32; text [K, Tt]; the rest [K]-vectors.

    Sequential B=1 admits cost a full program dispatch each (~30 ms through
    a remote tunnel); a burst of K arrivals pays that K times where one
    batched prefill amortizes it — the same reason the one-shot path
    prefills the whole batch at once.  Math per row is identical to
    engine_admit; the rng chain is split ONCE per group (vs once per
    sequential admit), so greedy decoding is unchanged while stochastic
    draws differ in schedule only.  Compiles once per (K, Tt, Ts) bucket —
    callers pad K to a small set of group sizes (duplicate rows aimed at the
    same slot scatter identical values, so padding with copies of row 0 is
    exact)."""
    cls = type(model)
    embeds, seq_len = model.apply(params, text, text_len,
                                  prompt_speech, prompt_speech_len,
                                  method=cls.prefill_embeds)
    return _engine_install_many(model, params, state, slots, embeds, seq_len,
                                min_len, max_len)


@partial(jax.jit, static_argnames=("model",), donate_argnames=("state",))
def engine_admit_many_pho(model, params, state: EngineState, slots,
                          text, text_len, pho_token, pho_len,
                          prompt_speech, prompt_speech_len, embedding,
                          min_len, max_len) -> EngineState:
    """Batched-admit twin of engine_admit_pho (phoneme-LM prefix builder)."""
    cls = type(model)
    embeds, seq_len = model.apply(
        params, text, text_len, pho_token, pho_len,
        prompt_speech, prompt_speech_len, embedding,
        method=cls.prefix_for_decode)
    return _engine_install_many(model, params, state, slots, embeds, seq_len,
                                min_len, max_len)


def _engine_install_many(model, params, state: EngineState, slots, embeds,
                         seq_len, min_len, max_len) -> EngineState:
    """Batched admit tail: prefix K/V for K rows, scattered into `slots`,
    first token sampled per row (same math as _engine_install)."""
    cfg = model.cfg
    cls = type(model)
    K, Tp = embeds.shape[:2]
    pcache = KVCache.create(cfg.qwen, K, Tp, dtype=embeds.dtype)
    bias = causal_prefill_bias(Tp, Tp, seq_len, K, embeds.dtype)
    positions = jnp.broadcast_to(jnp.arange(Tp)[None], (K, Tp))
    hidden, pcache = model.apply(params, embeds, positions, bias, pcache,
                                 method=cls.forward_hidden)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)

    if cfg.qwen.fused_cache_update:  # packed [S, Tmax, KH*D]
        ins = lambda c, u: c.at[slots, :Tp, :].set(u)
    else:                            # head-major [S, KH, Tmax, D]
        ins = lambda c, u: c.at[slots, :, :Tp, :].set(u)
    k = tuple(ins(c, u) for c, u in zip(state.cache.k, pcache.k))
    v = tuple(ins(c, u) for c, u in zip(state.cache.v, pcache.v))

    # first token per row, same math as _engine_install.  The sample key is
    # folded PER SLOT ID: callers pad the group to a bucket size with copies
    # of row 0 aimed at slots[0], and under stochastic sampling (RAS) a
    # shared key would give each duplicate row different bits — the ~10
    # duplicate-index scatters below would then depend on XLA's unspecified
    # duplicate-scatter ordering.  Same slot => same key => same draw, so
    # every duplicate row scatters identical values and padding stays exact
    # for ALL sampling methods, not just greedy.
    win = cfg.sampling.win_size
    logits = model.apply(params, last, method=cls.decode_logits)
    logp = jax.nn.log_softmax(logits[:, 0, :].astype(jnp.float32), axis=-1)
    eos = cfg.eos_token
    logp = jnp.where((0 < min_len)[:, None]
                     & (jnp.arange(logp.shape[-1])[None] == eos),
                     NEG_INF, logp)
    rng, kk = jax.random.split(state.rng)
    keys = jax.vmap(lambda s: jax.random.fold_in(kk, s))(slots)
    tok0 = jax.vmap(
        lambda key, lp: _sample(cfg.sampling, key, lp[None],
                                jnp.zeros((1, win), jnp.int32),
                                jnp.zeros((1, win), bool))[0])(keys, logp)

    emitted = tok0 < eos
    new_emb = model.apply(params, tok0[:, None], method=cls.speech_emb)
    prev_rows = jnp.where(emitted[:, None, None], new_emb,
                          jnp.zeros_like(new_emb))
    tok_emit = jnp.where(emitted, tok0, 0)
    out_rows = jnp.zeros((K, state.out.shape[1]), jnp.int32
                         ).at[:, 0].set(tok_emit)
    rec_rows = jnp.zeros((K, win), jnp.int32).at[:, win - 1].set(tok_emit)
    return state._replace(
        cache=KVCache(k, v, state.cache.pos.at[slots].set(seq_len)),
        prev_emb=state.prev_emb.at[slots].set(
            prev_rows.astype(state.prev_emb.dtype)),
        step=state.step.at[slots].set(1),
        count=state.count.at[slots].set(emitted.astype(jnp.int32)),
        done=state.done.at[slots].set((tok0 == eos) | (1 >= max_len)),
        out=state.out.at[slots].set(out_rows),
        recent=state.recent.at[slots].set(rec_rows),
        recent_n=state.recent_n.at[slots].set(emitted.astype(jnp.int32)),
        min_len=state.min_len.at[slots].set(min_len),
        max_len=state.max_len.at[slots].set(max_len),
        rng=rng)


def _engine_install(model, params, state: EngineState, slot, embeds, seq_len,
                    min_len, max_len) -> EngineState:
    """Shared admit tail: run the prefix through the body into a small
    cache, splice it into the slot, sample the first token."""
    cfg = model.cfg
    cls = type(model)
    Tp = embeds.shape[1]
    pcache = KVCache.create(cfg.qwen, 1, Tp, dtype=embeds.dtype)
    bias = causal_prefill_bias(Tp, Tp, seq_len, 1, embeds.dtype)
    positions = jnp.broadcast_to(jnp.arange(Tp)[None], (1, Tp))
    hidden, pcache = model.apply(params, embeds, positions, bias, pcache,
                                 method=cls.forward_hidden)
    last = jnp.take_along_axis(hidden, (seq_len - 1)[:, None, None], axis=1)

    if cfg.qwen.fused_cache_update:  # packed [S, Tmax, KH*D]
        ins = lambda c, u: jax.lax.dynamic_update_slice(c, u, (slot, 0, 0))
    else:                            # head-major [S, KH, Tmax, D]
        ins = lambda c, u: jax.lax.dynamic_update_slice(c, u, (slot, 0, 0, 0))
    k = tuple(ins(c, u) for c, u in zip(state.cache.k, pcache.k))
    v = tuple(ins(c, u) for c, u in zip(state.cache.v, pcache.v))

    def set1(vec, val):
        return vec.at[slot].set(val.astype(vec.dtype) if hasattr(val, "astype") else val)

    win = cfg.sampling.win_size
    st = state._replace(
        cache=KVCache(k, v, set1(state.cache.pos, seq_len[0])),
        prev_emb=jax.lax.dynamic_update_slice(
            state.prev_emb, jnp.zeros((1, 1, state.prev_emb.shape[-1]),
                                      state.prev_emb.dtype), (slot, 0, 0)),
        step=set1(state.step, 0),
        count=set1(state.count, 0),
        done=set1(state.done, False),
        out=jax.lax.dynamic_update_slice(
            state.out, jnp.zeros((1, state.out.shape[1]), jnp.int32), (slot, 0)),
        recent=jax.lax.dynamic_update_slice(
            state.recent, jnp.zeros((1, win), jnp.int32), (slot, 0)),
        recent_n=set1(state.recent_n, 0),
        min_len=set1(state.min_len, min_len),
        max_len=set1(state.max_len, max_len))

    # first token, same math as lm_generate's prefill sample — computed for
    # every slot then applied to `slot` only
    logits = model.apply(params, last, method=cls.decode_logits)
    logp = jax.nn.log_softmax(logits[:, 0, :].astype(jnp.float32), axis=-1)
    eos = cfg.eos_token
    logp = jnp.where((0 < min_len) & (jnp.arange(logp.shape[-1])[None] == eos),
                     NEG_INF, logp)
    rng, kk = jax.random.split(st.rng)
    tok0 = _sample(cfg.sampling, kk, logp,
                   jnp.zeros((1, win), jnp.int32), jnp.zeros((1, win), bool))[0]

    emitted = tok0 < eos
    new_emb = model.apply(params, tok0[None, None], method=cls.speech_emb)
    prev_row = jnp.where(emitted, new_emb[0],
                         jnp.zeros((1, new_emb.shape[-1]), new_emb.dtype))
    return st._replace(
        prev_emb=jax.lax.dynamic_update_slice(
            st.prev_emb, prev_row[None].astype(st.prev_emb.dtype), (slot, 0, 0)),
        step=set1(st.step, 1),
        count=set1(st.count, emitted.astype(jnp.int32)),
        done=set1(st.done, (tok0 == eos) | (1 >= max_len)),
        out=st.out.at[slot, 0].set(jnp.where(emitted, tok0, 0)),
        recent=st.recent.at[slot, win - 1].set(jnp.where(emitted, tok0, 0)),
        recent_n=set1(st.recent_n, emitted.astype(jnp.int32)),
        rng=rng)


@partial(jax.jit, static_argnames=("model", "n_steps"),
         donate_argnames=("state",))
def engine_decode_segment(model: Qwen2LM, params, state: EngineState,
                          n_steps: int) -> EngineState:
    """Advance every live slot by up to n_steps tokens (early-exit when all
    slots are done).  One while_loop; slots at different sequence lengths."""
    cfg = model.cfg
    cls = type(model)
    from cosyvoice_tpu.models.llm import _decode_params
    params = _decode_params(model, params)
    cache_len = state.cache.k[0].shape[-2] if not cfg.qwen.fused_cache_update \
        else state.cache.k[0].shape[1]
    start = state.step

    sample_from, advance = _sample_advance(model, params)

    def body(st: EngineState) -> EngineState:
        # freeze done rows' frontiers (their writes land in one scratch row)
        pos0 = jnp.minimum(st.cache.pos, cache_len - 1)
        key_ok = jnp.arange(cache_len)[None, :] <= pos0[:, None]
        bias = jnp.where(key_ok[:, None, None, :], 0.0, NEG_INF
                         ).astype(st.prev_emb.dtype)
        hidden, cache = model.apply(
            params, st.prev_emb, pos0[:, None],
            bias, st.cache._replace(pos=pos0), method=cls.forward_hidden)
        cache = cache._replace(pos=jnp.where(st.done, pos0, pos0 + 1))
        tok, rng = sample_from(hidden, st, st.min_len)
        return advance(st._replace(cache=cache), tok, rng, st.max_len)

    def cond(st: EngineState):
        return (~jnp.all(st.done)) & jnp.any(st.step - start < n_steps)

    return jax.lax.while_loop(cond, body, state)


@jax.jit
def _pack_harvest(count, done, out):
    """[S], [S] bool, [S, max_out] -> one [S, max_out + 2] int32 array."""
    return jnp.concatenate([out, count[:, None],
                            done.astype(jnp.int32)[:, None]], axis=1)


# --------------------------------------------------------------------------
# host scheduler
# --------------------------------------------------------------------------

@dataclass
class GenRequest:
    """One LM generation request (ids already tokenized/assembled)."""

    text: np.ndarray                 # [Tt] prompt_text ++ text ids
    prompt_speech: np.ndarray        # [Ts] prompt speech tokens
    min_len: Optional[int] = None    # default 2x / 20x new-text len
    max_len: Optional[int] = None
    new_text_len: Optional[int] = None  # len basis for min/max (default: all)
    # phoneme LM requests (Qwen2LMPhoneme*): 4-way factored ids + spk vector
    pho_token: Optional[np.ndarray] = None   # [Tp, 4]
    embedding: Optional[np.ndarray] = None   # [spk_embed_dim]


@dataclass
class ServingEngine:
    """Continuous-batching scheduler over the jitted admit/segment programs.

    generate() keeps `num_slots` sequences decoding concurrently, admitting
    pending requests the moment a slot frees up, and streams each request's
    new tokens through `on_tokens(request_index, tokens, done)` after every
    segment — the hook the streaming TTS pipeline (flow+vocoder chunking)
    consumes.  Decode runs in segments of `segment_steps` tokens between
    scheduler interventions (50 tokens = one 2 s flow chunk).
    """

    model: Qwen2LM
    params: dict
    num_slots: int = 8
    cache_len: int = 1024
    max_out: int = 768
    segment_steps: int = 50
    # extra steps for the segment right after an admission: a fresh slot has
    # 1 token (the admit sample), so a consumer needing hop+lookahead tokens
    # per chunk (streaming TTS: 50+3) would otherwise wait TWO segments
    # (1+50 < 53) for its first chunk — ~2x the first-chunk decode latency.
    # ContinuousSynthesizer passes lookahead-1 so 1 + (50+2) = 53 exactly.
    first_segment_extra: int = 0
    text_bucket: int = 32
    speech_bucket: int = 64

    def serve(self, submissions, rng=None,
              on_segment: Optional[Callable] = None) -> None:
        """Online scheduler: pull (GenRequest, on_tokens) pairs from the
        thread-safe `submissions` queue.Queue while decoding.  Blocks on the
        queue only when no slot is live; a None item drains live work and
        returns.  on_tokens(new_tokens, done) is per-request here (bind the
        request identity into the callback).  on_segment() fires once per
        segment after its on_tokens, AFTER the next segment has been
        dispatched — consumer work overlaps decode (dispatch-ahead; true
        two-chip overlap when the consumer computes on another device)."""
        cfg = self.model.cfg
        dtype = jax.tree.leaves(self.params)[0].dtype
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        state = engine_init(self.model, self.num_slots, self.cache_len,
                            self.max_out, rng, dtype)
        slot_cb: dict[int, Callable] = {}   # slot -> per-request on_tokens
        seen: dict[int, int] = {}           # slot -> tokens already streamed
        free = list(range(self.num_slots))[::-1]
        stopping = False

        def prep(r: GenRequest) -> dict:
            """Bucket/pad one request's host arrays + derive min/max lens."""
            tt = np.asarray(r.text, np.int32)
            ps = np.asarray(r.prompt_speech, np.int32)
            ntl = r.new_text_len if r.new_text_len is not None else len(tt)
            mn = r.min_len if r.min_len is not None else \
                int(cfg.min_token_text_ratio * ntl)
            mx = r.max_len if r.max_len is not None else \
                int(cfg.max_token_text_ratio * ntl)
            mx = min(mx, self.max_out)
            Tt = round_up(max(len(tt), 1), self.text_bucket)
            Ts = round_up(max(len(ps), 1), self.speech_bucket)
            # conservative prefix bound; phoneme prefixes add the (bucketed)
            # phoneme stream and a speaker slot
            Tp = (round_up(max(len(r.pho_token), 1), self.text_bucket)
                  if r.pho_token is not None else 0)
            need = 3 + Tt + Tp + Ts + mx
            assert need <= self.cache_len, \
                f"request needs {need} cache rows > {self.cache_len}"
            text = np.zeros(Tt, np.int32)
            text[:len(tt)] = tt
            psp = np.zeros(Ts, np.int32)
            psp[:len(ps)] = ps
            pho_pad = pho_len = emb = None
            if r.pho_token is not None:
                pho = np.asarray(r.pho_token, np.int32)
                pho_pad = np.zeros((Tp, pho.shape[1]), np.int32)
                pho_pad[:len(pho)] = pho
                pho_len = len(pho)
                emb = np.asarray(r.embedding, np.float32)
            return dict(text=text, tlen=len(tt), psp=psp, plen=len(ps),
                        pho=pho_pad, pho_len=pho_len, emb=emb, mn=mn, mx=mx,
                        key=(Tt, Ts, Tp if pho_pad is not None else -1))

        def dispatch_one(slot: int, p: dict) -> EngineState:
            a = jnp.asarray
            if p["pho"] is not None:
                return engine_admit_pho(
                    self.model, self.params, state, a(slot, jnp.int32),
                    a(p["text"]), a(p["tlen"], jnp.int32), a(p["pho"]),
                    a(p["pho_len"], jnp.int32), a(p["psp"]),
                    a(p["plen"], jnp.int32), a(p["emb"]),
                    a(p["mn"], jnp.int32), a(p["mx"], jnp.int32))
            return engine_admit(self.model, self.params, state,
                                a(slot, jnp.int32), a(p["text"]),
                                a(p["tlen"], jnp.int32), a(p["psp"]),
                                a(p["plen"], jnp.int32),
                                a(p["mn"], jnp.int32), a(p["mx"], jnp.int32))

        def dispatch_many(slots: list, ps: list) -> EngineState:
            """One batched-admit program for a same-bucket group.  K is
            padded to the next power of two with copies of row 0 aimed at
            slots[0] (identical scattered values — exact), bounding compile
            variants to log2 group sizes."""
            K = len(ps)
            Kp = 1 << (K - 1).bit_length()
            rows = ps + [ps[0]] * (Kp - K)
            sl = np.asarray(slots + [slots[0]] * (Kp - K), np.int32)
            a = jnp.asarray
            text = a(np.stack([q["text"] for q in rows]))
            tlen = a(np.asarray([q["tlen"] for q in rows], np.int32))
            psp = a(np.stack([q["psp"] for q in rows]))
            plen = a(np.asarray([q["plen"] for q in rows], np.int32))
            mn = a(np.asarray([q["mn"] for q in rows], np.int32))
            mx = a(np.asarray([q["mx"] for q in rows], np.int32))
            if rows[0]["pho"] is not None:
                pho = a(np.stack([q["pho"] for q in rows]))
                pho_len = a(np.asarray([q["pho_len"] for q in rows], np.int32))
                emb = a(np.stack([q["emb"] for q in rows]))
                return engine_admit_many_pho(
                    self.model, self.params, state, a(sl), text, tlen,
                    pho, pho_len, psp, plen, emb, mn, mx)
            return engine_admit_many(self.model, self.params, state, a(sl),
                                     text, tlen, psp, plen, mn, mx)

        def admit_all(items: list) -> None:
            """Admit a burst: same-bucket requests share ONE batched-admit
            program; singletons fall back to the B=1 program."""
            nonlocal state
            from collections import defaultdict
            groups: dict = defaultdict(list)
            for r, cb in items:
                p = prep(r)
                groups[p["key"]].append((p, cb))
            for members in groups.values():
                slots = [free.pop() for _ in members]
                if len(members) == 1:
                    state = dispatch_one(slots[0], members[0][0])
                else:
                    state = dispatch_many(slots, [p for p, _ in members])
                for slot, (_, cb) in zip(slots, members):
                    slot_cb[slot] = cb
                    seen[slot] = 0

        def pull(block_idle: bool) -> bool:
            """Admit into free slots; returns True if anything was admitted.
            block_idle=True may block waiting for work when nothing is live;
            inside the decode loop it must be False — consumer flushes
            (on_segment) are still pending there and blocking before them
            would stall the last chunks of a request until unrelated new
            work arrived.  All currently-available submissions are drained
            FIRST, then admitted together (same-bucket ones in one batched
            program) — a burst of K costs ~1 dispatch instead of K."""
            nonlocal state, stopping
            pending: list = []
            while len(pending) < len(free) and not stopping:
                try:
                    item = submissions.get(
                        block=block_idle and not slot_cb and not pending)
                except queue.Empty:
                    break
                if item is None:
                    stopping = True
                    break
                pending.append(item)
            if pending:
                admit_all(pending)
                return True
            return False

        def harvest(packed):
            """Stream new tokens from a fetched harvest array, free
            finished slots.  count/done/out are packed into ONE array on
            device first — through a remote-TPU tunnel each separate
            device->host fetch costs a full round trip (~30 ms)."""
            count = packed[:, -2]
            done = packed[:, -1].astype(bool)
            out = packed[:, :-2]
            for slot in list(slot_cb):
                cb = slot_cb[slot]
                c = int(count[slot])
                new = out[slot, seen[slot]:c]
                fin = bool(done[slot])
                if len(new) or fin:
                    cb(new.copy(), fin)
                seen[slot] = c
                if fin:
                    del slot_cb[slot], seen[slot]
                    free.append(slot)

        def segment_steps_for(admitted: bool) -> int:
            return self.segment_steps + (self.first_segment_extra if admitted
                                         else 0)

        # Software-pipelined harvest: the packed harvest of segment k is
        # DISPATCHED right after segment k (so on the serial device queue it
        # completes before the consumer flush's flow/vocode programs) and
        # READ one loop iteration later, after on_segment() has dispatched
        # that heavy work — by then the decode+pack have long finished and
        # the read returns without stalling.  Eagerly reading it between
        # decode and flush (the old order) paid a full tunnel round trip per
        # segment with the device otherwise idle.
        while True:
            admitted = pull(block_idle=True)
            if not slot_cb:
                if stopping:
                    return
                continue
            state = engine_decode_segment(self.model, self.params, state,
                                          segment_steps_for(admitted))
            pending = _pack_harvest(state.count, state.done, state.out)
            while slot_cb:
                harvest(np.asarray(pending))
                admitted = pull(block_idle=False)
                if slot_cb:
                    state = engine_decode_segment(
                        self.model, self.params, state,
                        segment_steps_for(admitted))
                    pending = _pack_harvest(state.count, state.done,
                                            state.out)
                if on_segment is not None:
                    on_segment()
            if stopping:
                return

    def generate(self, requests: Sequence[GenRequest], rng=None,
                 on_tokens: Optional[Callable] = None,
                 on_segment: Optional[Callable] = None) -> list[np.ndarray]:
        """Batch driver over serve(): on_tokens(request_index, new_tokens,
        done) fires per slot after each segment; on_segment() once per
        segment after them (the flush point for consumers that batch work
        across requests, e.g. batched flow chunks)."""
        subs: queue.Queue = queue.Queue()
        acc: list[list[int]] = [[] for _ in requests]
        results: list[Optional[np.ndarray]] = [None] * len(requests)

        def cb_for(i):
            def cb(new, fin):
                acc[i].extend(new.tolist())
                if on_tokens is not None:
                    on_tokens(i, new, fin)
                if fin:
                    results[i] = np.asarray(acc[i], np.int32)
            return cb

        for i, r in enumerate(requests):
            subs.put((r, cb_for(i)))
        subs.put(None)
        self.serve(subs, rng=rng, on_segment=on_segment)
        return results  # type: ignore[return-value]
