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

import functools
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec
from cosyvoice_tpu.models.hift import HiFTGenerator
from cosyvoice_tpu.models.llm import lm_generate
from cosyvoice_tpu.runtime.model import CosyVoice2Model, round_up


@functools.lru_cache(maxsize=None)
def _make_flow_ragged(flow_model):
    """One jitted ragged-batched flow program per flow module (cached so the
    batched and continuous synthesizers over the same model share compiles)."""

    @partial(jax.jit, static_argnames=("streaming",))
    def _flow_ragged(params, token, token_len, prompt_feat, emb, pfl,
                     noise=None, streaming=False):
        return flow_model.apply(params, token, token_len, prompt_feat, emb,
                                prompt_feat_len=pfl, noise=noise,
                                streaming=streaming,
                                method=type(flow_model).inference)

    return _flow_ragged


def _noise_for(model: CosyVoice2Model, bucket_tokens: int):
    """Slice the model's pinned CFM noise (reference seed-0 buffer) to the
    batch's mel bucket, exactly as the sequential _flow_chunk does — so the
    engine paths and tts() synthesize identical audio from one checkpoint
    (reference flow_matching.py:212-213,235 slices one fixed buffer)."""
    if model.flow_noise is None:
        return None
    need = model.ratio * bucket_tokens
    assert model.flow_noise.shape[1] >= need, (
        f"flow_noise buffer ({model.flow_noise.shape[1]} frames) too short "
        f"for {need} mel frames")
    return jnp.asarray(model.flow_noise[:, :need])


@dataclass
class TTSRequest:
    text_tokens: np.ndarray            # prompt_text ++ text ids
    prompt_text_len: int
    prompt_speech_tokens: np.ndarray
    prompt_feat: np.ndarray            # [P, 80]
    embedding: np.ndarray              # [spk_dim]
    # phoneme-LM serving (Qwen2LMPhoneme*): 4-way factored phoneme ids; the
    # speaker vector above doubles as the LM's spk embedding
    pho_token: Optional[np.ndarray] = None     # [Tp, 4]


@dataclass
class BatchedSynthesizer:
    """mesh: optional jax.sharding.Mesh("data", "model") — multi-chip
    serving.  LM params shard by the TP rules (parallel/mesh.py LM_RULES),
    flow/vocoder params replicate, every batch shards on "data"; GSPMD
    inserts the ICI collectives.  Token/wav outputs are identical to
    single-device (test_lm_generate_tp_dp_sharded_matches_single_device)."""

    model: CosyVoice2Model
    text_bucket: int = 32              # pad text lengths to multiples
    speech_bucket: int = 64
    mesh: Optional[object] = None

    def __post_init__(self):
        flow_model, hift_model = self.model.flow, self.model.hift
        self._data_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from cosyvoice_tpu.parallel.mesh import LM_RULES, shard_params

            m = self.model
            m.llm_params, _ = shard_params(m.llm_params, self.mesh, LM_RULES)
            repl = NamedSharding(self.mesh, PartitionSpec())
            m.flow_params = jax.device_put(m.flow_params, repl)
            m.hift_params = jax.device_put(m.hift_params, repl)
            self._data_sharding = NamedSharding(self.mesh, PartitionSpec("data"))

        @jax.jit
        def _hift_batch(params, mel, rng):
            return hift_model.apply(params, mel, rngs={"noise": rng},
                                    method=type(hift_model).inference)

        self._flow_ragged = _make_flow_ragged(flow_model)
        self._hift_batch = _hift_batch

    def synthesize_batch(self, requests: Sequence[TTSRequest],
                         rng=None) -> list[np.ndarray]:
        """Synthesize B requests concurrently (non-streaming): batched LM
        decode, then ONE ragged-batched flow call (per-row prompt lengths)
        and ONE batched vocoder call — all three stages amortize weight
        reads across the batch, not just the LM."""
        m = self.model
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        orig_B = len(requests)
        if self._data_sharding is not None:
            # pad the batch to the data-axis size (dup rows, sliced off at
            # return) so every shard gets equal rows
            d = self.mesh.shape["data"]
            requests = list(requests) + [requests[-1]] * ((-orig_B) % d)
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
        allowed = np.zeros(B, np.int32)
        cap = 0
        for i, r in enumerate(requests):
            n = len(r.text_tokens)
            text[i, :n] = r.text_tokens
            tlen[i] = n
            k = len(r.prompt_speech_tokens)
            psp[i, :k] = r.prompt_speech_tokens
            plen[i] = k
            new_text = n - r.prompt_text_len
            min_len[i] = int(new_text * m.llm.cfg.min_token_text_ratio)
            allowed[i] = int(new_text * m.llm.cfg.max_token_text_ratio)
            cap = max(cap, m.decode_cap(new_text))
            max_len[i] = min(int(allowed[i]), cap)
        cache_len = round_up(2 + Tt + Ts + cap, 128)

        def put(x, dtype=None):
            a = jnp.asarray(x, dtype=dtype)
            return jax.device_put(a, self._data_sharding) \
                if self._data_sharding is not None else a

        out, count = lm_generate(m.llm, m.llm_params, put(text),
                                 put(tlen), put(psp),
                                 put(plen), put(min_len),
                                 put(max_len), rng, max_steps=cap,
                                 cache_len=cache_len)
        out = np.asarray(out)
        count = np.asarray(count)
        for i in range(B):
            m._warn_if_capped(int(count[i]), int(allowed[i]), int(max_len[i]))
        # flow: prompt ++ generated per row, one ragged-batched call
        ratio = m.ratio
        n_mel = m.flow.cfg.output_size
        tls = [len(requests[i].prompt_speech_tokens) + int(count[i])
               for i in range(B)]
        Ttok = round_up(max(tls), self.speech_bucket)
        tok = np.zeros((B, Ttok), np.int32)
        pfl = np.zeros(B, np.int32)
        Pmax = max(r.prompt_feat.shape[0] for r in requests)
        pf = np.zeros((B, Pmax, n_mel), np.float32)
        emb = np.stack([np.asarray(r.embedding, np.float32) for r in requests])
        for i, r in enumerate(requests):
            ps = r.prompt_speech_tokens
            tok[i, :len(ps)] = ps
            tok[i, len(ps):tls[i]] = out[i, :count[i]]
            pfl[i] = r.prompt_feat.shape[0]
            pf[i, :pfl[i]] = r.prompt_feat
        mel = np.asarray(self._flow_ragged(
            m.flow_params, put(tok), put(tls, dtype=jnp.int32),
            put(pf), put(emb), put(pfl), _noise_for(m, Ttok)))
        # vocoder: repack each row's generated region, one batched call
        Ls = [ratio * tls[i] - int(pfl[i]) for i in range(B)]
        Lmax = round_up(max(Ls), 32)
        gen = np.zeros((B, Lmax, n_mel), np.float32)
        for i in range(B):
            gen[i, :Ls[i]] = mel[i, pfl[i]: ratio * tls[i]]
        wav, _ = self._hift_batch(m.hift_params, put(gen),
                                  jax.random.fold_in(rng, 1))
        wav = np.asarray(wav)
        return [wav[i, : Ls[i] * m.hop_samples] for i in range(orig_B)]


@dataclass
class ContinuousSynthesizer:
    """Streaming TTS under continuous batching.

    The LM runs in the slot engine (runtime/engine.py) so sequences join and
    leave the decode batch independently; after every decode segment, each
    request whose token stream has grown past the next hop boundary gets its
    flow+vocoder chunk (the reference's streaming constants: hop 50 tokens,
    lookahead 3, fade caches — runtime/model.py token2wav).  `on_chunk`
    receives (request_index, wav_chunk, final) as chunks materialize — the
    continuous analog of the reference's per-session producer thread +
    consumer poll (cli/model.py:177-238).

    With batch_chunks (default) all chunk jobs that become ready at a segment
    boundary run as ONE ragged-batched flow call per streaming group (the
    10-step CFM is the expensive stage; estimator weights are read once for
    the whole group instead of once per request); vocoding stays per-session
    for the fade caches.  Requires the pad-invariant estimator inference
    (exact_pad_mask), so batched outputs match the sequential path to fp
    tolerance.
    """

    model: CosyVoice2Model
    num_slots: int = 8
    cache_len: int = 1024
    # per-request token cap; None = the model's max_decode_tokens, so the
    # engine never truncates below what the sequential tts() path allows
    max_out: Optional[int] = None
    text_bucket: int = 32
    speech_bucket: int = 64
    batch_chunks: bool = True
    # progressive hop: each stream's chunk hop GROWS by this factor per chunk
    # (rounded to a base-hop multiple, capped at max_hop).  1.0 = the
    # reference v2 fixed 50-token hop.  The reference's v1 engine grew its
    # hop the same way (cli/model.py:34-36 token_min/max_hop_len) because
    # later chunks don't gate TTFB — a bigger hop amortizes the per-chunk
    # re-run of the prompt/context rows over more emitted audio, cutting
    # total flow work (the dominant serving cost) while the first chunk
    # still lands after hop+la tokens.  Audio stays seam-free (same fade
    # caches); chunk boundaries differ from the fixed-hop schedule, so
    # enable it on the continuous serving path, not the parity-pinned
    # sequential one.
    hop_scale: float = 1.0
    max_hop: Optional[int] = None          # default 4x base hop
    # place flow+vocoder on a different chip than the LM: their params move
    # there and every chunk jit dispatches there, so chunk synthesis runs
    # CONCURRENTLY with the next decode segment (the engine dispatches ahead)
    # — two-chip stage pipelining, the reference's producer-thread/consumer
    # split across devices instead of across Python threads
    flow_device: Optional[object] = None
    # INCREMENTAL flow serving (runtime/flow_engine.py): every mel row is
    # computed once against cached per-slot state instead of re-running the
    # prompt+context window per chunk.  Requires model.flow in the stream
    # config (estimator.stream=True, finite estimator.left_chunks); audio
    # follows the stream-masked model (chunk-causal attention with bounded
    # left context), not the windowed full-attention path — the documented
    # serving trade (models/flow_chunk.py).  flow_context_tokens is unused
    # in this mode.
    incremental: bool = False
    flow_tok_cap: Optional[int] = None   # default: 256 + max_out

    def __post_init__(self):
        self._flow_ragged = _make_flow_ragged(self.model.flow)
        if self.flow_device is not None:
            m = self.model
            m.flow_params = jax.device_put(m.flow_params, self.flow_device)
            m.hift_params = jax.device_put(m.hift_params, self.flow_device)
        self._fse = None
        if self.incremental:
            from cosyvoice_tpu.models.flow import _fixed_noise
            from cosyvoice_tpu.runtime.flow_engine import FlowSlotEngine

            m = self.model
            cap = self.flow_tok_cap or 256 + (self.max_out
                                              or m.max_decode_tokens)
            noise = (m.flow_noise if m.flow_noise is not None else
                     _fixed_noise(m.flow.cfg.cfm.noise_frames,
                                  m.flow.cfg.output_size))
            edt = jnp.dtype(m.flow.cfg.encoder_dtype)
            cdt = jnp.dtype(m.flow.cfg.estimator.dtype)
            self._fse = FlowSlotEngine(
                m.flow, m.flow_params, self.num_slots, cap, noise,
                spk_dim=m.flow.cfg.spk_embed_dim, enc_dtype=edt,
                est_dtype=cdt)

    def _flush_group(self, jobs, emit, streaming: bool):
        """One ragged-batched flow call over `jobs` (each (stream, tokens,
        offset, final, hop)), then per-session vocode.

        Every job's mel is sliced exactly as the sequential token2wav does:
        generated region starts at the prompt-feat rows, valid length is
        ratio*(n_tokens - n_prompt_tokens), chunk begins at offset*ratio.

        The flow batch is PADDED to a power of two (copies of row 0, output
        rows sliced off): which jobs become ready at a segment boundary
        depends on host timing, so the raw group size varies run to run —
        without bucketing every new size compiles a fresh flow program
        mid-serving (measured as multi-second stalls and a 2x run-to-run
        aggregate spread).  Padding is exact per row (exact_pad_mask flow +
        per-row noise), and costs at most one extra power-of-two step of
        batch on an already-batched call.
        """
        m = self.model
        ratio = m.ratio
        n_mel = m.flow.cfg.output_size
        B = len(jobs)
        Bp = 1 << (B - 1).bit_length()
        tls, toks, drops = [], [], []
        for st, tok, off, fin, hop in jobs:
            ps = st.req.prompt_speech_tokens
            # context window (model.flow_context_tokens): same drop the
            # sequential _flow_chunk computes, so the paths stay identical
            d = m.flow_window_drop(len(tok), off)
            drops.append(d)
            toks.append(np.concatenate([ps, tok[d:]]).astype(np.int32))
            tls.append(len(toks[-1]))
        bucket = max(round_up(max(tls), m.token_hop_len), m.token_hop_len)
        tokm = np.zeros((Bp, bucket), np.int32)
        pfl = np.zeros(Bp, np.int32)
        # Pmax rounded up so request mixes with different prompt lengths
        # reuse one compiled shape (pad rows beyond pfl are masked exactly)
        Pmax = round_up(max(j[0].req.prompt_feat.shape[0] for j in jobs), 32)
        pf = np.zeros((Bp, Pmax, n_mel), np.float32)
        emb = np.stack([np.asarray(j[0].req.embedding, np.float32)
                        for j in jobs]
                       + [np.asarray(jobs[0][0].req.embedding, np.float32)]
                       * (Bp - B))
        for i, (st, tok, off, fin, hop) in enumerate(jobs):
            tokm[i, :tls[i]] = toks[i]
            pfl[i] = st.req.prompt_feat.shape[0]
            pf[i, :pfl[i]] = st.req.prompt_feat
        tokm[B:] = tokm[0]
        pfl[B:] = pfl[0]
        pf[B:] = pf[0]
        tls_pad = tls + [tls[0]] * (Bp - B)
        if m.flow_noise is None:
            noise = None
        elif not any(drops):
            noise = _noise_for(m, bucket)
        else:
            need = m.ratio * bucket
            rows = [m.windowed_noise(int(pfl[i]), drops[i], need)
                    for i in range(B)]
            noise = jnp.asarray(np.concatenate(rows + [rows[0]] * (Bp - B),
                                               axis=0))
        mel = self._flow_ragged(
            m.flow_params, jnp.asarray(tokm),
            jnp.asarray(tls_pad, dtype=jnp.int32),
            jnp.asarray(pf), jnp.asarray(emb), jnp.asarray(pfl),
            noise, streaming=streaming)
        if (all(not j[3] for j in jobs)
                and len({id(j[0].session) for j in jobs}) == len(jobs)):
            # steady-state streaming group: every chunk is a static
            # (hop+la)*ratio window of its row — gather + cache splice +
            # vocode run as ONE program per hop size (mel2wav_stream_group),
            # no per-row mel slicing here.  With progressive hops a flush
            # can mix hop sizes; each same-hop subset shares one program.
            la = m.pre_lookahead_len
            wavs: list = [None] * B
            by_hop: dict = {}
            for i, (_, _, off, _, hop) in enumerate(jobs):
                by_hop.setdefault(hop, []).append(i)
            for hop, idxs in by_hop.items():
                starts = [int(pfl[i]) + (jobs[i][2] - drops[i]) * ratio
                          for i in idxs]
                sub = m.mel2wav_stream_group(
                    mel, idxs, starts, [jobs[i][0].session for i in idxs],
                    win_rows=(hop + la) * ratio)
                for i, w in zip(idxs, sub):
                    wavs[i] = w
        elif (all(j[3] for j in jobs)
                and len({id(j[0].session) for j in jobs}) == len(jobs)
                and all(ratio * (tls[i] - len(jobs[i][0].req.prompt_speech_tokens))
                        - (jobs[i][2] - drops[i]) * ratio > 0
                        for i in range(B))):
            # final-chunk group: whole group in ONE jitted program per
            # {cached, fresh} subset (static window + per-row valid lengths)
            # — no per-session eager slicing/padding on the host
            starts, valids = [], []
            for i, (st, tok, off, fin, hop) in enumerate(jobs):
                plen = len(st.req.prompt_speech_tokens)
                starts.append(int(pfl[i]) + (off - drops[i]) * ratio)
                valids.append(ratio * (tls[i] - plen) - (off - drops[i]) * ratio)
            wavs = m.mel2wav_final_group(mel, list(range(B)), starts, valids,
                                         [j[0].session for j in jobs])
        else:
            gens, sessions, finals = [], [], []
            for i, (st, tok, off, fin, hop) in enumerate(jobs):
                plen = len(st.req.prompt_speech_tokens)
                start = int(pfl[i])
                valid = ratio * (tls[i] - plen)
                gens.append(mel[i, start + (off - drops[i]) * ratio:
                                start + valid])
                sessions.append(st.session)
                finals.append(fin)
            # grouped vocode: one dispatch + one wav fetch per shape group
            # instead of a device round trip per session (mel stays on device)
            wavs = m.mel2wav_group(gens, sessions, finals)
        for (st, tok, off, fin, hop), wav in zip(jobs, wavs):
            emit(st, wav, fin)

    def _flush_group_inc(self, jobs, emit) -> list:
        """Incremental flush: one FlowSlotEngine.chunk call per (first,
        final, bucket, hop) group — each stream's NEW tokens only, against
        its cached state.  Jobs of one stream sequence through waves (a
        later chunk needs the earlier chunk's state).

        Flow slots are claimed LAZILY at a stream's first flow chunk and
        released at its final one; final groups run before first groups in
        each wave so releases satisfy the wave's admissions.  The LM engine
        recycles ITS slot at token-done, before the last flow chunk flushes,
        so live flow streams can transiently exceed num_slots — jobs that
        cannot claim a slot are RETURNED (deferred to the next segment
        flush; the pending finals guarantee progress)."""
        from collections import defaultdict

        m = self.model
        fse = self._fse
        ratio = m.ratio
        la = m.pre_lookahead_len
        hop_base = m.token_hop_len
        n_mel = m.flow.cfg.output_size

        waves: list = []
        seen: dict = {}
        for j in jobs:
            k = seen.get(id(j[0]), 0)
            seen[id(j[0])] = k + 1
            while len(waves) <= k:
                waves.append([])
            waves[k].append(j)

        deferred: list = []
        deferred_streams: set = set()
        for wave in waves:
            groups = defaultdict(list)
            for j in wave:
                st, tok, off, fin, hop = j
                if id(st) in deferred_streams:
                    deferred.append(j)      # keep per-stream job order
                    continue
                first = off == 0
                P = len(st.req.prompt_speech_tokens) if first else 0
                n = (len(tok) - off) if fin else hop
                M = max(round_up(P + n, hop_base), hop_base)
                groups[(first, fin, M, 0 if fin else hop)].append(j)
            # finals first: their slot releases satisfy this wave's admits
            for key in sorted(groups, key=lambda k: (not k[1], k[2], k[3])):
                first, fin, M, hop = key
                grp = groups[key]
                if first:
                    admitted = []
                    for j in grp:
                        st = j[0]
                        if fse.free:
                            st.fslot = fse.admit(
                                len(st.req.prompt_speech_tokens),
                                np.asarray(st.req.embedding, np.float32))
                            admitted.append(j)
                        else:
                            deferred.append(j)
                            deferred_streams.add(id(st))
                    grp = admitted
                    if not grp:
                        continue
                K = len(grp)
                toks = np.zeros((K, M), np.int32)
                ctx = np.zeros((K, la), np.int32)
                cl = np.zeros(K, np.int32)
                nv = np.zeros(K, np.int32)
                slots, starts, valids = [], [], []
                pfl = np.zeros(K, np.int32)
                Pf = (round_up(max(j[0].req.prompt_feat.shape[0]
                                   for j in grp), 32) if first else 1)
                pf = np.zeros((K, Pf, n_mel), np.float32)
                for i, (st, tok, off, fin_, hop_) in enumerate(grp):
                    ps = (np.asarray(st.req.prompt_speech_tokens, np.int32)
                          if first else np.zeros(0, np.int32))
                    if fin:
                        g = np.asarray(tok[off:], np.int32)
                    else:
                        g = np.asarray(tok[off:off + hop_], np.int32)
                        c = np.asarray(tok[off + hop_: off + hop_ + la],
                                       np.int32)
                        ctx[i, :len(c)] = c
                        cl[i] = len(c)
                    row = np.concatenate([ps, g])
                    toks[i, :len(row)] = row
                    nv[i] = len(row)
                    slots.append(st.fslot)
                    starts.append(ratio * len(ps))
                    valids.append(ratio * len(g))
                    if first:
                        n_pf = st.req.prompt_feat.shape[0]
                        pf[i, :n_pf] = st.req.prompt_feat
                        pfl[i] = n_pf
                # non-final non-first groups are shape-exact (n_valid is N
                # or 0): static-slice cache rolls instead of per-row gathers
                mel = fse.chunk(slots, toks, ctx, cl, nv, first,
                                pf if first else None,
                                pfl if first else None,
                                ragged=first or fin)
                sessions = [j[0].session for j in grp]
                if not fin:
                    wavs = m.mel2wav_stream_group(mel, slots, starts,
                                                  sessions,
                                                  win_rows=ratio * hop)
                else:
                    wavs = m.mel2wav_final_group(mel, slots, starts, valids,
                                                 sessions)
                for (st, tok, off, fin_, hop_), w in zip(grp, wavs):
                    emit(st, w, fin_)
                    if fin_:
                        fse.release(st.fslot)
        return deferred

    def serve(self, submissions, rng=None) -> None:
        """Online streaming TTS: pull (TTSRequest, on_chunk(wav, final))
        pairs from a thread-safe queue.Queue while synthesis runs; a None
        item drains live work and returns.  Wav chunks stream through each
        request's own on_chunk as they materialize."""
        from cosyvoice_tpu.runtime.engine import GenRequest, ServingEngine

        m = self.model
        hop, la = m.token_hop_len, m.pre_lookahead_len
        max_hop = self.max_hop if self.max_hop is not None else 4 * hop
        if self.hop_scale > 1.0 and m.flow_context_tokens is not None:
            assert m.flow_context_tokens >= max_hop + la, (
                f"flow_context_tokens ({m.flow_context_tokens}) must cover "
                f"the largest chunk + lookahead ({max_hop}+{la}) so the "
                f"final chunk's emission region stays inside the window")

        def next_hop(h: int) -> int:
            if self.hop_scale <= 1.0:
                return h
            return min(max_hop, round_up(int(h * self.hop_scale), hop))

        engine = ServingEngine(m.llm, m.llm_params, num_slots=self.num_slots,
                               cache_len=self.cache_len,
                               max_out=self.max_out or m.max_decode_tokens,
                               segment_steps=hop,
                               # fresh slots reach their first hop+la chunk
                               # boundary in ONE segment (admit token + hop +
                               # la-1 steps), halving first-chunk latency
                               first_segment_extra=max(0, la - 1),
                               text_bucket=self.text_bucket,
                               speech_bucket=self.speech_bucket)
        jobs: list[tuple] = []

        class _Stream:
            __slots__ = ("req", "on_chunk", "tokens", "offset", "session",
                         "hop", "fslot")

            def __init__(self, req, on_chunk):
                self.req, self.on_chunk = req, on_chunk
                self.tokens: list[int] = []
                self.offset = 0
                self.session: dict = {"hift": None}
                self.hop = hop
                self.fslot = None   # claimed lazily at the first flow flush

            def __repr__(self):
                return f"_Stream(offset={self.offset}, hop={self.hop})"

        def make_on_tokens(st: "_Stream"):
            def on_tokens(new, fin):
                st.tokens.extend(new.tolist())
                tok = np.asarray(st.tokens, np.int32)
                while len(tok) - st.offset >= st.hop + la:
                    jobs.append((st, tok[: st.offset + st.hop + la],
                                 st.offset, False, st.hop))
                    st.offset += st.hop
                    st.hop = next_hop(st.hop)
                if fin:
                    jobs.append((st, tok, st.offset, True, 0))
            return on_tokens

        def emit(st: "_Stream", wav, fin):
            if st.on_chunk is not None:
                st.on_chunk(wav, fin)

        def flush():
            if self._fse is not None:
                deferred = self._flush_group_inc(jobs, emit)
                jobs[:] = deferred
                return
            if not self.batch_chunks:
                for st, tok, off, fin, _hop in jobs:
                    r = st.req
                    emit(st, m.token2wav(tok, r.prompt_speech_tokens,
                                         r.prompt_feat, r.embedding, off,
                                         st.session, finalize=fin), fin)
            else:
                # non-final first: a request can have both in one segment,
                # and its stream chunks precede its final chunk
                for streaming in (True, False):
                    grp = [j for j in jobs if j[3] != streaming]
                    if grp:
                        self._flush_group(grp, emit, streaming=streaming)
            jobs.clear()

        def on_segment():
            if not jobs:
                return
            if self.flow_device is not None:
                # chunk jits (and their operands) go to the flow chip; the
                # engine has already dispatched the next decode segment on
                # the LM chip, so the two stages execute concurrently
                with jax.default_device(self.flow_device):
                    flush()
            else:
                flush()

        class _Adapter:
            """Translate TTS submissions into engine (GenRequest, on_tokens)
            pairs, preserving queue.Queue get(block) semantics."""

            @staticmethod
            def get(block=True):
                item = submissions.get(block=block)
                if item is None:
                    return None
                req, on_chunk = item
                st = _Stream(req, on_chunk)
                gr = GenRequest(
                    text=np.asarray(req.text_tokens, np.int32),
                    prompt_speech=np.asarray(req.prompt_speech_tokens, np.int32),
                    new_text_len=(len(req.pho_token) if req.pho_token is not None
                                  else len(req.text_tokens) - req.prompt_text_len),
                    pho_token=(np.asarray(req.pho_token, np.int32)
                               if req.pho_token is not None else None),
                    embedding=(np.asarray(req.embedding, np.float32)
                               if req.pho_token is not None else None))
                return (gr, make_on_tokens(st))

        engine.serve(_Adapter(), rng=rng, on_segment=on_segment)
        # incremental mode can defer jobs past slot contention; drain them
        # (each pass flushes finals -> releases slots -> admits the rest)
        while jobs:
            n_before = len(jobs)
            flush()
            assert len(jobs) < n_before, "incremental flush stalled"

    def synthesize_batch(self, requests: Sequence[TTSRequest], rng=None,
                         on_chunk=None) -> list[np.ndarray]:
        """Batch driver over serve(); on_chunk(request_index, wav, final)."""
        import queue as _q

        subs: _q.Queue = _q.Queue()
        chunks: list[list[np.ndarray]] = [[] for _ in requests]

        def cb_for(i):
            def cb(wav, fin):
                chunks[i].append(wav)
                if on_chunk is not None:
                    on_chunk(i, wav, fin)
            return cb

        for i, r in enumerate(requests):
            subs.put((r, cb_for(i)))
        subs.put(None)
        self.serve(subs, rng=rng)
        return [np.concatenate(c) for c in chunks]
