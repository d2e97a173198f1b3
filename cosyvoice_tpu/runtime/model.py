"""Streaming inference engine: LLM -> flow -> vocoder chunk pipeline.

Behavioral spec: reference `cosyvoice/cli/model.py:295-424` (CosyVoice2Model):
  * token_hop_len = 2 * input_frame_rate (50 tokens ~ 2 s); first synthesis
    waits for token_hop + pre_lookahead (3) tokens
  * token2wav (:334-366): flow.inference on prompt ++ all-tokens-so-far with
    chunk-masked attention, mel sliced at token_offset * ratio; mel cache 8
    frames prepended; HiFT cache_source spliced; emitted speech cross-faded
    with the cached tail over a 2*3840-sample Hamming window; the last
    source_cache_len samples are held back until the next chunk
  * non-stream path: one token2wav over all tokens, finalize=True

TPU-first replacements for the reference's thread+poll machinery
(cli/model.py:177-238): JAX dispatch is already asynchronous, so the host
drives jitted chunk programs — llm decode chunks, flow chunks, vocoder
chunks — that queue back-to-back on the device stream with no Python thread
pair and no 0.1 s polling.  All chunk programs run at BUCKETED static shapes
(token length rounded up to token_hop) so each bucket compiles once.
"""
from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec
from cosyvoice_tpu.models.hift import HiFTGenerator
from cosyvoice_tpu.models.llm import Qwen2LM, lm_generate


def _session_rng(base_rng, session: dict):
    """Per-session noise stream: fold a session-local counter into the seeded
    base key.  Session-scoped (not model-global) so a request's waveform is
    reproducible regardless of what else the model synthesized before or
    interleaved with it (continuous batching interleaves sessions)."""
    session["noise_ctr"] = session.get("noise_ctr", 0) + 1
    return jax.random.fold_in(base_rng, session["noise_ctr"])


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _derive_decode_buckets(cap: int) -> tuple:
    """Static decode-length buckets (200, 400, ..., cap): one compile per
    bucket instead of per request length."""
    b, bs = 200, []
    while b < cap:
        bs.append(b)
        b *= 2
    return tuple(bs) + (cap,)


def _pick_bucket(buckets: tuple, cap: int, allowed: int) -> int:
    """Smallest static bucket covering the reference's 20x-text bound
    (llm/llm.py:856 for v2, llm.py:217-237 for v1), clamped at the hard
    max_decode_tokens ceiling."""
    for b in buckets:
        if allowed <= b:
            return b
    return cap


def _warn_truncated(count: int, allowed: int, cap: int,
                    frame_rate: int) -> None:
    if count >= cap and allowed > cap:
        import logging
        logging.warning(
            "LM decode TRUNCATED at the static cap: emitted %d tokens "
            "(~%.1f s audio) but the reference's 20x-text bound allows "
            "%d; raise max_decode_tokens (from_pretrained / serve "
            "--max-decode-tokens) for longer segments", count,
            count / frame_rate, allowed)


@dataclass
class CosyVoice2Model:
    """Host-side orchestrator over jitted stage programs."""

    llm: Qwen2LM
    flow: CausalMaskedDiffWithXvec
    hift: HiFTGenerator
    llm_params: dict
    flow_params: dict
    hift_params: dict
    sample_rate: int = 24000
    # HARD cap on generated speech tokens per segment (the decode buffer /
    # KV-cache size ceiling).  The reference has no cap — its decode runs to
    # max_len = 20x new-text tokens (llm/llm.py:856); here each request picks
    # the smallest bucket from `decode_buckets` that covers its own 20x bound
    # (one compile per bucket, not per length), and a decode that actually
    # hits this ceiling logs a LOUD truncation warning instead of silently
    # clipping the audio.  Configure per deployment via from_pretrained /
    # the serve CLI.
    max_decode_tokens: int = 800
    # static decode-length buckets; None derives (200, 400, ..., cap)
    decode_buckets: Optional[tuple] = None
    # pinned CFM noise [1, N, 80] (models.flow.reference_rand_noise) — set to
    # reproduce the reference's seed-0 buffer slice-for-slice so synthesized
    # wav is allclose to the reference (flow_matching.py:212-213,235).  None
    # falls back to the framework-seeded buffer (same distribution).
    flow_noise: Optional[np.ndarray] = None
    # streaming flow context window, in GENERATED tokens.  None = exact
    # reference semantics: every streaming chunk re-runs the flow over the
    # FULL token prefix (reference cli/model.py token2wav passes the whole
    # accumulated stream), so a stream's total flow work grows QUADRATICALLY
    # with its length.  With W set, each streaming chunk keeps the prompt
    # (speaker identity/prosody anchor) plus the last <= W+hop generated
    # tokens — per-chunk flow cost is bounded and long-stream throughput is
    # O(T).  Drop counts are quantized to hop multiples (stable compile
    # shapes), the pinned noise buffer is re-indexed so every kept row keeps
    # the noise it would get in the exact path's call layout, and the engine
    # and sequential paths window identically, so their parity is preserved.
    # Approximation vs the reference: context older than ~W tokens no longer
    # conditions the current chunk (the prompt always does).  W >= hop+la.
    flow_context_tokens: Optional[int] = None

    def __post_init__(self):
        if self.decode_buckets is None:
            self.decode_buckets = _derive_decode_buckets(self.max_decode_tokens)
        fr = self.flow.cfg.input_frame_rate          # 25
        self.token_hop_len = 2 * fr                  # 50
        self.pre_lookahead_len = self.flow.cfg.pre_lookahead_len  # 3
        self.ratio = self.flow.cfg.token_mel_ratio   # 2
        if self.flow_context_tokens is not None:
            need = self.token_hop_len + self.pre_lookahead_len
            assert self.flow_context_tokens >= need, (
                f"flow_context_tokens must cover one chunk+lookahead "
                f"(>= {need}), got {self.flow_context_tokens}")
            if self.flow_noise is None:
                # windowed noise must be re-indexed per chunk, which needs an
                # explicit buffer; the framework-seeded one IS what the CFM
                # uses internally when noise=None, so behavior with d=0 drops
                # is unchanged
                from cosyvoice_tpu.models.flow import _fixed_noise
                self.flow_noise = _fixed_noise(self.flow.cfg.cfm.noise_frames,
                                               self.flow.cfg.output_size)
        self.mel_cache_len = 8
        self.hop_samples = self.hift.cfg.upsample_scale  # 480 @ 24 kHz v2
        self.source_cache_len = self.mel_cache_len * self.hop_samples
        self.speech_window = np.hamming(2 * self.source_cache_len)
        flow_model, hift_model = self.flow, self.hift

        @partial(jax.jit, static_argnames=("streaming",))
        def _flow_infer(params, token, token_len, prompt_feat, embedding,
                        noise=None, streaming=False):
            return flow_model.apply(params, token, token_len, prompt_feat,
                                    embedding, noise=noise,
                                    streaming=streaming,
                                    method=CausalMaskedDiffWithXvec.inference)

        @jax.jit
        def _hift_infer(params, mel, cache_source, rng):
            return hift_model.apply(params, mel, cache_source,
                                    rngs={"noise": rng},
                                    method=HiFTGenerator.inference)

        @jax.jit
        def _hift_infer_nocache(params, mel, rng):
            return hift_model.apply(params, mel,
                                    rngs={"noise": rng},
                                    method=HiFTGenerator.inference)

        # grouped vocode for the continuous engine: one call for a whole
        # flush group, but each row keeps ITS OWN noise key (vmap of the
        # B=1 apply) so outputs equal the per-session sequential path
        @jax.jit
        def _hift_infer_group(params, mel, cache_source, keys):
            def one(m, cs, k):
                return hift_model.apply(params, m[None], cs[None, :, None],
                                        rngs={"noise": k},
                                        method=HiFTGenerator.inference)

            wav, src = jax.vmap(one)(mel, cache_source, keys)
            return wav[:, 0], src[:, 0]

        @jax.jit
        def _hift_infer_group_nocache(params, mel, keys):
            def one(m, k):
                return hift_model.apply(params, m[None], rngs={"noise": k},
                                        method=HiFTGenerator.inference)

            wav, src = jax.vmap(one)(mel, keys)
            return wav[:, 0], src[:, 0]

        # steady-state streaming vocode, whole group in ONE program: the
        # per-session host prep (slice gen mel / concat mel cache / pad /
        # stack / fold_in — ~4 small dispatches per session per chunk, real
        # milliseconds through a remote tunnel) moves inside the jit.  Every
        # non-final chunk has the same static window (hop+la)*ratio rows, so
        # one compile covers the steady state; outputs equal mel2wav_group.
        hop_samples = self.hop_samples
        mel_cache_len = self.mel_cache_len
        src_cache = self.source_cache_len

        @partial(jax.jit, static_argnames=("win_rows", "cached"))
        def _hift_stream_group(params, mel, rows, starts, cache_mel,
                               cache_src, base_rng, ctrs, win_rows: int,
                               cached: bool):
            win = jax.vmap(lambda r, s: jax.lax.dynamic_slice(
                mel, (r, s, 0), (1, win_rows, mel.shape[-1]))[0]
            )(rows, starts)                                  # [K, win, 80]
            win = win.astype(jnp.float32)
            keys = jax.vmap(lambda c: jax.random.fold_in(base_rng, c))(ctrs)
            if cached:
                full = jnp.concatenate([cache_mel.astype(jnp.float32), win],
                                       axis=1)               # [K, 8+win, 80]
                n = (mel_cache_len + win_rows) * hop_samples

                def one(m, cs, k):
                    return hift_model.apply(params, m[None], cs[None, :, None],
                                            rngs={"noise": k},
                                            method=HiFTGenerator.inference)

                wav, src = jax.vmap(one)(full, cache_src, keys)
            else:
                full = jnp.pad(win, ((0, 0), (0, mel_cache_len), (0, 0)))
                n = win_rows * hop_samples

                def one(m, k):
                    return hift_model.apply(params, m[None],
                                            rngs={"noise": k},
                                            method=HiFTGenerator.inference)

                wav, src = jax.vmap(one)(full, keys)
            wav, src = wav[:, 0], src[:, 0]
            return (wav[:, :n], win[:, -mel_cache_len:],
                    src[:, n - src_cache: n, 0])

        # final-chunk twin of _hift_stream_group: window width is static
        # (max valid length rounded to 128) with per-row valid lengths
        # masked to zero — the host-side per-row slice/pad of the old final
        # path dispatched ~5 eager ops per session per flush AND compiled a
        # fresh tiny program for every new mel length (lengths drift with
        # the sampled token counts, so that churn hit TIMED serving runs).
        # Rows beyond `valid` are zeros exactly like the old pad, and HiFT
        # has no whole-time reductions, so wav[: (cache+valid)*hop] matches
        # the sequential path to fp tolerance.
        @partial(jax.jit, static_argnames=("win_rows", "cached"))
        def _hift_final_group(params, mel, rows, starts, valids, cache_mel,
                              cache_src, base_rng, ctrs, win_rows: int,
                              cached: bool):
            melp = jnp.pad(mel.astype(jnp.float32),
                           ((0, 0), (0, win_rows), (0, 0)))
            win = jax.vmap(lambda r, s: jax.lax.dynamic_slice(
                melp, (r, s, 0), (1, win_rows, melp.shape[-1]))[0]
            )(rows, starts)                              # [K, win, 80]
            win = win * (jnp.arange(win_rows)[None, :]
                         < valids[:, None])[..., None].astype(win.dtype)
            keys = jax.vmap(lambda c: jax.random.fold_in(base_rng, c))(ctrs)
            if cached:
                full = jnp.concatenate([cache_mel.astype(jnp.float32), win],
                                       axis=1)

                def one(m, cs, k):
                    return hift_model.apply(params, m[None], cs[None, :, None],
                                            rngs={"noise": k},
                                            method=HiFTGenerator.inference)

                wav, _ = jax.vmap(one)(full, cache_src, keys)
            else:
                def one(m, k):
                    return hift_model.apply(params, m[None],
                                            rngs={"noise": k},
                                            method=HiFTGenerator.inference)

                wav, _ = jax.vmap(one)(win, keys)
            return wav[:, 0]

        self._flow_infer = _flow_infer
        self._hift_infer = _hift_infer
        self._hift_infer_nocache = _hift_infer_nocache
        self._hift_infer_group = _hift_infer_group
        self._hift_infer_group_nocache = _hift_infer_group_nocache
        self._hift_stream_group = _hift_stream_group
        self._hift_final_group = _hift_final_group
        self._noise_rng = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    # stages
    # ------------------------------------------------------------------

    def decode_cap(self, new_text_len: int) -> int:
        """Smallest static decode bucket covering 20x new-text tokens (the
        reference's max_len bound, llm/llm.py:856), clamped by the hard
        max_decode_tokens ceiling.  One compile per bucket."""
        allowed = int(new_text_len * self.llm.cfg.max_token_text_ratio)
        return _pick_bucket(self.decode_buckets, self.max_decode_tokens,
                            allowed)

    def _warn_if_capped(self, count: int, allowed: int, cap: int) -> None:
        _warn_truncated(count, allowed, cap, self.flow.cfg.input_frame_rate)

    def llm_generate(self, text_tokens: np.ndarray, prompt_text_len: int,
                     prompt_speech_tokens: np.ndarray, rng) -> np.ndarray:
        """Run the full AR decode (one jit); returns emitted token ids."""
        text = jnp.asarray(text_tokens)[None]
        tlen = jnp.asarray([text.shape[1]])
        psp = jnp.asarray(prompt_speech_tokens)[None].astype(jnp.int32)
        plen = jnp.asarray([psp.shape[1]])
        new_text = text.shape[1] - prompt_text_len
        allowed = int(new_text * self.llm.cfg.max_token_text_ratio)
        cap = self.decode_cap(new_text)
        min_len = jnp.asarray([int(new_text * self.llm.cfg.min_token_text_ratio)])
        max_len = jnp.asarray([min(allowed, cap)])
        cache_len = round_up(2 + text.shape[1] + psp.shape[1] + cap, 128)
        out, count = lm_generate(self.llm, self.llm_params, text, tlen, psp, plen,
                                 min_len, max_len, rng, max_steps=cap,
                                 cache_len=cache_len)
        self._warn_if_capped(int(count[0]), allowed, cap)
        return np.asarray(out[0][: int(count[0])])

    def flow_window_drop(self, n_gen: int, token_offset: int) -> int:
        """Generated tokens to DROP from the front of a streaming chunk's
        flow context (0 without flow_context_tokens or for one-shot calls,
        which have token_offset 0).  CEIL-quantized to hop multiples: the
        kept window is always in (W - hop, W], so a final chunk's call
        shape does not depend on the exact sampled token count (emitted
        counts drift under RAS; with floor quantization count 500 vs 495
        landed in different buckets and recompiled mid-serving).  Clamped
        to a hop multiple <= token_offset so the emission region always
        stays inside the window."""
        W = self.flow_context_tokens
        if W is None or token_offset == 0 or n_gen <= W:
            return 0
        hop = self.token_hop_len
        drop = -((-(n_gen - W)) // hop) * hop          # ceil to hop multiple
        return min(drop, (token_offset // hop) * hop)

    def windowed_noise(self, pfl: int, drop: int, need: int) -> np.ndarray:
        """Noise rows for a windowed flow call: the prompt region keeps rows
        [0, pfl) and the generated window keeps the rows the EXACT path's
        call layout would give those tokens — i.e. generated row i of the
        window reads buffer row pfl + drop*ratio + i.  With drop=0 this is
        the plain [:need] slice, so exact and windowed paths agree whenever
        nothing is dropped."""
        buf = self.flow_noise
        d = drop * self.ratio
        assert buf.shape[1] >= d + need, (
            f"flow_noise buffer ({buf.shape[1]} frames) too short for "
            f"window offset {d} + {need} mel frames")
        if d == 0:
            return buf[:, :need]
        return np.concatenate([buf[:, :pfl], buf[:, pfl + d: d + need]],
                              axis=1)

    def _flow_chunk(self, all_tokens, prompt_tokens, prompt_feat, embedding,
                    token_offset: int, streaming: bool, n_tokens=None):
        """flow over prompt ++ tokens (bucketed pad), mel sliced at offset.

        Tokens/feat/embedding may be numpy OR device arrays; through the
        remote-TPU tunnel every blocking device->host read costs a ~27 ms
        round trip, so the chunk path keeps everything on device and returns
        a DEVICE mel — streaming fetches only (count, done) and the final
        wav per chunk."""
        n_gen = n_tokens if n_tokens is not None else len(all_tokens)
        drop = self.flow_window_drop(n_gen, token_offset)
        tok = jnp.concatenate([jnp.asarray(prompt_tokens, jnp.int32),
                               jnp.asarray(all_tokens, jnp.int32)[drop:n_gen]])
        n = len(prompt_tokens) + n_gen - drop
        bucket = max(round_up(n, self.token_hop_len), self.token_hop_len)
        tok_pad = jnp.pad(tok, (0, bucket - n))
        noise = None
        if self.flow_noise is not None:
            need = self.ratio * bucket
            pfl = np.asarray(prompt_feat).shape[0]
            noise = jnp.asarray(self.windowed_noise(pfl, drop, need))
        mel = self._flow_infer(self.flow_params, tok_pad[None],
                               jnp.asarray([n]), jnp.asarray(prompt_feat)[None],
                               jnp.asarray(embedding)[None], noise,
                               streaming=streaming)
        # valid generated mel: ratio * (n - len(prompt_tokens)); drop pad tail
        valid = self.ratio * (n - len(prompt_tokens))
        return mel[0, (token_offset - drop) * self.ratio: valid]

    def _vocode(self, mel, cache_source, rng, pad_to: Optional[int] = None):
        """HiFT over [frames, 80] mel (+ source splice); bucketed pad + slice.
        mel/cache_source may live on device; returns DEVICE (wav, source)."""
        n = mel.shape[0]
        bucket = pad_to or n
        mel_pad = jnp.pad(jnp.asarray(mel, jnp.float32),
                          ((0, bucket - n), (0, 0)))
        if cache_source is not None and cache_source.shape[0] > 0:
            wav, source = self._hift_infer(self.hift_params, mel_pad[None],
                                           jnp.asarray(cache_source)[None, :, None],
                                           rng)
        else:
            wav, source = self._hift_infer_nocache(self.hift_params,
                                                   mel_pad[None], rng)
        return wav[0, : n * self.hop_samples], source[0, : n * self.hop_samples, 0]

    # ------------------------------------------------------------------
    # sessions
    # ------------------------------------------------------------------

    def token2wav(self, tokens, prompt_tokens, prompt_feat, embedding,
                  token_offset: int, session: dict, finalize: bool,
                  speed: float = 1.0, n_tokens=None) -> np.ndarray:
        mel = self._flow_chunk(tokens, prompt_tokens, prompt_feat, embedding,
                               token_offset, streaming=not finalize,
                               n_tokens=n_tokens)
        return self.mel2wav(mel, session, finalize, speed)

    def mel2wav(self, mel, session: dict, finalize: bool,
                speed: float = 1.0) -> np.ndarray:
        """Vocode one chunk's generated mel with the session's fade caches
        (the second half of token2wav; split out so batched-serving paths can
        run the flow stage batched and cache-splice per session here).

        The mel/source caches stay on DEVICE across chunks; only the emitted
        wav is fetched (one tunnel round trip per chunk)."""
        cache = session.get("hift")
        if cache is not None:
            mel = jnp.concatenate([jnp.asarray(cache["mel"]),
                                   jnp.asarray(mel)], axis=0)
            cache_source = cache["source"]
        else:
            cache_source = None
        rng = _session_rng(self._noise_rng, session)
        if not finalize:
            # max() admits progressive-hop chunks (> one base hop) while
            # keeping the steady-state shape static per hop size
            pad_to = max(self.mel_cache_len + (self.token_hop_len
                                               + self.pre_lookahead_len)
                         * self.ratio, mel.shape[0])
            wav, source = self._vocode(mel, cache_source, rng, pad_to=pad_to)
            wav = np.asarray(wav)
            if cache is not None:
                wav = self._fade(wav, cache["speech"])
            session["hift"] = {"mel": mel[-self.mel_cache_len:],
                               "source": source[-self.source_cache_len:],
                               "speech": wav[-self.source_cache_len:]}
            return wav[: -self.source_cache_len]
        if speed != 1.0:
            assert cache is None, "speed change only supports non-stream mode"
            mel = _interp_linear(np.asarray(mel), int(mel.shape[0] / speed))
        wav, _ = self._vocode(mel, cache_source, rng, pad_to=round_up(mel.shape[0], 32))
        wav = np.asarray(wav)
        if cache is not None:
            wav = self._fade(wav, cache["speech"])
        return wav

    def mel2wav_group(self, gens: list, sessions: list,
                      finals: list) -> list:
        """mel2wav for a whole flush group in (at most a few) batched HiFT
        calls — the engine's per-session vocode round trips collapse into
        one dispatch + one wav fetch per shape group, while each session
        keeps its own noise stream (vmap over per-row keys) and fade caches,
        so outputs EQUAL the sequential mel2wav path."""
        from collections import defaultdict

        results: list = [None] * len(gens)
        prep = []
        for i, (mel, session, fin) in enumerate(zip(gens, sessions, finals)):
            cache = session.get("hift")
            if cache is not None:
                mel = jnp.concatenate([jnp.asarray(cache["mel"]),
                                       jnp.asarray(mel)], axis=0)
            key = _session_rng(self._noise_rng, session)
            if fin:
                pad_to = round_up(mel.shape[0], 32)
            else:
                pad_to = max(self.mel_cache_len + (self.token_hop_len
                                                   + self.pre_lookahead_len)
                             * self.ratio, mel.shape[0])
            prep.append((i, mel, cache, key, fin, pad_to))

        groups = defaultdict(list)
        for item in prep:
            i, mel, cache, key, fin, pad_to = item
            groups[(pad_to, cache is not None)].append(item)

        for (pad_to, has_cache), items in groups.items():
            # pad the group to a power of two (copies of row 0, sliced off):
            # group sizes depend on host timing, and every unseen size would
            # compile a fresh program mid-serving (run-to-run stalls)
            K = len(items)
            Kp = 1 << (K - 1).bit_length()
            rows = [jnp.pad(jnp.asarray(m, jnp.float32),
                            ((0, pad_to - m.shape[0]), (0, 0)))
                    for _, m, *_ in items]
            mels = jnp.stack(rows + [rows[0]] * (Kp - K))
            ks = [k for *_, k, _, _ in items]
            keys = jnp.stack(ks + [ks[0]] * (Kp - K))
            if has_cache:
                cr = [jnp.asarray(c["source"]) for _, _, c, *_ in items]
                cs = jnp.stack(cr + [cr[0]] * (Kp - K))
                wavs, srcs = self._hift_infer_group(self.hift_params, mels,
                                                    cs, keys)
            else:
                wavs, srcs = self._hift_infer_group_nocache(self.hift_params,
                                                            mels, keys)
            wavs_h = np.asarray(wavs)          # ONE device->host fetch
            for row, (i, mel, cache, key, fin, _) in enumerate(items):
                n = mel.shape[0]
                wav = wavs_h[row, : n * self.hop_samples]
                if cache is not None:
                    wav = self._fade(wav, cache["speech"])
                if not fin:
                    src = srcs[row, : n * self.hop_samples, 0]
                    sessions[i]["hift"] = {
                        "mel": mel[-self.mel_cache_len:],
                        "source": src[-self.source_cache_len:],
                        "speech": wav[-self.source_cache_len:]}
                    wav = wav[: -self.source_cache_len]
                results[i] = wav
        return results

    def mel2wav_stream_group(self, mel, rows, starts, sessions: list,
                             win_rows: Optional[int] = None) -> list:
        """Steady-state streaming vocode: every job is a NON-FINAL chunk with
        the same static `win_rows` mel window (default one base hop +
        lookahead; progressive-hop callers pass their chunk's size), taken
        straight out of the batched flow output `mel` [B, T, 80] at
        (rows[i], starts[i]).  The whole group — window gather, mel-cache
        concat, per-session noise keys, HiFT, cache tails — runs as ONE
        jitted program per {cached, fresh} subset (vs ~4 host dispatches per
        session in mel2wav_group), then one wav fetch.  Outputs EQUAL
        mel2wav_group on the same jobs."""
        if win_rows is None:
            win_rows = (self.token_hop_len + self.pre_lookahead_len) * self.ratio
        results: list = [None] * len(sessions)
        subsets: dict = {True: [], False: []}
        for i, session in enumerate(sessions):
            subsets[session.get("hift") is not None].append(i)
        for cached, idxs in subsets.items():
            if not idxs:
                continue
            ctrs = []
            for i in idxs:
                s = sessions[i]
                s["noise_ctr"] = s.get("noise_ctr", 0) + 1
                ctrs.append(s["noise_ctr"])
            # pad the group to a power of two (row-0 duplicates, sliced off)
            # so timing-dependent group sizes reuse one compiled program
            K = len(idxs)
            Kp = 1 << (K - 1).bit_length()
            pad = lambda lst: lst + [lst[0]] * (Kp - K)
            r = jnp.asarray(np.asarray(pad([rows[i] for i in idxs]), np.int32))
            st = jnp.asarray(np.asarray(pad([starts[i] for i in idxs]),
                                        np.int32))
            if cached:
                cmr = [jnp.asarray(sessions[i]["hift"]["mel"]) for i in idxs]
                csr = [jnp.asarray(sessions[i]["hift"]["source"])
                       for i in idxs]
                cm = jnp.stack(pad(cmr))
                cs = jnp.stack(pad(csr))
            else:
                cm = jnp.zeros((Kp, self.mel_cache_len,
                                self.flow.cfg.output_size), jnp.float32)
                cs = jnp.zeros((Kp, self.source_cache_len), jnp.float32)
            wav, mel_tail, src_tail = self._hift_stream_group(
                self.hift_params, mel, r, st, cm, cs, self._noise_rng,
                jnp.asarray(np.asarray(pad(ctrs), np.int32)), win_rows,
                cached)
            wav_h = np.asarray(wav)                     # ONE fetch per subset
            for row, i in enumerate(idxs):
                session = sessions[i]
                w = wav_h[row]
                if cached:
                    w = self._fade(w, session["hift"]["speech"])
                session["hift"] = {"mel": mel_tail[row],
                                   "source": src_tail[row],
                                   "speech": w[-self.source_cache_len:]}
                results[i] = w[: -self.source_cache_len]
        return results

    def mel2wav_final_group(self, mel, rows, starts, valids,
                            sessions: list) -> list:
        """Final-chunk vocode for a whole flush group, ONE jitted program
        per {cached, fresh} subset + one wav fetch — no per-session host
        slicing/padding (see _hift_final_group).  rows/starts/valids index
        the batched flow output `mel` [B, T, 80]; valids are the per-row
        generated-mel lengths.  Outputs EQUAL mel2wav_group on the same
        jobs to fp tolerance."""
        win_rows = round_up(max(valids), 128)
        results: list = [None] * len(sessions)
        subsets: dict = {True: [], False: []}
        for i, session in enumerate(sessions):
            subsets[session.get("hift") is not None].append(i)
        for cached, idxs in subsets.items():
            if not idxs:
                continue
            ctrs = []
            for i in idxs:
                s = sessions[i]
                s["noise_ctr"] = s.get("noise_ctr", 0) + 1
                ctrs.append(s["noise_ctr"])
            K = len(idxs)
            Kp = 1 << (K - 1).bit_length()
            pad = lambda lst: lst + [lst[0]] * (Kp - K)
            r = jnp.asarray(np.asarray(pad([rows[i] for i in idxs]), np.int32))
            st = jnp.asarray(np.asarray(pad([starts[i] for i in idxs]),
                                        np.int32))
            vl = jnp.asarray(np.asarray(pad([valids[i] for i in idxs]),
                                        np.int32))
            if cached:
                cmr = [jnp.asarray(sessions[i]["hift"]["mel"]) for i in idxs]
                csr = [jnp.asarray(sessions[i]["hift"]["source"])
                       for i in idxs]
                cm, cs = jnp.stack(pad(cmr)), jnp.stack(pad(csr))
            else:
                cm = jnp.zeros((Kp, self.mel_cache_len,
                                self.flow.cfg.output_size), jnp.float32)
                cs = jnp.zeros((Kp, self.source_cache_len), jnp.float32)
            wav = self._hift_final_group(
                self.hift_params, mel, r, st, vl, cm, cs, self._noise_rng,
                jnp.asarray(np.asarray(pad(ctrs), np.int32)), win_rows,
                cached)
            wav_h = np.asarray(wav)                     # ONE fetch per subset
            for row, i in enumerate(idxs):
                session = sessions[i]
                n = (self.mel_cache_len if cached else 0) + int(valids[i])
                w = wav_h[row, : n * self.hop_samples]
                if cached:
                    w = self._fade(w, session["hift"]["speech"])
                results[i] = w
        return results

    def _fade(self, wav: np.ndarray, prev_tail: np.ndarray) -> np.ndarray:
        """Hamming cross-fade over the held-back region (utils/common.py:150-158)."""
        n = self.source_cache_len
        w = self.speech_window
        wav = wav.copy()
        wav[:n] = wav[:n] * w[:n] + prev_tail[-n:] * w[n:]
        return wav

    def tts(self, text_tokens: np.ndarray, prompt_text_len: int,
            llm_prompt_speech_token: np.ndarray,
            flow_prompt_speech_token: np.ndarray,
            prompt_speech_feat: np.ndarray, flow_embedding: np.ndarray,
            stream: bool = False, speed: float = 1.0,
            rng: Optional[jax.Array] = None) -> Iterator[dict]:
        """Yield {'tts_speech': np.ndarray [S]} chunks (reference tts:368-424).

        Non-stream: one shot.  Stream: chunked with the reference's hop /
        lookahead / fade constants.  The LLM currently runs ahead of the flow
        chunks (single jit); chunk-interleaved decode lands with the
        incremental GenState API.
        """
        rng = rng if rng is not None else jax.random.PRNGKey(int(time.time_ns() % (1 << 31)))
        session: dict = {"hift": None}
        prompt_feat = np.asarray(prompt_speech_feat, np.float32)
        emb = np.asarray(flow_embedding, np.float32)
        fpt = np.asarray(flow_prompt_speech_token, np.int32)
        if not stream:
            tokens = self.llm_generate(text_tokens, prompt_text_len,
                                       llm_prompt_speech_token, rng)
            wav = self.token2wav(tokens, fpt, prompt_feat, emb, 0, session,
                                 finalize=True, speed=speed)
            yield {"tts_speech": wav}
            return
        # streaming: interleave chunked LLM decode with flow/vocoder chunks —
        # the reference's producer-thread/consumer-poll pair (cli/model.py:
        # 177-238) as host-driven jitted chunk programs
        from cosyvoice_tpu.models.llm import lm_decode_chunk, lm_prefill_stream

        text = jnp.asarray(text_tokens)[None]
        psp = jnp.asarray(llm_prompt_speech_token)[None].astype(jnp.int32)
        new_text = text.shape[1] - prompt_text_len
        allowed = int(new_text * self.llm.cfg.max_token_text_ratio)
        cap = self.decode_cap(new_text)
        cache_len = round_up(2 + text.shape[1] + psp.shape[1] + cap, 128)
        state = lm_prefill_stream(
            self.llm, self.llm_params, text, jnp.asarray([text.shape[1]]),
            psp, jnp.asarray([psp.shape[1]]),
            jnp.asarray([int(new_text * self.llm.cfg.min_token_text_ratio)]),
            jnp.asarray([min(allowed, cap)]),
            rng, max_steps=cap, cache_len=cache_len)
        prefix_len = 2 + text.shape[1] + psp.shape[1]
        token_offset = 0
        hop, la = self.token_hop_len, self.pre_lookahead_len
        while True:
            state = lm_decode_chunk(self.llm, self.llm_params, state,
                                    n_steps=hop, prefix_len=prefix_len,
                                    cache_len=cache_len, max_steps=cap)
            # one small fetch for the loop control; the token buffer itself
            # stays on device (sliced there by _flow_chunk)
            cd = np.asarray(jnp.stack([state.gen.count[0],
                                       state.gen.done[0].astype(jnp.int32)]))
            count, done = int(cd[0]), bool(cd[1])
            while count - token_offset >= hop + la:
                wav = self.token2wav(state.gen.out[0], fpt,
                                     prompt_feat, emb, token_offset, session,
                                     finalize=False,
                                     n_tokens=token_offset + hop + la)
                token_offset += hop
                yield {"tts_speech": wav}
            if done:
                break
        self._warn_if_capped(count, allowed, cap)
        wav = self.token2wav(state.gen.out[0], fpt, prompt_feat, emb,
                             token_offset, session, finalize=True,
                             n_tokens=count)
        yield {"tts_speech": wav}


def _interp_linear(mel: np.ndarray, new_len: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on [T, C]."""
    T = mel.shape[0]
    pos = (np.arange(new_len) + 0.5) * T / new_len - 0.5
    lo = np.clip(np.floor(pos).astype(int), 0, T - 1)
    hi = np.clip(lo + 1, 0, T - 1)
    w = np.clip(pos - lo, 0.0, 1.0)[:, None]
    return mel[lo] * (1 - w) + mel[hi] * w


@dataclass
class CosyVoiceV1Model:
    """v1 streaming engine (reference cli/model.py:30-292): consumed-token
    sliding window with growing hop, flow_cache (z/mu pinning), mel-overlap
    Hamming fade + HiFT mel/source/speech caches at 256-sample hop."""

    llm: object                 # models.llm.TransformerLM
    flow: object                # models.flow.MaskedDiffWithXvec
    hift: object                # models.hift.HiFTGenerator (22.05 kHz config)
    llm_params: dict
    flow_params: dict
    hift_params: dict
    sample_rate: int = 22050
    # HARD per-segment cap, same semantics as CosyVoice2Model: the reference
    # v1 decode runs to max_len = 20x new-text tokens unbounded
    # (llm/llm.py:217-237); each request picks the smallest static bucket
    # covering its own bound (one compile per bucket), and a decode that
    # hits the ceiling logs a LOUD truncation warning.
    max_decode_tokens: int = 800
    decode_buckets: Optional[tuple] = None

    def decode_cap(self, new_text_len: int) -> int:
        allowed = int(new_text_len * self.llm.cfg.max_token_text_ratio)
        return _pick_bucket(self.decode_buckets, self.max_decode_tokens,
                            allowed)

    def _warn_if_capped(self, count: int, allowed: int, cap: int) -> None:
        _warn_truncated(count, allowed, cap, self.fr)

    def __post_init__(self):
        if self.decode_buckets is None:
            self.decode_buckets = _derive_decode_buckets(self.max_decode_tokens)
        fr = self.flow.cfg.input_frame_rate
        self.fr = fr
        self.token_min_hop_len = 2 * fr
        self.token_max_hop_len = 4 * fr
        self.token_overlap_len = 20
        self.mel_overlap_len = int(self.token_overlap_len / fr * self.sample_rate / 256)
        self.mel_window = np.hamming(2 * self.mel_overlap_len)
        self.mel_cache_len = 20
        self.hop_samples = self.hift.cfg.upsample_scale  # 256 @ 22.05 kHz
        self.source_cache_len = self.mel_cache_len * self.hop_samples
        self.speech_window = np.hamming(2 * self.source_cache_len)
        self.stream_scale_factor = 1

        flow_model, hift_model = self.flow, self.hift
        from cosyvoice_tpu.models.flow import MaskedDiffWithXvec

        @partial(jax.jit, static_argnames=("prompt_token_len", "mel_len2", "has_cache"))
        def _flow_infer(params, token, token_len, prompt_feat, embedding, rng,
                        prompt_token_len, mel_len2, flow_cache, has_cache):
            return flow_model.apply(params, token, token_len, prompt_feat,
                                    embedding, rng,
                                    prompt_token_len=prompt_token_len,
                                    mel_len2=mel_len2,
                                    flow_cache=flow_cache if has_cache else None,
                                    sample_rate=self.sample_rate,
                                    method=MaskedDiffWithXvec.inference)

        @jax.jit
        def _hift_infer(params, mel, cache_source, rng):
            from cosyvoice_tpu.models.hift import HiFTGenerator

            return hift_model.apply(params, mel, cache_source,
                                    rngs={"noise": rng},
                                    method=HiFTGenerator.inference)

        @jax.jit
        def _hift_infer_nocache(params, mel, rng):
            from cosyvoice_tpu.models.hift import HiFTGenerator

            return hift_model.apply(params, mel, rngs={"noise": rng},
                                    method=HiFTGenerator.inference)

        self._flow_infer = _flow_infer
        self._hift_infer = _hift_infer
        self._hift_infer_nocache = _hift_infer_nocache
        self._noise_rng = jax.random.PRNGKey(0)

    def llm_generate(self, text_tokens, prompt_text_len, prompt_speech_tokens,
                     embedding, rng):
        from cosyvoice_tpu.models.llm import lm_generate_v1

        text = jnp.asarray(text_tokens)[None]
        psp = jnp.asarray(prompt_speech_tokens)[None].astype(jnp.int32)
        new_text = text.shape[1] - prompt_text_len
        allowed = int(new_text * self.llm.cfg.max_token_text_ratio)
        cap = self.decode_cap(new_text)
        min_len = jnp.asarray([int(new_text * self.llm.cfg.min_token_text_ratio)])
        max_len = jnp.asarray([min(allowed, cap)])
        has_spk = embedding is not None and np.asarray(embedding).size > 0
        emb = jnp.asarray(embedding)[None] if has_spk else jnp.zeros((1, self.llm.cfg.spk_embed_dim))
        cache_len = round_up(3 + text.shape[1] + psp.shape[1] + cap, 128)
        out, count = lm_generate_v1(self.llm, self.llm_params, text,
                                    jnp.asarray([text.shape[1]]), psp,
                                    jnp.asarray([psp.shape[1]]), emb,
                                    min_len, max_len, rng, max_steps=cap,
                                    cache_len=cache_len, has_spk=has_spk)
        self._warn_if_capped(int(count[0]), allowed, cap)
        return np.asarray(out[0][: int(count[0])])

    def token2wav(self, tokens, prompt_tokens, prompt_feat, embedding,
                  session, finalize, speed=1.0):
        tok = np.concatenate([prompt_tokens, tokens]).astype(np.int32)
        rng = _session_rng(self._noise_rng, session)
        mel_len2 = int(len(tokens) / self.fr * self.sample_rate / 256)
        fc = session.get("flow_cache")
        mel, new_fc = self._flow_infer(
            self.flow_params, jnp.asarray(tok)[None], jnp.asarray([len(tok)]),
            jnp.asarray(prompt_feat)[None], jnp.asarray(embedding)[None], rng,
            prompt_token_len=len(prompt_tokens), mel_len2=mel_len2,
            flow_cache=fc if fc is not None else (jnp.zeros((1, 0, 80)),) * 2,
            has_cache=fc is not None)
        session["flow_cache"] = tuple(np.asarray(c) for c in new_fc)
        mel = np.asarray(mel)[0]  # [T, 80]

        if session.get("mel_overlap") is not None:
            mel = self._fade_mel(mel, session["mel_overlap"])
        cache = session.get("hift")
        cache_source = None
        if cache is not None:
            mel = np.concatenate([cache["mel"], mel], axis=0)
            cache_source = cache["source"]
        hrng = _session_rng(self._noise_rng, session)
        if not finalize:
            session["mel_overlap"] = mel[-self.mel_overlap_len:]
            mel = mel[: -self.mel_overlap_len]
            wav, source = self._vocode(mel, cache_source, hrng)
            if cache is not None:
                wav = self._fade_speech(wav, cache["speech"])
            session["hift"] = {"mel": mel[-self.mel_cache_len:],
                               "source": source[-self.source_cache_len:],
                               "speech": wav[-self.source_cache_len:]}
            return wav[: -self.source_cache_len]
        if speed != 1.0:
            assert cache is None, "speed change only supports non-stream mode"
            mel = _interp_linear(mel, int(mel.shape[0] / speed))
        wav, _ = self._vocode(mel, cache_source, hrng)
        if cache is not None:
            wav = self._fade_speech(wav, cache["speech"])
        return wav

    def _vocode(self, mel, cache_source, rng):
        n = mel.shape[0]
        if cache_source is not None and cache_source.shape[0] > 0:
            wav, source = self._hift_infer(self.hift_params,
                                           jnp.asarray(mel)[None],
                                           jnp.asarray(cache_source)[None, :, None],
                                           rng)
        else:
            wav, source = self._hift_infer_nocache(self.hift_params,
                                                   jnp.asarray(mel)[None], rng)
        return (np.asarray(wav)[0, : n * self.hop_samples],
                np.asarray(source)[0, : n * self.hop_samples, 0])

    def _fade_mel(self, mel, prev_tail):
        n = prev_tail.shape[0]
        w = self.mel_window
        mel = mel.copy()
        mel[:n] = mel[:n] * w[:n, None] + prev_tail * w[n:, None]
        return mel

    def _fade_speech(self, wav, prev_tail):
        n = self.source_cache_len
        w = self.speech_window
        wav = wav.copy()
        wav[:n] = wav[:n] * w[:n] + prev_tail[-n:] * w[n:]
        return wav

    def tts(self, text_tokens, prompt_text_len, llm_prompt_speech_token,
            flow_prompt_speech_token, prompt_speech_feat, flow_embedding,
            llm_embedding=None, stream=False, speed=1.0, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(int(time.time_ns() % (1 << 31)))
        session = {"hift": None, "mel_overlap": None, "flow_cache": None}
        prompt_feat = np.asarray(prompt_speech_feat, np.float32)
        emb = np.asarray(flow_embedding, np.float32)
        fpt = np.asarray(flow_prompt_speech_token, np.int32)
        if not stream:
            tokens = self.llm_generate(text_tokens, prompt_text_len,
                                       llm_prompt_speech_token, llm_embedding,
                                       rng)
            yield {"tts_speech": self.token2wav(np.asarray(tokens), fpt,
                                                prompt_feat, emb, session,
                                                finalize=True, speed=speed)}
            return
        # streaming: interleave hop-sized LLM decode chunks with synthesis so
        # the first chunk is emitted after ~hop+overlap tokens instead of the
        # whole decode — the reference's producer-thread overlap
        # (cli/model.py:116-128,177-238) as host-driven jitted chunk programs
        from cosyvoice_tpu.models.llm import (lm_decode_chunk_v1,
                                              lm_prefill_stream_v1)

        text = jnp.asarray(text_tokens)[None]
        psp = jnp.asarray(llm_prompt_speech_token)[None].astype(jnp.int32)
        new_text = text.shape[1] - prompt_text_len
        allowed = int(new_text * self.llm.cfg.max_token_text_ratio)
        cap = self.decode_cap(new_text)
        # clamp to the static cap so the done flag fires even when the text
        # ratio allows more tokens than the decode buffer holds (the cap
        # that actually binds triggers the truncation warning below)
        max_len = jnp.asarray([min(allowed, cap)])
        has_spk = llm_embedding is not None and np.asarray(llm_embedding).size > 0
        lemb = (jnp.asarray(llm_embedding)[None] if has_spk
                else jnp.zeros((1, self.llm.cfg.spk_embed_dim)))
        cache_len = round_up(3 + text.shape[1] + psp.shape[1] + cap, 128)
        state = lm_prefill_stream_v1(
            self.llm, self.llm_params, text, jnp.asarray([text.shape[1]]),
            psp, jnp.asarray([psp.shape[1]]), lemb, max_len, rng,
            max_steps=cap, cache_len=cache_len, has_spk=has_spk)
        consumed = 0
        hop = self.token_min_hop_len
        while True:
            state = lm_decode_chunk_v1(self.llm, self.llm_params, state,
                                       max_len, n_steps=hop, max_steps=cap)
            count = int(state.gen.count[0])
            done = bool(state.gen.done[0])
            tokens = np.asarray(state.gen.out[0][:count])
            while count - consumed >= hop + self.token_overlap_len:
                chunk = tokens[consumed: consumed + hop + self.token_overlap_len]
                yield {"tts_speech": self.token2wav(chunk, fpt, prompt_feat,
                                                    emb, session, finalize=False)}
                consumed += hop
                hop = min(self.token_max_hop_len,
                          int(hop * self.stream_scale_factor))
            if done or int(state.gen.step) >= cap:
                break
        self._warn_if_capped(count, allowed, cap)
        yield {"tts_speech": self.token2wav(tokens[consumed:], fpt, prompt_feat,
                                            emb, session, finalize=True)}
