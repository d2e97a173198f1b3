"""Continuous-batching engine: greedy token parity vs lm_generate under
staggered admissions and slot reuse (the correctness contract that lets the
engine replace the reference's vLLM/sglang serving backends)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, SamplingConfig, lm_generate
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.runtime.engine import GenRequest, ServingEngine

TINY = Qwen2Config(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                   num_kv_heads=2, head_dim=8, intermediate_size=64,
                   rope_theta=10000.0)
S = 24  # speech vocab


def make_model(fused: bool):
    qwen = dataclasses.replace(TINY, fused_cache_update=fused)
    cfg = LMConfig(llm_input_size=TINY.hidden_size,
                   llm_output_size=TINY.hidden_size, speech_token_size=S,
                   qwen=qwen, sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 5)))
    params = model.init(jax.random.PRNGKey(0), t, jnp.asarray([5]),
                        t, jnp.asarray([5]))
    return model, params


def reference_tokens(model, params, r: GenRequest, max_steps, cache_len):
    """Isolated lm_generate (B=1) on the same request."""
    mn = int(model.cfg.min_token_text_ratio * len(r.text))
    mx = int(model.cfg.max_token_text_ratio * len(r.text))
    out, cnt = lm_generate(
        model, params, jnp.asarray(r.text[None]), jnp.asarray([len(r.text)]),
        jnp.asarray(r.prompt_speech[None]), jnp.asarray([len(r.prompt_speech)]),
        jnp.asarray([mn]), jnp.asarray([min(mx, max_steps)]),
        jax.random.PRNGKey(0), max_steps=max_steps, cache_len=cache_len)
    return np.asarray(out[0, :int(cnt[0])])


@pytest.mark.parametrize("fused", [False, True])
def test_engine_greedy_parity_mixed_lengths(fused):
    """4 requests of different lengths through 2 slots (forces staggered
    admission + slot reuse) produce token-for-token the lm_generate outputs."""
    model, params = make_model(fused)
    rng = np.random.default_rng(7)
    reqs = [GenRequest(text=rng.integers(0, TINY.vocab_size, n).astype(np.int32),
                       prompt_speech=rng.integers(0, S, p).astype(np.int32))
            for n, p in [(3, 4), (6, 2), (2, 7), (5, 0)]]
    eng = ServingEngine(model, params, num_slots=2, cache_len=256, max_out=128,
                        segment_steps=5, text_bucket=4, speech_bucket=4)
    stream: dict[int, list] = {i: [] for i in range(len(reqs))}
    fins: dict[int, int] = {}

    def on_tokens(idx, toks, fin):
        stream[idx].extend(toks.tolist())
        if fin:
            fins[idx] = fins.get(idx, 0) + 1

    got = eng.generate(reqs, rng=jax.random.PRNGKey(3), on_tokens=on_tokens)
    assert sorted(fins) == list(range(len(reqs))) and all(v == 1 for v in fins.values())
    for i, r in enumerate(reqs):
        want = reference_tokens(model, params, r, max_steps=128, cache_len=256)
        np.testing.assert_array_equal(got[i], want, err_msg=f"request {i}")
        np.testing.assert_array_equal(np.asarray(stream[i]), want)
        assert got[i].size and (got[i] < S).all()


@pytest.mark.parametrize("n", [5, 8])  # 5 exercises pad-to-8 duplication
def test_engine_burst_batched_admit_parity(n, monkeypatch):
    """A same-bucket burst admits through ONE batched program
    (engine_admit_many) — including the pad-to-power-of-two duplicate-row
    path — and stays token-identical to lm_generate."""
    import cosyvoice_tpu.runtime.engine as E

    model, params = make_model(True)
    calls = {"many": 0, "one": 0}
    orig_many, orig_one = E.engine_admit_many, E.engine_admit

    monkeypatch.setattr(E, "engine_admit_many", lambda *a, **k: (
        calls.__setitem__("many", calls["many"] + 1), orig_many(*a, **k))[1])
    monkeypatch.setattr(E, "engine_admit", lambda *a, **k: (
        calls.__setitem__("one", calls["one"] + 1), orig_one(*a, **k))[1])

    rng = np.random.default_rng(23)
    reqs = [GenRequest(
        text=rng.integers(0, TINY.vocab_size, 1 + i % 4).astype(np.int32),
        prompt_speech=rng.integers(0, S, 1 + (i * 2) % 4).astype(np.int32))
        for i in range(n)]
    eng = ServingEngine(model, params, num_slots=8, cache_len=256, max_out=128,
                        segment_steps=6, text_bucket=4, speech_bucket=4)
    got = eng.generate(reqs, rng=jax.random.PRNGKey(9))
    assert calls["many"] == 1 and calls["one"] == 0, calls
    for i, r in enumerate(reqs):
        want = reference_tokens(model, params, r, max_steps=128, cache_len=256)
        np.testing.assert_array_equal(got[i], want, err_msg=f"request {i}")


def test_engine_more_requests_than_slots_all_finish():
    model, params = make_model(False)
    rng = np.random.default_rng(11)
    reqs = [GenRequest(text=rng.integers(0, TINY.vocab_size, 2 + i % 3).astype(np.int32),
                       prompt_speech=rng.integers(0, S, i % 4).astype(np.int32))
            for i in range(7)]
    eng = ServingEngine(model, params, num_slots=3, cache_len=256, max_out=128,
                        segment_steps=8, text_bucket=4, speech_bucket=4)
    got = eng.generate(reqs, rng=jax.random.PRNGKey(0))
    for i, r in enumerate(reqs):
        want = reference_tokens(model, params, r, max_steps=128, cache_len=256)
        np.testing.assert_array_equal(got[i], want, err_msg=f"request {i}")


@pytest.mark.parametrize("batch_chunks", [True, False])
def test_continuous_synthesizer_matches_sequential_stream(batch_chunks):
    """Full TTS under continuous batching: two interleaved requests produce
    the waveform model.tts(stream=True) produces for each in isolation
    (greedy LM; session-scoped vocoder noise makes the vocoder independent
    of interleaving) — with chunk jobs flushed as ragged flow batches
    (batch_chunks) or as sequential token2wav calls."""
    from cosyvoice_tpu.models.llm import SamplingConfig as SC
    from cosyvoice_tpu.runtime.serving import ContinuousSynthesizer, TTSRequest
    from tests.test_runtime import SPEECH_VOCAB, N_MEL, build_tiny_stack

    m = build_tiny_stack(sampling=SC(method="greedy"))
    # random weights greedily hit a non-emitted fill id and stall; bias the
    # head away from eos/fill so decode emits every step up to max_len=96,
    # guaranteeing streamed chunks past the hop+la=53 threshold
    bias = np.asarray(m.llm_params["params"]["llm_decoder"]["bias"]).copy()
    bias[SPEECH_VOCAB:] = -30.0
    m.llm_params["params"]["llm_decoder"]["bias"] = jnp.asarray(bias)
    rng = np.random.default_rng(5)
    # PIN the CFM noise (as from_pretrained does with the reference's seed-0
    # buffer): the engine's ragged flow batches must consume the same pinned
    # buffer as the sequential tts() path (round-2 ADVICE: they silently
    # diverged when flow_noise was set)
    m.flow_noise = (rng.standard_normal((1, 2000, N_MEL)) * 0.7).astype(np.float32)
    reqs = []
    for n in (30, 27):  # min_len = 2n > hop+la=53 guarantees >=1 stream chunk
        reqs.append(TTSRequest(
            text_tokens=rng.integers(0, 300, n).astype(np.int32),
            prompt_text_len=0,
            prompt_speech_tokens=rng.integers(0, SPEECH_VOCAB, 4).astype(np.int32),
            prompt_feat=rng.standard_normal((8, N_MEL)).astype(np.float32),
            embedding=rng.standard_normal(24).astype(np.float32)))

    seen = []

    def on_chunk(idx, wav, final):
        seen.append((idx, len(wav), final))

    synth = ContinuousSynthesizer(m, num_slots=2, cache_len=256,
                                  max_out=m.max_decode_tokens,
                                  text_bucket=16, speech_bucket=8,
                                  batch_chunks=batch_chunks)
    got = synth.synthesize_batch(reqs, rng=jax.random.PRNGKey(2),
                                 on_chunk=on_chunk)
    assert {i for i, _, f in seen if f} == {0, 1}
    assert any(not f for _, _, f in seen), "expected streamed (non-final) chunks"
    for i, r in enumerate(reqs):
        want = np.concatenate([o["tts_speech"] for o in m.tts(
            text_tokens=r.text_tokens, prompt_text_len=0,
            llm_prompt_speech_token=r.prompt_speech_tokens,
            flow_prompt_speech_token=r.prompt_speech_tokens,
            prompt_speech_feat=r.prompt_feat, flow_embedding=r.embedding,
            stream=True, rng=jax.random.PRNGKey(9))])
        # batched ragged flow chunks reassociate fp ops vs the sequential
        # B=1 calls; tokens are exactly equal, wavs to fp tolerance
        np.testing.assert_allclose(got[i], want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"request {i}")


def test_flow_context_window_engine_matches_sequential():
    """flow_context_tokens bounds every streaming chunk's flow call (the
    exact path re-runs the whole prefix — quadratic in stream length) while
    the continuous engine and the sequential tts() path stay wav-equal:
    both window with the same drop rule and re-indexed pinned noise.  Also
    checks the window actually drops context (call shapes bounded, audio
    differs from the exact path once drops kick in)."""
    from cosyvoice_tpu.models.llm import SamplingConfig as SC
    from cosyvoice_tpu.runtime.serving import ContinuousSynthesizer, TTSRequest
    from tests.test_runtime import SPEECH_VOCAB, N_MEL, build_tiny_stack

    W = 16  # hop=2*fr=8, la=3 -> smallest legal window is 11
    kw = dict(sampling=SC(method="greedy"), input_frame_rate=4,
              max_decode_tokens=64)
    m = build_tiny_stack(flow_context_tokens=W, **kw)
    rng = np.random.default_rng(5)
    for mm in (m,):
        b = np.asarray(mm.llm_params["params"]["llm_decoder"]["bias"]).copy()
        b[SPEECH_VOCAB:] = -30.0  # emit every step -> long streams
        mm.llm_params["params"]["llm_decoder"]["bias"] = jnp.asarray(b)
    reqs = [TTSRequest(
        text_tokens=rng.integers(0, 300, n).astype(np.int32),
        prompt_text_len=0,
        prompt_speech_tokens=rng.integers(0, SPEECH_VOCAB, 4).astype(np.int32),
        prompt_feat=rng.standard_normal((8, N_MEL)).astype(np.float32),
        embedding=rng.standard_normal(24).astype(np.float32))
        for n in (16, 14)]

    synth = ContinuousSynthesizer(m, num_slots=2, cache_len=256,
                                  max_out=m.max_decode_tokens,
                                  text_bucket=16, speech_bucket=8)
    buckets = []
    inner = synth._flow_ragged
    synth._flow_ragged = lambda p, tok, *a, **k: (
        buckets.append(tok.shape[1]), inner(p, tok, *a, **k))[1]
    got = synth.synthesize_batch(reqs, rng=jax.random.PRNGKey(2))
    # every engine flow call is bounded by prompt + W + hop-1 lookback +
    # hop+la emission window, bucketed — NOT by the full stream length
    cap = 4 + W + m.token_hop_len  # kept tokens <= W + hop - 1, +prompt
    cap = ((cap + m.token_hop_len - 1) // m.token_hop_len) * m.token_hop_len
    assert max(buckets) <= cap, (max(buckets), cap)

    for i, r in enumerate(reqs):
        want = np.concatenate([o["tts_speech"] for o in m.tts(
            text_tokens=r.text_tokens, prompt_text_len=0,
            llm_prompt_speech_token=r.prompt_speech_tokens,
            flow_prompt_speech_token=r.prompt_speech_tokens,
            prompt_speech_feat=r.prompt_feat, flow_embedding=r.embedding,
            stream=True, rng=jax.random.PRNGKey(9))])
        np.testing.assert_allclose(got[i], want, atol=1e-4, rtol=1e-4,
                                   err_msg=f"request {i}")

    # the lever is not a no-op: the exact model (same auto-pinned noise
    # buffer) diverges once chunks start dropping context
    m_exact = build_tiny_stack(flow_context_tokens=None, **kw)
    m_exact.llm_params = m.llm_params
    m_exact.flow_params, m_exact.hift_params = m.flow_params, m.hift_params
    r = reqs[0]
    exact = np.concatenate([o["tts_speech"] for o in m_exact.tts(
        text_tokens=r.text_tokens, prompt_text_len=0,
        llm_prompt_speech_token=r.prompt_speech_tokens,
        flow_prompt_speech_token=r.prompt_speech_tokens,
        prompt_speech_feat=r.prompt_feat, flow_embedding=r.embedding,
        stream=True, rng=jax.random.PRNGKey(9))])
    assert exact.shape == got[0].shape
    assert not np.allclose(exact, got[0], atol=1e-4)


def test_continuous_synthesizer_flow_on_second_device():
    """Two-chip stage pipelining: flow+vocoder placed on a second device
    still produces finite, correctly-shaped streaming output (numerics are
    device-placement-invariant on the CPU mesh)."""
    from cosyvoice_tpu.models.llm import SamplingConfig as SC
    from cosyvoice_tpu.runtime.serving import ContinuousSynthesizer, TTSRequest
    from tests.test_runtime import SPEECH_VOCAB, N_MEL, build_tiny_stack

    m = build_tiny_stack(sampling=SC(method="greedy"), deterministic_hift=True)
    rng = np.random.default_rng(6)
    reqs = [TTSRequest(text_tokens=rng.integers(0, 300, 8).astype(np.int32),
                       prompt_text_len=0,
                       prompt_speech_tokens=rng.integers(0, SPEECH_VOCAB, 4).astype(np.int32),
                       prompt_feat=(rng.standard_normal((8, N_MEL)) * 0.3).astype(np.float32),
                       embedding=rng.standard_normal(24).astype(np.float32))]
    base = ContinuousSynthesizer(m, num_slots=2, cache_len=256,
                                 text_bucket=16, speech_bucket=8)
    want = base.synthesize_batch(reqs, rng=jax.random.PRNGKey(3))
    m2 = build_tiny_stack(sampling=SC(method="greedy"), deterministic_hift=True)
    synth = ContinuousSynthesizer(m2, num_slots=2, cache_len=256,
                                  text_bucket=16, speech_bucket=8,
                                  flow_device=jax.devices()[1])
    got = synth.synthesize_batch(reqs, rng=jax.random.PRNGKey(3))
    np.testing.assert_allclose(got[0], want[0], atol=1e-5, rtol=1e-5)


def test_engine_online_serve_staggered_threads():
    """Online mode: submissions arrive from another thread WHILE the engine
    decodes; tokens still match isolated lm_generate, and the None sentinel
    drains and returns."""
    import queue
    import threading
    import time

    model, params = make_model(False)
    rng = np.random.default_rng(13)
    reqs = [GenRequest(text=rng.integers(0, TINY.vocab_size, 3 + i).astype(np.int32),
                       prompt_speech=rng.integers(0, S, i % 3).astype(np.int32))
            for i in range(4)]
    eng = ServingEngine(model, params, num_slots=2, cache_len=256, max_out=128,
                        segment_steps=5, text_bucket=4, speech_bucket=4)
    subs: queue.Queue = queue.Queue()
    got: dict[int, list] = {i: [] for i in range(len(reqs))}
    fins: set = set()

    def cb_for(i):
        def cb(new, fin):
            got[i].extend(new.tolist())
            if fin:
                fins.add(i)
        return cb

    def feeder():
        subs.put((reqs[0], cb_for(0)))
        time.sleep(0.5)  # engine should be mid-decode / blocked on work
        subs.put((reqs[1], cb_for(1)))
        subs.put((reqs[2], cb_for(2)))
        time.sleep(0.5)
        subs.put((reqs[3], cb_for(3)))
        subs.put(None)

    t = threading.Thread(target=feeder)
    t.start()
    eng.serve(subs, rng=jax.random.PRNGKey(0))
    t.join()
    assert fins == {0, 1, 2, 3}
    for i, r in enumerate(reqs):
        want = reference_tokens(model, params, r, max_steps=128, cache_len=256)
        np.testing.assert_array_equal(np.asarray(got[i], np.int32), want,
                                      err_msg=f"request {i}")


def test_engine_phoneme_lm_greedy_parity():
    """The PRODUCTION phoneme LM (Qwen2LM_Phoneme_Src2 — what the reference
    serves behind sglang/vllm) through the continuous-batching engine:
    staggered admits must reproduce phoneme_lm_generate per request."""
    from cosyvoice_tpu.models.llm_phoneme import (Qwen2LMPhonemeSrc2,
                                                  phoneme_lm_generate)
    from tests.test_llm_phoneme import CFG, PHO, _pho_tokens

    model = Qwen2LMPhonemeSrc2(CFG)
    rng = np.random.default_rng(2)
    t0 = jnp.asarray(rng.integers(0, CFG.qwen.vocab_size, (1, 5)))
    p0 = jnp.asarray(_pho_tokens(rng, 6)[None])
    params = model.init(jax.random.PRNGKey(0), t0, jnp.asarray([5]),
                        p0, jnp.asarray([6]),
                        jnp.asarray(rng.integers(0, CFG.speech_token_size, (1, 4))),
                        jnp.asarray([4]),
                        jnp.asarray(rng.standard_normal((1, CFG.spk_embed_dim)),
                                    jnp.float32))

    reqs = []
    for n_text, n_pho, n_ps in ((6, 7, 4), (4, 5, 2), (8, 9, 3)):
        reqs.append(GenRequest(
            text=rng.integers(0, CFG.qwen.vocab_size, n_text).astype(np.int32),
            prompt_speech=rng.integers(0, CFG.speech_token_size, n_ps).astype(np.int32),
            pho_token=_pho_tokens(rng, n_pho).astype(np.int32),
            embedding=rng.standard_normal(CFG.spk_embed_dim).astype(np.float32),
            min_len=0, max_len=24, new_text_len=n_pho))

    engine = ServingEngine(model, params, num_slots=2, cache_len=128,
                           max_out=24, segment_steps=6, text_bucket=8,
                           speech_bucket=8)
    got = engine.generate(reqs, rng=jax.random.PRNGKey(0))

    for i, r in enumerate(reqs):
        out, cnt = phoneme_lm_generate(
            model, params, jnp.asarray(r.text[None]),
            jnp.asarray([len(r.text)]), jnp.asarray(r.pho_token[None]),
            jnp.asarray([len(r.pho_token)]), jnp.asarray(r.prompt_speech[None]),
            jnp.asarray([len(r.prompt_speech)]),
            jnp.asarray(r.embedding[None]),
            jnp.asarray([0]), jnp.asarray([24]), jax.random.PRNGKey(0),
            max_steps=24, cache_len=128)
        want = np.asarray(out[0, :int(cnt[0])])
        np.testing.assert_array_equal(got[i], want, err_msg=f"request {i}")


def test_continuous_synthesizer_phoneme_stream():
    """Full streaming TTS for the production phoneme model through the
    continuous engine: pho_token requests -> engine decode -> ragged flow
    chunks -> grouped vocode; matches the per-request token stream and
    yields finite chunked audio."""
    from cosyvoice_tpu.models.conformer import ConformerConfig
    from cosyvoice_tpu.models.flow import (CFMConfig, CausalMaskedDiffWithXvec,
                                           EstimatorConfig, FlowConfig)
    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.models.llm_phoneme import (Qwen2LMPhonemeSrc2,
                                                  phoneme_lm_generate)
    from cosyvoice_tpu.runtime.model import CosyVoice2Model
    from cosyvoice_tpu.runtime.serving import ContinuousSynthesizer, TTSRequest
    from tests.test_llm_phoneme import CFG, _pho_tokens

    n_mel = 16
    sv = CFG.speech_token_size
    llm = Qwen2LMPhonemeSrc2(CFG)
    rng = np.random.default_rng(4)
    t0 = jnp.asarray(rng.integers(0, CFG.qwen.vocab_size, (1, 5)))
    p0 = jnp.asarray(_pho_tokens(rng, 6)[None])
    llm_params = llm.init(jax.random.PRNGKey(0), t0, jnp.asarray([5]),
                          p0, jnp.asarray([6]),
                          jnp.asarray(rng.integers(0, sv, (1, 4))),
                          jnp.asarray([4]),
                          jnp.asarray(rng.standard_normal((1, CFG.spk_embed_dim)),
                                      jnp.float32))
    # bias away from eos/fill so greedy decode emits up to max_len
    bias = np.asarray(llm_params["params"]["llm_decoder"]["bias"]).copy()
    bias[sv:] = -30.0
    llm_params["params"]["llm_decoder"]["bias"] = jnp.asarray(bias)

    enc = ConformerConfig(dim=32, heads=2, linear_units=48, num_blocks=1,
                          dropout_rate=0.0, attention_dropout_rate=0.0,
                          input_size=32, static_chunk_size=50)
    est = EstimatorConfig(in_channels=4 * n_mel, out_channels=n_mel,
                          causal=True, channels=(16,), n_blocks=1,
                          num_mid_blocks=1, num_heads=2, attention_head_dim=8)
    flow_cfg = FlowConfig(input_size=32, output_size=n_mel,
                          spk_embed_dim=CFG.spk_embed_dim, vocab_size=sv + 3,
                          encoder=enc, estimator=est,
                          cfm=CFMConfig(noise_frames=2000))
    hift_cfg = HiFTConfig(in_channels=n_mel, base_channels=32, nb_harmonics=1,
                          upsample_rates=(4, 3), upsample_kernel_sizes=(8, 7),
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1, 3),),
                          source_resblock_kernel_sizes=(5, 7),
                          source_resblock_dilation_sizes=((1, 3), (1, 3)),
                          f0_cond_channels=8, sampling_rate=2304)
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    hift = HiFTGenerator(hift_cfg)
    k = jax.random.PRNGKey(1)
    flow_params = flow.init(k, jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
                            jnp.zeros((1, 4, n_mel)),
                            jnp.zeros((1, CFG.spk_embed_dim)),
                            method=CausalMaskedDiffWithXvec.inference)
    hift_params = hift.init({"params": k, "noise": k},
                            jnp.zeros((1, 10, n_mel)))
    m = CosyVoice2Model(llm=llm, flow=flow, hift=hift, llm_params=llm_params,
                        flow_params=flow_params, hift_params=hift_params,
                        max_decode_tokens=96)

    reqs = []
    for n_pho in (30, 27):  # max 20x pho > 53 -> at least one stream chunk
        reqs.append(TTSRequest(
            text_tokens=rng.integers(0, CFG.qwen.vocab_size, 8).astype(np.int32),
            prompt_text_len=0,
            prompt_speech_tokens=rng.integers(0, sv, 4).astype(np.int32),
            prompt_feat=rng.standard_normal((8, n_mel)).astype(np.float32),
            embedding=rng.standard_normal(CFG.spk_embed_dim).astype(np.float32),
            pho_token=_pho_tokens(rng, n_pho).astype(np.int32)))

    seen = []
    synth = ContinuousSynthesizer(m, num_slots=2, cache_len=256, max_out=96,
                                  text_bucket=16, speech_bucket=8)
    got = synth.synthesize_batch(reqs, rng=jax.random.PRNGKey(2),
                                 on_chunk=lambda i, w, f: seen.append((i, f)))
    assert {i for i, f in seen if f} == {0, 1}
    assert any(not f for _, f in seen), "expected streamed chunks"
    for i, r in enumerate(reqs):
        assert got[i].size > 0 and np.isfinite(got[i]).all()
        # token stream parity: engine == isolated phoneme_lm_generate
        out, cnt = phoneme_lm_generate(
            m.llm, m.llm_params, jnp.asarray(r.text_tokens[None]),
            jnp.asarray([len(r.text_tokens)]), jnp.asarray(r.pho_token[None]),
            jnp.asarray([len(r.pho_token)]),
            jnp.asarray(r.prompt_speech_tokens[None]),
            jnp.asarray([len(r.prompt_speech_tokens)]),
            jnp.asarray(r.embedding[None]),
            jnp.asarray([int(2 * len(r.pho_token))]),
            jnp.asarray([min(int(20 * len(r.pho_token)), 96)]),
            jax.random.PRNGKey(0), max_steps=96, cache_len=256)
        n_tok = int(cnt[0])
        # chunked synthesis re-emits the la=3-token lookahead region of each
        # non-final chunk (cross-faded), so audio = (n_tok + 3*(chunks-1))
        # tokens x 2 mel frames x 48 samples
        n_chunks = sum(1 for j, _ in seen if j == i)
        assert got[i].shape[0] == (n_tok + 3 * (n_chunks - 1)) * 2 * 48, \
            (got[i].shape[0], n_tok, n_chunks)


def test_engine_batched_admit_padded_rows_exact_under_ras():
    """Padding a batched-admit group with duplicate rows aimed at slots[0]
    must be EXACT under stochastic sampling too, not just greedy: the admit
    folds its sample key per slot id, so duplicate rows draw identical bits
    and all ~10 duplicate-index scatters write identical values regardless
    of XLA's duplicate-scatter ordering (round-3 advisor finding).  Admitting
    [r0, r1, r2, r0->slots[0]] must equal admitting [r0, r1, r2]."""
    from cosyvoice_tpu.runtime.engine import engine_admit_many, engine_init

    qwen = dataclasses.replace(TINY, fused_cache_update=False)
    cfg = LMConfig(llm_input_size=TINY.hidden_size,
                   llm_output_size=TINY.hidden_size, speech_token_size=S,
                   qwen=qwen,
                   sampling=SamplingConfig(method="ras", top_p=0.8, top_k=5,
                                           win_size=4, tau_r=0.1))
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(7)
    t = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 5)))
    params = model.init(jax.random.PRNGKey(0), t, jnp.asarray([5]),
                        t, jnp.asarray([5]))

    def admit(slots, rows):
        st = engine_init(model, 8, 256, 64, jax.random.PRNGKey(3), jnp.float32)
        text = jnp.asarray(np.stack([r[0] for r in rows]))
        tlen = jnp.asarray([len(r[0]) for r in rows], jnp.int32)
        psp = jnp.asarray(np.stack([r[1] for r in rows]))
        plen = jnp.asarray([len(r[1]) for r in rows], jnp.int32)
        mn = jnp.asarray([1] * len(rows), jnp.int32)
        mx = jnp.asarray([32] * len(rows), jnp.int32)
        # jitted fn donates state; pass a fresh one each call
        return engine_admit_many(model, params, st,
                                 jnp.asarray(slots, jnp.int32),
                                 text, tlen, psp, plen, mn, mx)

    r0 = (rng.integers(0, TINY.vocab_size, 4).astype(np.int32),
          rng.integers(0, S, 4).astype(np.int32))
    r1 = (rng.integers(0, TINY.vocab_size, 4).astype(np.int32),
          rng.integers(0, S, 4).astype(np.int32))
    r2 = (rng.integers(0, TINY.vocab_size, 4).astype(np.int32),
          rng.integers(0, S, 4).astype(np.int32))

    padded = admit([2, 5, 6, 2], [r0, r1, r2, r0])
    plain = admit([2, 5, 6], [r0, r1, r2])
    for name in ("out", "count", "done", "recent", "recent_n", "prev_emb",
                 "min_len", "max_len", "step"):
        a, b = getattr(padded, name), getattr(plain, name)
        np.testing.assert_array_equal(np.asarray(a)[[2, 5, 6]],
                                      np.asarray(b)[[2, 5, 6]],
                                      err_msg=name)


def test_continuous_synthesizer_progressive_hop():
    """hop_scale > 1 grows each stream's chunk hop (v1-style growing hop on
    the v2 continuous path): later chunks emit more audio per flow call.
    The batched flush path must equal the sequential token2wav path on the
    SAME progressive schedule (mixed win_rows in one flush group), and the
    schedule must actually produce growing chunks."""
    from cosyvoice_tpu.models.llm import SamplingConfig as SC
    from cosyvoice_tpu.runtime.serving import ContinuousSynthesizer, TTSRequest
    from tests.test_runtime import SPEECH_VOCAB, N_MEL, build_tiny_stack

    kw = dict(sampling=SC(method="greedy"), input_frame_rate=4,
              max_decode_tokens=96)
    rng = np.random.default_rng(5)
    reqs = [TTSRequest(
        text_tokens=rng.integers(0, 300, n).astype(np.int32),
        prompt_text_len=0,
        prompt_speech_tokens=rng.integers(0, SPEECH_VOCAB, 4).astype(np.int32),
        prompt_feat=rng.standard_normal((8, N_MEL)).astype(np.float32),
        embedding=rng.standard_normal(24).astype(np.float32))
        for n in (30, 27)]

    got = {}
    sizes = {}
    for batch_chunks in (True, False):
        m = build_tiny_stack(**kw)
        b = np.asarray(m.llm_params["params"]["llm_decoder"]["bias"]).copy()
        b[SPEECH_VOCAB:] = -30.0  # emit every step -> long streams
        m.llm_params["params"]["llm_decoder"]["bias"] = jnp.asarray(b)
        m.flow_noise = (np.random.default_rng(1).standard_normal(
            (1, 2000, N_MEL)) * 0.7).astype(np.float32)
        chunks = {0: [], 1: []}

        def on_chunk(idx, wav, final, chunks=chunks):
            chunks[idx].append(len(wav))

        synth = ContinuousSynthesizer(m, num_slots=2, cache_len=256,
                                      max_out=m.max_decode_tokens,
                                      text_bucket=16, speech_bucket=8,
                                      batch_chunks=batch_chunks,
                                      hop_scale=2.0)
        got[batch_chunks] = synth.synthesize_batch(
            reqs, rng=jax.random.PRNGKey(2), on_chunk=on_chunk)
        sizes[batch_chunks] = chunks

    # same progressive schedule on both paths -> same chunk sizes and wavs
    assert sizes[True] == sizes[False]
    for i in range(len(reqs)):
        assert len(got[True][i]) == len(got[False][i])
        np.testing.assert_allclose(got[True][i], got[False][i],
                                   atol=1e-4, rtol=1e-4, err_msg=f"req {i}")
    # hop actually grew: a later streamed (non-final) chunk is strictly
    # bigger than the first
    ch0 = sizes[True][0]
    assert len(ch0) >= 2 and max(ch0[1:]) > ch0[0], ch0


def test_incremental_flow_engine_matches_stream_model():
    """ContinuousSynthesizer(incremental=True): the slot-based incremental
    flow engine (runtime/flow_engine.py) synthesizes the SAME audio as the
    one-shot stream-masked flow model vocoded with the same chunk windows —
    i.e. chunked serving computes each mel row once, exactly.  Greedy LM
    (token parity with lm_generate is covered above), 2 interleaved
    requests with different prompt/text lengths."""
    from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec
    from cosyvoice_tpu.models.llm import SamplingConfig as SC
    from cosyvoice_tpu.runtime.serving import ContinuousSynthesizer, TTSRequest
    from tests.test_runtime import SPEECH_VOCAB, N_MEL, build_tiny_stack

    m = build_tiny_stack(sampling=SC(method="greedy"), input_frame_rate=4,
                         max_decode_tokens=64, stream_flow=True)
    rng = np.random.default_rng(5)
    b = np.asarray(m.llm_params["params"]["llm_decoder"]["bias"]).copy()
    b[SPEECH_VOCAB:] = -30.0  # emit every step -> long streams
    m.llm_params["params"]["llm_decoder"]["bias"] = jnp.asarray(b)
    reqs = [TTSRequest(
        text_tokens=rng.integers(0, 300, n).astype(np.int32),
        prompt_text_len=0,
        prompt_speech_tokens=rng.integers(0, SPEECH_VOCAB, p).astype(np.int32),
        prompt_feat=rng.standard_normal((2 * p, N_MEL)).astype(np.float32),
        embedding=rng.standard_normal(24).astype(np.float32))
        for n, p in ((16, 4), (14, 3))]

    synth = ContinuousSynthesizer(m, num_slots=2, cache_len=256,
                                  max_out=m.max_decode_tokens,
                                  text_bucket=16, speech_bucket=8,
                                  incremental=True)
    got = synth.synthesize_batch(reqs, rng=jax.random.PRNGKey(2))

    hop, la = m.token_hop_len, m.pre_lookahead_len
    for i, r in enumerate(reqs):
        toks = m.llm_generate(r.text_tokens, 0, r.prompt_speech_tokens,
                              jax.random.PRNGKey(0))
        P = len(r.prompt_speech_tokens)
        tok_all = np.concatenate([r.prompt_speech_tokens, toks])
        # one-shot stream-masked mel over the full sequence (anchored grid,
        # finite left context — the model the incremental engine serves)
        mel = m.flow.apply(
            m.flow_params, jnp.asarray(tok_all[None]),
            jnp.asarray([len(tok_all)]), jnp.asarray(r.prompt_feat[None]),
            jnp.asarray(r.embedding[None]), streaming=True, finalize=True,
            chunk_anchor=jnp.asarray([P]),
            method=CausalMaskedDiffWithXvec.inference)
        gen_mel = np.asarray(mel[0])     # [2*len(toks), N_MEL]
        assert gen_mel.shape[0] == 2 * len(toks)
        # vocode with the engine's own chunk-window programs
        session: dict = {"hift": None}
        parts = []
        off = 0
        while len(toks) - off >= hop + la:
            win = jnp.asarray(gen_mel[None, 2 * off: 2 * (off + hop)])
            parts.append(m.mel2wav_stream_group(win, [0], [0], [session],
                                                win_rows=2 * hop)[0])
            off += hop
        rest = gen_mel[2 * off:]
        parts.append(m.mel2wav_final_group(
            jnp.asarray(rest[None]), [0], [0], [rest.shape[0]], [session])[0])
        want = np.concatenate(parts)
        np.testing.assert_allclose(got[i], want, atol=2e-4, rtol=1e-3,
                                   err_msg=f"request {i}")
