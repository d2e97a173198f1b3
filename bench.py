"""End-to-end TTS benchmark: full text->wav throughput on one chip.

Runs the full-size CosyVoice2 stack (Qwen2-0.5B LM -> flow -> HiFT, random
weights — compute is weight-independent): a single-stream run (latency RTF)
and a batched serving run (B utterances decoded concurrently — the per-chip
throughput number that matters for production serving).  LM params/KV run in
bf16 (fp32 softmax/norms); flow + vocoder in fp32.

Baseline target (BASELINE.md): >50x real-time per TPU v5e chip;
vs_baseline = value / 50.  Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N_TOKENS = 500            # 20 s of audio per utterance at 25 Hz
BATCHES = (8, 32, 64)     # LM decode is weight-bound, so it amortizes with B
                          # (B=128 exhausts v5e HBM)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec, FlowConfig
    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, lm_generate
    from cosyvoice_tpu.utils.dtype import to_bf16

    rng = np.random.default_rng(0)
    lm_cfg, flow_cfg, hift_cfg = LMConfig(), FlowConfig(), HiFTConfig()
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # serving fast path for the CFM estimator: Pallas flash attention
        # (exact on the unpadded serving batch; see
        # test_estimator_fused_attention_matches_naive) + bf16 compute
        # (the reference serves flow in fp16, cli/model.py:43-45)
        import dataclasses
        flow_cfg = dataclasses.replace(
            flow_cfg, encoder_dtype="bfloat16",
            estimator=dataclasses.replace(
                flow_cfg.estimator, fused_attention=True, dtype="bfloat16",
                approx_gelu=True, fused_norm=True))
        # int8 weight-only LM: decode reads weights every step; int8 halves
        # the HBM traffic bound (tokens track fp, test_lm_int8_decode_matches_fp)
        # fused_cache_update: Pallas decode attention + in-place KV append
        # over the packed cache — kills the per-step whole-cache copy
        # (greedy-parity tested on TPU; ~27% off the decode step at B=32)
        lm_cfg = dataclasses.replace(
            lm_cfg, qwen=dataclasses.replace(lm_cfg.qwen, quant="int8",
                                             fused_cache_update=True))
        # the fused kernel's fixed per-call cost only amortizes at B >= ~8;
        # single-stream decodes on the plain head-major path (same params)
        lm_cfg_b1 = dataclasses.replace(
            lm_cfg, qwen=dataclasses.replace(lm_cfg.qwen,
                                             fused_cache_update=False))
        # lane_pack: space-to-depth the C=64 level — kills the elementwise<->
        # conv layout-copy ping-pong (see HiFTConfig.lane_pack; exact numerics)
        hift_cfg = dataclasses.replace(hift_cfg, dtype="bfloat16",
                                       approx_sin=True, lane_pack=True)
    llm, flow, hift = Qwen2LM(lm_cfg), CausalMaskedDiffWithXvec(flow_cfg), HiFTGenerator(hift_cfg)
    llm_b1 = Qwen2LM(lm_cfg_b1) if on_tpu else llm  # same param tree

    def zeros_of(init_fn, fill=0.0):
        shapes = jax.eval_shape(init_fn)
        return jax.tree.map(lambda s: jnp.full(s.shape, fill, s.dtype), shapes)

    k = jax.random.PRNGKey(0)
    text1 = jnp.asarray(rng.integers(0, 1000, (1, 25)))
    psp1 = jnp.asarray(rng.integers(0, 6561, (1, 50)))
    log("initializing params (structure-only)...")
    llm_params = to_bf16(zeros_of(lambda: llm.init(
        k, text1, jnp.asarray([25]), psp1, jnp.asarray([50]))))
    flow_params = zeros_of(lambda: flow.init(
        k, psp1, jnp.asarray([50]), jnp.zeros((1, 20, 80)), jnp.zeros((1, 192)),
        method=CausalMaskedDiffWithXvec.inference))
    if on_tpu:
        # estimator subtree in bf16 to match its serving dtype (inputs are
        # cast inside ConditionalDecoder; encoder stays fp32)
        flow_params = dict(flow_params)
        flow_params["params"] = dict(flow_params["params"])
        flow_params["params"]["decoder"] = dict(flow_params["params"]["decoder"])
        flow_params["params"]["decoder"]["estimator"] = to_bf16(
            flow_params["params"]["decoder"]["estimator"])
        flow_params["params"]["encoder"] = to_bf16(flow_params["params"]["encoder"])
    hift_params = zeros_of(lambda: hift.init(
        {"params": k, "noise": k}, jnp.zeros((1, 20, 80))), fill=0.01)
    if on_tpu:
        hift_params = to_bf16(hift_params)

    @jax.jit
    def flow_infer(params, token, token_len, prompt_feat, emb):
        return flow.apply(params, token, token_len, prompt_feat, emb,
                          method=CausalMaskedDiffWithXvec.inference)

    @jax.jit
    def hift_infer(params, mel, rng):
        return hift.apply(params, mel, rngs={"noise": rng},
                          method=HiFTGenerator.inference)

    prompt_feat1 = jnp.asarray((rng.standard_normal((1, 100, 80)) * 0.3).astype(np.float32))
    emb1 = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))

    stages = bool(os.environ.get("BENCH_STAGES"))

    def sync(x, name):
        if stages:
            t0 = time.time()
            float(jnp.sum(jnp.abs(x[:1, :8])))
            log(f"    [{name} done @ +{time.time() - t0:.2f}s]")
        return x

    def run(B, seed):
        text = jnp.tile(text1, (B, 1))
        psp = jnp.tile(psp1, (B, 1))
        n = jnp.full((B,), N_TOKENS)
        cache_len = ((2 + 25 + 50 + N_TOKENS + 127) // 128) * 128
        out, count = lm_generate(llm if B >= 8 else llm_b1, llm_params,
                                 text, jnp.full((B,), 25),
                                 psp, jnp.full((B,), 50), n, n,
                                 jax.random.PRNGKey(seed), max_steps=N_TOKENS,
                                 cache_len=cache_len)
        sync(out, "lm")
        tok = jnp.concatenate([psp, out], axis=1)
        mel = flow_infer(flow_params, tok, jnp.full((B,), 50 + N_TOKENS),
                         jnp.tile(prompt_feat1, (B, 1, 1)), jnp.tile(emb1, (B, 1)))
        sync(mel, "flow")
        wav, _ = hift_infer(hift_params, mel, jax.random.PRNGKey(seed))
        # force a real device->host read: through the remote-TPU tunnel,
        # block_until_ready alone does not observably wait for completion
        float(jnp.sum(jnp.abs(wav[:, ::1000])))
        return wav


    def roofline(B, dt):
        """Stage MFU / roofline accounting (printed so regressions are
        visible — round-1 VERDICT bench-methodology gap).  Analytic FLOPs/
        bytes at the bench shapes; v5e peaks: 197 bf16 TF/s, 819 GB/s HBM."""
        T_mel = (50 + N_TOKENS) * 2
        Tp = ((T_mel + 127) // 128) * 128
        blocks, dim, heads, hd, ff = 14 * 4, 256, 8, 64, 1024
        att = 4 * 2 * B * heads * Tp * Tp * hd * blocks
        mm = 2 * 2 * B * Tp * dim * (3 * heads * hd + heads * hd
                                     + 2 * ff) * blocks
        est_tf = (att + mm) / 1e12  # x10 euler steps below
        # LM decode: int8 weight bytes read every step
        qwen = lm_cfg.qwen
        wbytes = (qwen.hidden_size * qwen.hidden_size * 2
                  + qwen.hidden_size * qwen.num_kv_heads * qwen.head_dim * 2
                  + 3 * qwen.hidden_size * qwen.intermediate_size
                  ) * qwen.num_layers
        lm_gb = wbytes * N_TOKENS / 1e9
        log(f"    roofline: flow estimator ~{10 * est_tf:.1f} TF "
            f"({10 * est_tf / dt / 197 * 100:.0f}% of bf16 peak if it had the "
            f"whole {dt:.2f}s); LM decode reads ~{lm_gb:.0f} GB int8 weights "
            f"({lm_gb / dt / 819 * 100:.0f}% of HBM peak at full duration) — "
            f"see BENCH_STAGES=1 for the per-stage split")

    only = os.environ.get("BENCH_ONLY", "")  # "", "batch", "ragged", "stream"

    results = {1: 0.0}
    for B in ((1,) + BATCHES if only in ("", "batch") else ()):
        log(f"B={B}: warmup/compile...")
        wav = run(B, 0)
        assert np.isfinite(np.asarray(wav)).all(), "non-finite waveform"
        times = []
        for i in range(3):
            t0 = time.time()
            wav = run(B, i + 1)
            times.append(time.time() - t0)
        dt = min(times)
        audio_s = wav.shape[0] * wav.shape[1] / 24000.0
        results[B] = audio_s / dt
        log(f"B={B}: {dt:.2f}s for {audio_s:.0f}s audio -> {results[B]:.1f}x realtime")
        if B == BATCHES[-1]:
            roofline(B, dt)

    best_b = max(results, key=results.get)
    value = results[best_b]

    # ---- ragged serving batch (round-1 VERDICT bench-methodology gap):
    # per-row decode lengths 350..500 tokens; audio credited = emitted only.
    # The while_loop still runs to the longest row, so this prices the
    # ragged-batch padding cost that uniform-length tiling hides.
    def run_ragged(B, seed):
        text = jnp.tile(text1, (B, 1))
        psp = jnp.tile(psp1, (B, 1))
        lens = jnp.asarray(np.linspace(350, N_TOKENS, B).astype(np.int32))
        cache_len = ((2 + 25 + 50 + N_TOKENS + 127) // 128) * 128
        out, count = lm_generate(llm, llm_params, text, jnp.full((B,), 25),
                                 psp, jnp.full((B,), 50), lens, lens,
                                 jax.random.PRNGKey(seed), max_steps=N_TOKENS,
                                 cache_len=cache_len)
        tok = jnp.concatenate([psp, out], axis=1)
        mel = flow_infer(flow_params, tok, 50 + count,
                         jnp.tile(prompt_feat1, (B, 1, 1)), jnp.tile(emb1, (B, 1)))
        wav, _ = hift_infer(hift_params, mel, jax.random.PRNGKey(seed))
        float(jnp.sum(jnp.abs(wav[:, ::1000])))
        return float(jnp.sum(count))

    ragged_rt = 0.0
    if only in ("", "ragged"):
        B = BATCHES[-1]
        log(f"ragged B={B}: warmup/compile...")
        run_ragged(B, 0)
        times = []
        for i in range(2):
            t0 = time.time()
            n_emitted = run_ragged(B, i + 1)
            times.append(time.time() - t0)
        ragged_rt = (n_emitted / 25.0) / min(times)
        log(f"ragged B={B}: {min(times):.2f}s for {n_emitted / 25.0:.0f}s audio "
            f"-> {ragged_rt:.1f}x realtime")

    # ---- streaming latency (TTFB): B=1 through the chunked orchestrator —
    # the reference's first-chunk budget is 2 s (cli/model.py:312,384-396)
    import dataclasses as _dc

    from cosyvoice_tpu.runtime.model import CosyVoice2Model

    stream_tokens = 150
    ratio = stream_tokens / 25.0  # text1 is 25 tokens
    lm_cfg_stream = _dc.replace(
        lm_cfg_b1 if on_tpu else lm_cfg,
        min_token_text_ratio=ratio, max_token_text_ratio=ratio)
    smodel = CosyVoice2Model(
        llm=Qwen2LM(lm_cfg_stream), flow=flow, hift=hift,
        llm_params=llm_params, flow_params=flow_params,
        hift_params=hift_params, max_decode_tokens=stream_tokens)

    def stream_run(seed):
        t0 = time.time()
        ttfb = None
        total = 0
        chunk_times = []
        for out in smodel.tts(
                text_tokens=np.asarray(text1[0]), prompt_text_len=0,
                llm_prompt_speech_token=np.asarray(psp1[0]),
                flow_prompt_speech_token=np.asarray(psp1[0]),
                prompt_speech_feat=np.asarray(prompt_feat1[0]),
                flow_embedding=np.asarray(emb1[0]), stream=True,
                rng=jax.random.PRNGKey(seed)):
            now = time.time()
            if ttfb is None:
                ttfb = now - t0
            chunk_times.append(now - t0)
            total += len(out["tts_speech"])
        return ttfb, total / 24000.0, time.time() - t0

    # ---- N concurrent streaming sessions on the continuous engine
    # (round-1 VERDICT #4: serving-side streaming throughput + TTFB under
    # load).  8 sessions share the slot engine; chunk jobs flush as ragged
    # batched flow calls.
    engine_x = engine_ttfb_ms = 0.0
    if only in ("", "engine"):
        import dataclasses as _dc2

        from cosyvoice_tpu.runtime.model import CosyVoice2Model as _CV2
        from cosyvoice_tpu.runtime.serving import (ContinuousSynthesizer,
                                                   TTSRequest)

        etokens = 150
        eratio = etokens / 25.0
        lm_cfg_eng = _dc2.replace(lm_cfg, min_token_text_ratio=eratio,
                                  max_token_text_ratio=eratio)
        emodel = _CV2(llm=Qwen2LM(lm_cfg_eng), flow=flow, hift=hift,
                      llm_params=llm_params, flow_params=flow_params,
                      hift_params=hift_params, max_decode_tokens=etokens)
        n_sessions = 8
        reqs = [TTSRequest(text_tokens=np.asarray(text1[0]),
                           prompt_text_len=0,
                           prompt_speech_tokens=np.asarray(psp1[0]),
                           prompt_feat=np.asarray(prompt_feat1[0]),
                           embedding=np.asarray(emb1[0]))
                for _ in range(n_sessions)]
        synth = ContinuousSynthesizer(emodel, num_slots=n_sessions,
                                      cache_len=((2 + 25 + 50 + etokens + 127)
                                                 // 128) * 128,
                                      max_out=etokens)

        def engine_run(seed):
            first = {}
            t0 = time.time()

            def on_chunk(idx, wav, final):
                first.setdefault(idx, time.time() - t0)

            got = synth.synthesize_batch(reqs, rng=jax.random.PRNGKey(seed),
                                         on_chunk=on_chunk)
            dt = time.time() - t0
            audio = sum(len(g) for g in got) / 24000.0
            return audio / dt, float(np.mean(list(first.values()))) * 1000.0

        log(f"engine {n_sessions}-stream: warmup/compile...")
        engine_run(0)
        xs, tt = zip(*(engine_run(i + 1) for i in range(2)))
        engine_x, engine_ttfb_ms = max(xs), min(tt)
        log(f"engine {n_sessions}-stream: {engine_x:.1f}x realtime aggregate, "
            f"mean TTFB {engine_ttfb_ms:.0f} ms")

    ttfb_ms = stream_rt = 0.0
    if only in ("", "stream"):
        log("stream B=1: warmup/compile...")
        t0 = time.time()
        stream_run(0)
        log(f"stream warmup done in {time.time() - t0:.1f}s")
        ttfbs, rts = [], []
        for i in range(2):
            ttfb, audio_s, dt = stream_run(i + 1)
            ttfbs.append(ttfb)
            rts.append(audio_s / dt)
        ttfb_ms = min(ttfbs) * 1000.0
        stream_rt = max(rts)
        log(f"stream B=1: TTFB {ttfb_ms:.0f} ms (budget 2000), "
            f"{stream_rt:.1f}x realtime streaming")

    print(json.dumps({
        "metric": (f"full text->wav audio-seconds/s per chip "
                   f"(int8 LM, bf16 flow, B={best_b} serving; "
                   f"1-stream {results[1]:.1f}x)"),
        "value": round(value, 2), "unit": "audio_s/s",
        "vs_baseline": round(value / 50.0, 3),
        "single_stream_x": round(results[1], 2),
        "ragged_bmax_x": round(ragged_rt, 2),
        "stream_ttfb_ms": round(ttfb_ms, 1),
        "stream_rt_x": round(stream_rt, 2),
        "engine_8stream_x": round(engine_x, 2),
        "engine_ttfb_ms": round(engine_ttfb_ms, 1)}))


if __name__ == "__main__":
    main()
