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
BATCHES = (8, 16, 32)     # LM decode is weight-bound, so it amortizes with B


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

    results = {}
    for B in (1,) + BATCHES:
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

    best_b = max(results, key=results.get)
    value = results[best_b]
    print(json.dumps({
        "metric": (f"full text->wav audio-seconds/s per chip "
                   f"(int8 LM, bf16 flow, B={best_b} serving; "
                   f"1-stream {results[1]:.1f}x)"),
        "value": round(value, 2), "unit": "audio_s/s",
        "vs_baseline": round(value / 50.0, 3)}))


if __name__ == "__main__":
    main()
