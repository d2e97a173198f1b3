"""End-to-end TTS benchmark: full text->wav real-time factor on one chip.

Runs the full-size CosyVoice2 stack (Qwen2-0.5B LM -> flow -> HiFT, random
weights — compute is weight-independent) in non-stream mode and reports
audio-seconds generated per wall-clock second.  Baseline target (BASELINE.md):
>50x real-time per TPU v5e chip; vs_baseline = value / 50.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from cosyvoice_tpu.models.flow import CausalMaskedDiffWithXvec, FlowConfig
    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, lm_generate
    from cosyvoice_tpu.runtime.model import CosyVoice2Model

    rng = np.random.default_rng(0)
    n_tokens = 500            # 20 s of audio at 25 Hz
    audio_seconds = n_tokens / 25.0

    lm_cfg, flow_cfg, hift_cfg = LMConfig(), FlowConfig(), HiFTConfig()
    llm, flow, hift = Qwen2LM(lm_cfg), CausalMaskedDiffWithXvec(flow_cfg), HiFTGenerator(hift_cfg)

    text = jnp.asarray(rng.integers(0, 1000, (1, 25)))
    tlen = jnp.asarray([25])
    psp = jnp.asarray(rng.integers(0, 6561, (1, 50)))
    plen = jnp.asarray([50])
    k = jax.random.PRNGKey(0)
    print("initializing params (structure-only zeros)...", file=sys.stderr)

    def zeros_of(init_fn):
        shapes = jax.eval_shape(init_fn)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    llm_params = zeros_of(lambda: llm.init(k, text, tlen, psp, plen))
    flow_params = zeros_of(lambda: flow.init(
        k, psp, plen, jnp.zeros((1, 20, 80)), jnp.zeros((1, 192)),
        method=CausalMaskedDiffWithXvec.inference))
    # hift params must not be all-zero (weight-norm divides by ||v||)
    hift_params = jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype),
        jax.eval_shape(lambda: hift.init({"params": k, "noise": k},
                                         jnp.zeros((1, 20, 80)))))
    model = CosyVoice2Model(llm=llm, flow=flow, hift=hift, llm_params=llm_params,
                            flow_params=flow_params, hift_params=hift_params,
                            max_decode_tokens=n_tokens)

    prompt_feat = (rng.standard_normal((100, 80)) * 0.3).astype(np.float32)
    prompt_tok = np.asarray(psp[0])
    emb = rng.standard_normal(192).astype(np.float32)

    def run(seed):
        # force exactly n_tokens: min_len == max_len == n_tokens
        cache_len = ((2 + 25 + 50 + n_tokens + 127) // 128) * 128
        out, count = lm_generate(llm, llm_params, text, tlen, psp, plen,
                                 jnp.asarray([n_tokens]), jnp.asarray([n_tokens]),
                                 jax.random.PRNGKey(seed), max_steps=n_tokens,
                                 cache_len=cache_len)
        tokens = np.asarray(out[0][: int(count[0])])
        session = {"hift": None}
        wav = model.token2wav(tokens, prompt_tok, prompt_feat, emb, 0, session,
                              finalize=True)
        return wav

    print("warmup/compile...", file=sys.stderr)
    wav = run(0)
    assert np.isfinite(wav).all()

    times = []
    for i in range(3):
        t0 = time.time()
        wav = run(i + 1)
        times.append(time.time() - t0)
        print(f"run {i}: {times[-1]:.2f}s for {len(wav)/24000:.1f}s audio",
              file=sys.stderr)
    dt = min(times)
    value = (len(wav) / 24000.0) / dt
    print(json.dumps({"metric": "full text->wav audio-seconds per second, 1 chip",
                      "value": round(value, 2), "unit": "audio_s/s",
                      "vs_baseline": round(value / 50.0, 3)}))


if __name__ == "__main__":
    main()
