"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.bigvgan import anti_alias_activation


def test_snake_aa_kernel_matches_xla_twin(rng, monkeypatch):
    from jax.experimental import pallas as pl
    import cosyvoice_tpu.ops.pallas.snake_aa as mod

    # run the kernel in interpreter mode on CPU
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **dict(k, interpret=True)))
    B, T, C = 2, 700, 24
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.3)
    want = np.asarray(anti_alias_activation(x, alpha, beta, logscale=True))
    got = np.asarray(mod.snake_aa_pallas(x, alpha, beta, logscale=True))
    # interior matches tightly; edges use x-replicate instead of u-replicate
    np.testing.assert_allclose(got[:, 8:-8], want[:, 8:-8], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_lm_decode_attention_matches_naive(rng):
    """Fused decode-attention kernel (interpret mode): output matches the
    XLA DUS+einsum reference math exactly (modulo output dtype rounding) and
    the cache windows are appended bit-exactly."""
    from cosyvoice_tpu.ops.pallas.lm_decode_attention import lm_decode_attention

    B, T, KH, G, D = 4, 256, 2, 7, 64
    KHD = KH * D
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, G, KHD)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    seq_len = jnp.asarray([40, 17, 76, 3], jnp.int32)
    Tp = 76
    for posv in (76, 135, 255):  # chunk 0 boundary, mid, last row
        pos = jnp.asarray(posv, jnp.int32)
        jrow = jnp.arange(T)[None, :]
        valid = (jrow < seq_len[:, None]) | ((jrow >= Tp) & (jrow <= pos))
        bias_row = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)

        ck2 = jax.lax.dynamic_update_slice(ck, kn, (0, posv, 0))
        cv2 = jax.lax.dynamic_update_slice(cv, vn, (0, posv, 0))
        k4 = ck2.reshape(B, T, KH, D)
        v4 = cv2.reshape(B, T, KH, D)
        q4 = q.reshape(B, G, KH, D)
        s = jnp.einsum("bgkd,btkd->bkgt", q4, k4) * scale
        s = s + bias_row[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        o_ref = jnp.einsum("bkgt,btkd->bgkd", p, v4).reshape(B, G, KHD)

        o, cko, cvo = lm_decode_attention(q, kn, vn, ck, cv, bias_row, pos,
                                          head_dim=D, sm_scale=scale,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(cko), np.asarray(ck2))
        np.testing.assert_array_equal(np.asarray(cvo), np.asarray(cv2))


def test_lm_decode_attention_per_row_pos(rng):
    """Vector pos (continuous-batching engine): every row attends over and
    appends at its OWN frontier; matches per-row scalar-pos kernel calls."""
    from cosyvoice_tpu.ops.pallas.lm_decode_attention import lm_decode_attention

    B, T, KH, G, D = 4, 256, 2, 7, 64
    KHD = KH * D
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal((B, G, KHD)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((B, 1, KHD)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((B, T, KHD)).astype(np.float32))
    pos = jnp.asarray([40, 17, 255, 128], jnp.int32)
    bias_row = jnp.zeros((B, T), jnp.float32)

    o, cko, cvo = lm_decode_attention(q, kn, vn, ck, cv, bias_row, pos,
                                      head_dim=D, sm_scale=scale, interpret=True)
    for b in range(B):
        ob, ckb, cvb = lm_decode_attention(
            q[b:b + 1], kn[b:b + 1], vn[b:b + 1], ck[b:b + 1], cv[b:b + 1],
            bias_row[b:b + 1], pos[b], head_dim=D, sm_scale=scale, interpret=True)
        np.testing.assert_allclose(np.asarray(o[b]), np.asarray(ob[0]),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(cko[b]), np.asarray(ckb[0]))
        np.testing.assert_array_equal(np.asarray(cvo[b]), np.asarray(cvb[0]))


def test_fused_layer_norm_matches_flax(rng):
    """fused_norm kernel (interpret) + XLA twin == nn.LayerNorm (+mish)."""
    import flax.linen as nn

    from cosyvoice_tpu.models.flow import mish
    from cosyvoice_tpu.ops.pallas.fused_norm import (fused_layer_norm,
                                                     layer_norm_xla, supports)

    B, T, C = 2, 24, 256
    assert supports(B * T, C)
    x32 = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32)) * 3.0
    scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))

    ln = nn.LayerNorm(epsilon=1e-5)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x32)
    for f in (layer_norm_xla,
              lambda *a, **k: fused_layer_norm(*a, **k, interpret=True)):
        got = f(x32, scale, bias, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=2e-6)
        got_m = f(x32, scale, bias, 1e-5, act="mish")
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(mish(want)),
                                   atol=2e-6, rtol=2e-6)

    # bf16 in / bf16 params -> bf16 out, matching flax's promotion
    xb, sb, bb = (v.astype(jnp.bfloat16) for v in (x32, scale, bias))
    want_b = ln.apply({"params": {"scale": sb, "bias": bb}}, xb)
    got_b = fused_layer_norm(xb, sb, bb, 1e-5, interpret=True)
    assert got_b.dtype == want_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_b, np.float32),
                               np.asarray(want_b, np.float32), atol=0.06)


def test_estimator_fused_norm_config_matches_baseline(rng):
    """fused_norm=True (XLA twin on CPU) == the nn.LayerNorm estimator."""
    import dataclasses

    from cosyvoice_tpu.models.flow import ConditionalDecoder, EstimatorConfig

    cfg = EstimatorConfig(in_channels=32, out_channels=8, causal=True,
                          channels=(256,), n_blocks=1, num_mid_blocks=1,
                          num_heads=2, attention_head_dim=4)
    B, T = 2, 16
    x = jnp.asarray(rng.standard_normal((B, T, 8)).astype(np.float32))
    mask = jnp.asarray((np.arange(T)[None, :] < np.asarray([16, 11])[:, None])
                       .astype(np.float32))
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    base = ConditionalDecoder(cfg)
    params = base.init(jax.random.PRNGKey(0), x, mask, x, t, x[:, 0], x)
    want = base.apply(params, x, mask, x, t, x[:, 0], x)
    fused = ConditionalDecoder(dataclasses.replace(cfg, fused_norm=True))
    got = fused.apply(params, x, mask, x, t, x[:, 0], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_dit_attention_packed_matches_unpacked(rng):
    """dit_attention_packed (lane-offset views of the packed qkv buffer) ==
    dit_attention on the sliced q/k/v (interpret mode)."""
    from cosyvoice_tpu.ops.pallas.dit_attention import (dit_attention,
                                                        dit_attention_packed,
                                                        supports)

    B, T, H, D = 2, 256, 4, 64
    assert supports(T, H, D)
    HD = H * D
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * HD)).astype(np.float32))
    lens = jnp.asarray([256, 200])
    q = qkv[..., :HD].reshape(B, T, H, D)
    k = qkv[..., HD:2 * HD].reshape(B, T, H, D)
    v = qkv[..., 2 * HD:].reshape(B, T, H, D)
    want = dit_attention(q, k, v, lens, 0.125, interpret=True).reshape(B, T, HD)
    got = dit_attention_packed(qkv, lens, 0.125, head_dim=D, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_dit_block_fused_matches_unfused(rng):
    """The whole-DiT-block fused kernel (ops/pallas/dit_block.py, serving
    fast path) == the unfused DiTBlock with the exact -inf pad mask, per
    valid row, in interpret mode.  Ragged lengths included."""
    from cosyvoice_tpu.models.flow import DiTBlock
    from cosyvoice_tpu.ops.masks import NEG_INF
    from cosyvoice_tpu.ops.pallas.dit_block import dit_block_fused, supports

    B, T, H, D = 3, 256, 2, 64
    DIM = 128
    assert supports(T, H, D, DIM, 4 * DIM)
    x = jnp.asarray(rng.standard_normal((B, T, DIM)) * 0.5, jnp.float32)
    lens = jnp.asarray([200, 256, 100], jnp.int32)
    pm = jnp.asarray(jnp.arange(T)[None, :] < lens[:, None], jnp.float32)

    blk = DiTBlock(DIM, H, D, ff_mult=4, approx_gelu=True)
    params = blk.init(jax.random.PRNGKey(0), x[:1], None, None)
    params = jax.tree.map(
        lambda v: jnp.asarray(rng.standard_normal(v.shape) * 0.1, v.dtype),
        params)
    p = params["params"]
    wqkv = jnp.concatenate([p["to_q"], p["to_k"], p["to_v"]], axis=1)
    attn_bias = jnp.where(pm[:, None, :] > 0, 0.0, NEG_INF)
    want = blk.apply(params, x, attn_bias, None)
    got = dit_block_fused(
        x, lens, p["norm1"]["scale"], p["norm1"]["bias"], wqkv,
        p["to_out"]["kernel"], p["to_out"]["bias"],
        p["norm3"]["scale"], p["norm3"]["bias"],
        p["ff_in"]["kernel"], p["ff_in"]["bias"],
        p["ff_out"]["kernel"], p["ff_out"]["bias"],
        sm_scale=1.0 / np.sqrt(D), heads=H, head_dim=D, interpret=True)
    for b in range(B):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(got[b, :n]),
                                   np.asarray(want[b, :n]), atol=2e-5)


def test_lm_step_fused_matches_flax_decode():
    """Whole-step decode kernel (ops/pallas/lm_step.py): the packed-weight
    step (XLA twin + Pallas interpret) reproduces the flax Qwen2 decode
    forward exactly enough for greedy parity — hidden states match the
    head-major B=1 int8 path to fp tolerance over multiple steps."""
    import dataclasses

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import (KVCache, Qwen2Config,
                                            rope_cos_sin)
    from cosyvoice_tpu.ops.pallas.lm_step import (StepWeights,
                                                  cache_to_step_layout,
                                                  lm_step_fused, lm_step_xla,
                                                  pack_step_weights)
    from cosyvoice_tpu.utils.quant import quantize_qwen_int8

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=3,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64, quant="none")
    cfg = LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=16,
                   qwen=qwen)
    model_fp = Qwen2LM(cfg)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.integers(0, 64, (1, 5)))
    params = model_fp.init(jax.random.PRNGKey(1), t, jnp.asarray([5]),
                           t % 16, jnp.asarray([5]))
    params = quantize_qwen_int8(params)
    qwen_q = dataclasses.replace(qwen, quant="int8")
    model = Qwen2LM(dataclasses.replace(cfg, qwen=qwen_q))

    C = 32
    B_, Tp = 1, 6
    emb0 = jnp.asarray(rng.standard_normal((B_, Tp, 32)).astype(np.float32)) * 0.3
    cache = KVCache.create(qwen_q, B_, C, dtype=jnp.float32)
    from cosyvoice_tpu.models.qwen2 import causal_prefill_bias
    bias = causal_prefill_bias(Tp, C, jnp.asarray([Tp]), B_, jnp.float32)
    pos0 = jnp.broadcast_to(jnp.arange(Tp)[None], (B_, Tp))
    hid, cache = model.apply(params, emb0, pos0, bias, cache,
                             method=Qwen2LM.forward_hidden)

    w = pack_step_weights(params, qwen.num_layers)
    kc, vc = cache_to_step_layout(cache.k, cache.v, C)

    # several decode steps: flax T=1 forward vs the packed step (+ final
    # norm applied by forward_hidden)
    from cosyvoice_tpu.models.qwen2 import rms_norm
    norm_w = params["params"]["llm"]["norm"]
    x = jnp.asarray(rng.standard_normal((B_, 1, 32)).astype(np.float32)) * 0.3
    for step in range(3):
        pos = Tp + step
        key_ok = jnp.arange(C)[None, :] <= pos
        dbias = jnp.where(key_ok[:, None, None, :], 0.0, -1e30
                          ).astype(jnp.float32)
        want, cache = model.apply(params, x, jnp.asarray([[pos]]), dbias,
                                  cache._replace(pos=jnp.asarray(pos)),
                                  method=Qwen2LM.forward_hidden)

        x8 = jnp.pad(x[0], ((0, 7), (0, 0)))
        cos, sin = rope_cos_sin(jnp.asarray([[pos]]), 8, qwen.rope_theta)
        cs, sn = cos[0], sin[0]
        got_y, nk, nv = lm_step_xla(w, x8, kc, vc, jnp.asarray(pos), cs, sn,
                                    nq=4, nkv=2, hd=8)
        got = rms_norm(got_y[0:1], norm_w, qwen.rms_norm_eps)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want[0]),
                                   atol=2e-4, rtol=2e-3,
                                   err_msg=f"step {step} (xla twin)")

        got_y2, nk2, nv2 = lm_step_fused(w, x8, kc, vc, jnp.asarray(pos),
                                         cs, sn, nq=4, nkv=2, hd=8,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(got_y2[0]), np.asarray(got_y[0]),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=f"step {step} (pallas vs twin)")
        np.testing.assert_allclose(np.asarray(nk2), np.asarray(nk), atol=1e-5)

        # the step's new k/v must equal what the flax path appended
        kc = jax.vmap(lambda c, u: jax.lax.dynamic_update_slice(
            c, u[None], (pos, 0)))(kc, nk)
        vc = jax.vmap(lambda c, u: jax.lax.dynamic_update_slice(
            c, u[None], (pos, 0)))(vc, nv)
        kc_want, vc_want = cache_to_step_layout(cache.k, cache.v, C)
        np.testing.assert_allclose(np.asarray(kc), np.asarray(kc_want),
                                   atol=2e-4, rtol=2e-3)
        x = want  # feed the normed hidden as next input (any vector works)
