"""Golden parity: flow estimator / CFM / full flow model vs torch reference."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict  # installs stubs first
from cosyvoice_tpu.models.conformer import ConformerConfig
from cosyvoice_tpu.models.flow import (
    CFMConfig, CausalConditionalCFM, CausalMaskedDiffWithXvec, ConditionalDecoder,
    EstimatorConfig, FlowConfig, import_estimator_torch, import_flow_torch)


def _cfm_params():
    from omegaconf import DictConfig

    return DictConfig({"sigma_min": 1e-6, "solver": "euler", "t_scheduler": "cosine",
                       "training_cfg_rate": 0.2, "inference_cfg_rate": 0.7,
                       "reg_loss_type": "l1"})


def _ref_estimator(cfg: EstimatorConfig):
    from cosyvoice.flow.decoder import ConditionalDecoder as Ref

    torch.manual_seed(0)
    return Ref(in_channels=cfg.in_channels, out_channels=cfg.out_channels,
               causal=cfg.causal, channels=list(cfg.channels), dropout=0.0,
               attention_head_dim=cfg.attention_head_dim, n_blocks=cfg.n_blocks,
               num_mid_blocks=cfg.num_mid_blocks, num_heads=cfg.num_heads,
               act_fn="gelu").eval()


EST_SMALL = EstimatorConfig(in_channels=32, out_channels=8, causal=True,
                            channels=(16,), n_blocks=1, num_mid_blocks=2,
                            num_heads=2, attention_head_dim=4)


def test_estimator_parity(rng):
    ref = _ref_estimator(EST_SMALL)
    B, T, F = 2, 10, 8
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    mu = rng.standard_normal((B, F, T)).astype(np.float32)
    spks = rng.standard_normal((B, F)).astype(np.float32)
    cond = rng.standard_normal((B, F, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    mask[1, :, 7:] = 0.0
    t = np.array([0.3, 0.8], np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(mask),
                      torch.from_numpy(mu), torch.from_numpy(t),
                      torch.from_numpy(spks), torch.from_numpy(cond)).numpy()
    model = ConditionalDecoder(EST_SMALL)
    params = import_estimator_torch(ref_state_dict(ref), EST_SMALL)
    out_j = model.apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                        jnp.asarray(mask[:, 0, :]),
                        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t),
                        jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1), out_ref,
                               atol=2e-4, rtol=1e-3)


EST80 = EstimatorConfig(in_channels=320, out_channels=80, causal=True,
                        channels=(64,), n_blocks=1, num_mid_blocks=1,
                        num_heads=2, attention_head_dim=32)


def test_cfm_euler_parity(rng):
    """10-step Euler CFG sampling parity, torch noise injected into JAX."""
    from cosyvoice.flow.flow_matching import CausalConditionalCFM as RefCFM

    ref_est = _ref_estimator(EST80)
    ref = RefCFM(in_channels=240, cfm_params=_cfm_params(), n_spks=1,
                 spk_emb_dim=80, estimator=ref_est)
    B, T = 1, 20
    mu = rng.standard_normal((B, 80, T)).astype(np.float32)
    spks = rng.standard_normal((B, 80)).astype(np.float32)
    cond = rng.standard_normal((B, 80, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.from_numpy(mu), torch.from_numpy(mask), 10,
                         spks=torch.from_numpy(spks), cond=torch.from_numpy(cond))
    noise = ref.rand_noise[:, :, :T].numpy()

    model = CausalConditionalCFM(CFMConfig(), EST80)
    params = {"params": {"estimator":
              import_estimator_torch(ref_state_dict(ref_est), EST80)["params"]}}
    out_j = model.apply(params, jnp.asarray(mu.transpose(0, 2, 1)),
                        jnp.ones((B, T)), jnp.asarray(spks),
                        jnp.asarray(cond.transpose(0, 2, 1)), n_timesteps=10,
                        noise=jnp.asarray(noise.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                               out_ref.numpy(), atol=5e-4, rtol=1e-3)


def test_full_flow_inference_parity(rng):
    """token -> mel through embed + upsample-encoder + CFM, vs reference."""
    from cosyvoice.flow.flow import CausalMaskedDiffWithXvec as RefFlow
    from cosyvoice.transformer.upsample_encoder import UpsampleConformerEncoder as RefEnc

    enc_cfg = ConformerConfig(dim=512, heads=8, linear_units=64, num_blocks=1,
                              dropout_rate=0.0, attention_dropout_rate=0.0,
                              input_size=512, static_chunk_size=50)
    cfg = FlowConfig(vocab_size=50, encoder=enc_cfg, estimator=EST80)
    torch.manual_seed(0)
    ref_enc = RefEnc(input_size=512, output_size=512, attention_heads=8,
                     linear_units=64, num_blocks=1, dropout_rate=0.0,
                     positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                     input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
                     selfattention_layer_type="rel_selfattn",
                     use_cnn_module=False, macaron_style=False)
    ref_est = _ref_estimator(EST80)
    from cosyvoice.flow.flow_matching import CausalConditionalCFM as RefCFM

    ref_cfm = RefCFM(in_channels=240, cfm_params=_cfm_params(), n_spks=1,
                     spk_emb_dim=80, estimator=ref_est)
    ref = RefFlow(input_size=512, output_size=80, spk_embed_dim=192,
                  vocab_size=50, input_frame_rate=25, token_mel_ratio=2,
                  pre_lookahead_len=3, encoder=ref_enc, decoder=ref_cfm).eval()
    # production always chunk-masks the flow encoder (cli/model.py:314 sets
    # static_chunk_size = 2*fr on load); mirror it so parity covers the
    # deployed attention pattern (our enc_cfg has static_chunk_size=50)
    ref_enc.static_chunk_size = 50

    Tp, Tg = 4, 8
    token = rng.integers(0, 50, (1, Tp + Tg)).astype(np.int64)
    prompt_feat = (rng.standard_normal((1, 2 * Tp, 80)).astype(np.float32) * 0.3)
    emb = rng.standard_normal((1, 192)).astype(np.float32)
    with torch.no_grad():
        mel_ref, _ = ref.inference(
            token=torch.from_numpy(token[:, Tp:]), token_len=torch.tensor([Tg]),
            prompt_token=torch.from_numpy(token[:, :Tp]),
            prompt_token_len=torch.tensor([Tp]),
            prompt_feat=torch.from_numpy(prompt_feat),
            prompt_feat_len=torch.tensor([2 * Tp]),
            embedding=torch.from_numpy(emb))

    model = CausalMaskedDiffWithXvec(cfg)
    params = import_flow_torch(ref_state_dict(ref), cfg)
    noise = ref_cfm.rand_noise[:, :, : 2 * (Tp + Tg)].numpy().transpose(0, 2, 1)
    mel_j = model.apply(params, jnp.asarray(token), jnp.asarray([Tp + Tg]),
                        jnp.asarray(prompt_feat), jnp.asarray(emb),
                        noise=jnp.asarray(noise),
                        method=CausalMaskedDiffWithXvec.inference)
    assert mel_j.shape == (1, 2 * Tg, 80)
    np.testing.assert_allclose(np.asarray(mel_j).transpose(0, 2, 1),
                               mel_ref.numpy(), atol=2e-3, rtol=1e-2)


def test_flow_training_loss_runs(rng):
    """Training loss path: finite, mask-respecting (no torch counterpart RNG)."""
    enc_cfg = ConformerConfig(dim=512, heads=8, linear_units=64, num_blocks=1,
                              dropout_rate=0.0, attention_dropout_rate=0.0,
                              input_size=512)
    cfg = FlowConfig(vocab_size=50, encoder=enc_cfg, estimator=EST80)
    model = CausalMaskedDiffWithXvec(cfg)
    token = jnp.asarray(rng.integers(0, 50, (2, 6)))
    token_len = jnp.asarray([6, 4])
    feat = jnp.asarray(rng.standard_normal((2, 12, 80)).astype(np.float32))
    feat_len = jnp.asarray([12, 8])
    emb = jnp.asarray(rng.standard_normal((2, 192)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), token, token_len, feat, feat_len,
                        emb, jax.random.PRNGKey(1), deterministic=True)
    out = model.apply(params, token, token_len, feat, feat_len, emb,
                      jax.random.PRNGKey(2), deterministic=True)
    assert np.isfinite(float(out["loss"]))


def test_estimator_fused_attention_matches_naive(rng, monkeypatch):
    """Serving fast path (Pallas flash attention) == naive path on full rows.

    Run in interpret mode on CPU.  On rows with padding the fused path masks
    pads exactly while the reference quirk only down-weights them (+1/+0 float
    bias), so only the fully-valid row is compared.
    """
    from jax.experimental import pallas as pl
    import dataclasses

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **dict(k, interpret=True)))
    cfg = dataclasses.replace(EST80, num_heads=2, attention_head_dim=32)
    cfg_fused = dataclasses.replace(cfg, fused_attention=True)
    B, T = 2, 12
    x = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    spks = jnp.asarray(rng.standard_normal((B, 80)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    mask = np.ones((B, T), np.float32)
    mask[1, 9:] = 0.0
    mask = jnp.asarray(mask)
    t = jnp.asarray([0.3, 0.8], np.float32)
    params = ConditionalDecoder(cfg).init(jax.random.PRNGKey(0), x, mask, mu,
                                          t, spks, cond)
    out_naive = ConditionalDecoder(cfg).apply(params, x, mask, mu, t, spks, cond)
    out_fused = ConditionalDecoder(cfg_fused).apply(params, x, mask, mu, t,
                                                    spks, cond)
    np.testing.assert_allclose(np.asarray(out_fused[0]), np.asarray(out_naive[0]),
                               atol=2e-4, rtol=1e-3)
    assert np.isfinite(np.asarray(out_fused)).all()


def test_estimator_bf16_serving_dtype(rng):
    """dtype="bfloat16" (serving) tracks the fp32 estimator closely."""
    import dataclasses

    from cosyvoice_tpu.utils.dtype import to_bf16

    cfg16 = dataclasses.replace(EST80, dtype="bfloat16", approx_gelu=True)
    B, T = 2, 12
    x = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    mask = jnp.ones((B, T), np.float32)
    spks = jnp.asarray(rng.standard_normal((B, 80)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    t = jnp.asarray([0.3, 0.8], np.float32)
    params = ConditionalDecoder(EST80).init(jax.random.PRNGKey(0), x, mask, x,
                                            t, spks, cond)
    out32 = ConditionalDecoder(EST80).apply(params, x, mask, x, t, spks, cond)
    out16 = ConditionalDecoder(cfg16).apply(to_bf16(params), x, mask, x, t,
                                            spks, cond)
    assert out16.dtype == jnp.float32  # output contract stays fp32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.05, rtol=0.1)


def test_estimator_fused_dit_kernel_matches_naive(rng, monkeypatch):
    """Same as above but with head_dim 64 so the dit_attention whole-row
    kernel path (ops/pallas/dit_attention.py) is taken, not stock flash."""
    from jax.experimental import pallas as pl
    import dataclasses

    from cosyvoice_tpu.ops.pallas.dit_attention import supports

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **dict(k, interpret=True)))
    cfg = dataclasses.replace(EST80, num_heads=2, attention_head_dim=64)
    assert supports(128, cfg.num_heads, cfg.attention_head_dim)
    cfg_fused = dataclasses.replace(cfg, fused_attention=True)
    B, T = 2, 12
    x = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    spks = jnp.asarray(rng.standard_normal((B, 80)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, T), np.float32))
    t = jnp.asarray([0.3, 0.8], np.float32)
    params = ConditionalDecoder(cfg).init(jax.random.PRNGKey(0), x, mask, mu,
                                          t, spks, cond)
    out_naive = ConditionalDecoder(cfg).apply(params, x, mask, mu, t, spks, cond)
    out_fused = ConditionalDecoder(cfg_fused).apply(params, x, mask, mu, t,
                                                    spks, cond)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_naive),
                               atol=2e-4, rtol=1e-3)


def test_flow_encoder_bf16_serving_dtype(rng):
    """encoder_dtype="bfloat16" (serving lever: halves the HBM traffic of the
    rel-pos [B, H, T, 2T-1] score tensors) tracks the fp32 flow closely and
    keeps the fp32 mu output contract."""
    import dataclasses

    from cosyvoice_tpu.utils.dtype import to_bf16

    enc_cfg = ConformerConfig(dim=512, heads=8, linear_units=64, num_blocks=1,
                              dropout_rate=0.0, attention_dropout_rate=0.0,
                              input_size=512, static_chunk_size=50)
    cfg = FlowConfig(vocab_size=50, encoder=enc_cfg, estimator=EST80)
    Tp, Tg = 4, 8
    token = jnp.asarray(rng.integers(0, 50, (1, Tp + Tg)))
    tl = jnp.asarray([Tp + Tg])
    prompt_feat = jnp.asarray(rng.standard_normal((1, 2 * Tp, 80)).astype(np.float32) * 0.3)
    emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
    model = CausalMaskedDiffWithXvec(cfg)
    params = model.init(jax.random.PRNGKey(0), token, tl, prompt_feat, emb,
                        method=CausalMaskedDiffWithXvec.inference)
    mel32 = model.apply(params, token, tl, prompt_feat, emb,
                        method=CausalMaskedDiffWithXvec.inference)
    m16 = CausalMaskedDiffWithXvec(
        dataclasses.replace(cfg, encoder_dtype="bfloat16"))
    p16 = dict(params)
    p16["params"] = dict(p16["params"])
    p16["params"]["encoder"] = to_bf16(p16["params"]["encoder"])
    mel16 = m16.apply(p16, token, tl, prompt_feat, emb,
                      method=CausalMaskedDiffWithXvec.inference)
    assert mel16.dtype == jnp.float32
    assert np.isfinite(np.asarray(mel16)).all()
    err = np.abs(np.asarray(mel16) - np.asarray(mel32)).mean()
    ref = np.abs(np.asarray(mel32)).mean() + 1e-6
    assert err / ref < 0.1, (err, ref)


def test_dit_block_requires_prefix_mask():
    """DiTBlock's fused fast path reduces pad_mask to per-row lengths and
    masks keys by j >= len only, so pad_mask MUST be prefix-contiguous.
    Every estimator call site builds it via make_non_pad_mask — assert that
    construction really is prefix-contiguous (guards the fused-path contract
    against a future non-prefix mask source; round-3 advisor finding)."""
    from cosyvoice_tpu.ops.masks import make_non_pad_mask

    m = np.asarray(make_non_pad_mask(jnp.asarray([3, 0, 7, 8]), 8))
    lens = m.sum(axis=1).astype(int)
    for b in range(m.shape[0]):
        assert m[b, :lens[b]].all() and not m[b, lens[b]:].any()
