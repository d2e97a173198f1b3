"""Golden parity for the CosyVoice-v1 family: TransformerLM + MaskedDiffWithXvec."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.conformer import ConformerConfig, ConformerEncoder, ConformerKVCache
from cosyvoice_tpu.models.llm import (TransformerLM, TransformerLMConfig,
                                      SamplingConfig, import_transformer_lm_torch,
                                      lm_generate_v1)
from cosyvoice_tpu.models.flow import (CFMConfig, EstimatorConfig, FlowV1Config,
                                       InterpolateRegulator, MaskedDiffWithXvec,
                                       import_flow_v1_torch)


def test_conformer_streaming_decode_matches_full(rng):
    """prefill+decode_step over the static cache == full causal forward."""
    cfg = ConformerConfig(dim=32, heads=4, linear_units=48, num_blocks=2,
                          dropout_rate=0.0, attention_dropout_rate=0.0,
                          input_size=16, static_chunk_size=1)
    model = ConformerEncoder(cfg)
    B, T = 1, 9
    xs = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), xs, jnp.asarray([T]))
    full, _ = model.apply(params, xs, jnp.asarray([T]))

    cache = ConformerKVCache.create(cfg, B, 16)
    outs, cache = model.apply(params, xs[:, :5], cache,
                              method=ConformerEncoder.prefill)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(full[:, :5]),
                               atol=1e-5, rtol=1e-4)
    for t in range(5, T):
        out, cache = model.apply(params, xs[:, t:t + 1], cache,
                                 method=ConformerEncoder.decode_step)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(full[:, t]),
                                   atol=1e-5, rtol=1e-4)


def _v1_cfg():
    te = ConformerConfig(dim=32, heads=4, linear_units=48, num_blocks=1,
                         dropout_rate=0.0, attention_dropout_rate=0.0,
                         input_size=24, static_chunk_size=1)
    llm = ConformerConfig(dim=32, heads=4, linear_units=48, num_blocks=2,
                          dropout_rate=0.0, attention_dropout_rate=0.0,
                          input_size=32, static_chunk_size=1,
                          input_layer="linear_legacy", activation="relu")
    return TransformerLMConfig(
        text_encoder_input_size=24, llm_input_size=32, llm_output_size=32,
        text_token_size=40, speech_token_size=12, spk_embed_dim=6,
        sampling=SamplingConfig(method="greedy"),
        text_encoder=te, llm=llm)


def _ref_v1(cfg: TransformerLMConfig):
    from cosyvoice.llm.llm import TransformerLM as Ref
    from cosyvoice.transformer.encoder import (ConformerEncoder as RefConf,
                                               TransformerEncoder as RefTrans)

    torch.manual_seed(0)
    te = RefConf(input_size=cfg.text_encoder_input_size, output_size=cfg.text_encoder.dim,
                 attention_heads=cfg.text_encoder.heads,
                 linear_units=cfg.text_encoder.linear_units,
                 num_blocks=cfg.text_encoder.num_blocks, dropout_rate=0.0,
                 positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                 input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
                 selfattention_layer_type="rel_selfattn", use_cnn_module=False,
                 macaron_style=False, static_chunk_size=1)
    body = RefTrans(input_size=cfg.llm_input_size, output_size=cfg.llm.dim,
                    attention_heads=cfg.llm.heads, linear_units=cfg.llm.linear_units,
                    num_blocks=cfg.llm.num_blocks, dropout_rate=0.0,
                    positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                    input_layer="linear_legacy", pos_enc_layer_type="rel_pos_espnet",
                    selfattention_layer_type="rel_selfattn", static_chunk_size=1)

    def greedy(ws, decoded, sampling):
        return ws.argmax().unsqueeze(0)

    ref = Ref(text_encoder_input_size=cfg.text_encoder_input_size,
              llm_input_size=cfg.llm_input_size, llm_output_size=cfg.llm_output_size,
              text_token_size=cfg.text_token_size,
              speech_token_size=cfg.speech_token_size, text_encoder=te, llm=body,
              sampling=greedy, spk_embed_dim=cfg.spk_embed_dim).eval()
    ref.fp16 = False
    return ref


def test_v1_lm_greedy_decode_parity(rng):
    rng = np.random.default_rng(12345)  # pinned: greedy parity needs fixed inputs
    cfg = _v1_cfg()
    ref = _ref_v1(cfg)
    text = rng.integers(0, cfg.text_token_size, (1, 5)).astype(np.int64)
    psp = rng.integers(0, cfg.speech_token_size, (1, 4)).astype(np.int64)
    emb = rng.standard_normal((1, cfg.spk_embed_dim)).astype(np.float32)
    with torch.no_grad():
        toks_ref = list(ref.inference(
            text=torch.from_numpy(text[:, 1:]), text_len=torch.tensor([4]),
            prompt_text=torch.from_numpy(text[:, :1]), prompt_text_len=torch.tensor([1]),
            prompt_speech_token=torch.from_numpy(psp),
            prompt_speech_token_len=torch.tensor([4]),
            embedding=torch.from_numpy(emb),
            min_token_text_ratio=0, max_token_text_ratio=4))

    model = TransformerLM(cfg)
    params = import_transformer_lm_torch(ref_state_dict(ref), cfg)
    out, count = lm_generate_v1(model, params, jnp.asarray(text), jnp.asarray([5]),
                                jnp.asarray(psp), jnp.asarray([4]),
                                jnp.asarray(emb), jnp.asarray([0]),
                                jnp.asarray([16]), jax.random.PRNGKey(0),
                                max_steps=16, cache_len=48)
    toks_j = list(np.asarray(out[0][: int(count[0])]))
    assert toks_j == toks_ref, (toks_j, toks_ref)


def test_v1_lm_training_loss(rng):
    cfg = _v1_cfg()
    model = TransformerLM(cfg)
    text = jnp.asarray(rng.integers(0, cfg.text_token_size, (2, 5)))
    speech = jnp.asarray(rng.integers(0, cfg.speech_token_size, (2, 7)))
    emb = jnp.asarray(rng.standard_normal((2, cfg.spk_embed_dim)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([5, 3]),
                        speech, jnp.asarray([7, 6]), emb)
    out = model.apply(params, text, jnp.asarray([5, 3]), speech,
                      jnp.asarray([7, 6]), emb)
    assert np.isfinite(float(out["loss"]))


EST_V1 = EstimatorConfig(in_channels=32, out_channels=8, causal=False,
                         channels=(16, 16), n_blocks=1, num_mid_blocks=1,
                         num_heads=2, attention_head_dim=4)


def test_v1_estimator_multilevel_parity(rng):
    """2-level non-causal estimator (real down/upsampling) vs reference."""
    from cosyvoice.flow.decoder import ConditionalDecoder as Ref
    from cosyvoice_tpu.models.flow import ConditionalDecoder, import_estimator_torch

    torch.manual_seed(0)
    ref = Ref(in_channels=EST_V1.in_channels, out_channels=EST_V1.out_channels,
              causal=False, channels=list(EST_V1.channels), dropout=0.0,
              attention_head_dim=EST_V1.attention_head_dim,
              n_blocks=EST_V1.n_blocks, num_mid_blocks=EST_V1.num_mid_blocks,
              num_heads=EST_V1.num_heads, act_fn="gelu").eval()
    B, T, F = 1, 14, 8
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    mu = rng.standard_normal((B, F, T)).astype(np.float32)
    spks = rng.standard_normal((B, F)).astype(np.float32)
    cond = rng.standard_normal((B, F, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    t = np.array([0.4], np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(mask),
                      torch.from_numpy(mu), torch.from_numpy(t),
                      torch.from_numpy(spks), torch.from_numpy(cond)).numpy()
    model = ConditionalDecoder(EST_V1)
    params = import_estimator_torch(ref_state_dict(ref), EST_V1)
    out_j = model.apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                        jnp.asarray(mask[:, 0]), jnp.asarray(mu.transpose(0, 2, 1)),
                        jnp.asarray(t), jnp.asarray(spks),
                        jnp.asarray(cond.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1), out_ref,
                               atol=3e-4, rtol=1e-3)


def test_v1_flow_inference_parity(rng):
    from cosyvoice.flow.flow import MaskedDiffWithXvec as RefFlow
    from cosyvoice.flow.flow_matching import ConditionalCFM as RefCFM
    from cosyvoice.flow.length_regulator import InterpolateRegulator as RefReg
    from cosyvoice.transformer.encoder import ConformerEncoder as RefConf
    from cosyvoice.flow.decoder import ConditionalDecoder as RefEst
    from tests.test_flow import _cfm_params

    est_cfg = EstimatorConfig(in_channels=320, out_channels=80, causal=False,
                              channels=(64, 64), n_blocks=1, num_mid_blocks=1,
                              num_heads=2, attention_head_dim=32)
    enc_cfg = ConformerConfig(dim=64, heads=4, linear_units=48, num_blocks=1,
                              dropout_rate=0.0, attention_dropout_rate=0.0,
                              input_size=64)
    cfg = FlowV1Config(input_size=64, output_size=80, spk_embed_dim=24,
                       vocab_size=40, input_frame_rate=50, encoder=enc_cfg,
                       estimator=est_cfg, regulator_stages=2)
    torch.manual_seed(0)
    ref_enc = RefConf(input_size=64, output_size=64, attention_heads=4,
                      linear_units=48, num_blocks=1, dropout_rate=0.0,
                      positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                      input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
                      selfattention_layer_type="rel_selfattn",
                      use_cnn_module=False, macaron_style=False)
    ref_est = RefEst(in_channels=320, out_channels=80, causal=False,
                     channels=[64, 64], dropout=0.0, attention_head_dim=32,
                     n_blocks=1, num_mid_blocks=1, num_heads=2, act_fn="gelu")
    ref_cfm = RefCFM(in_channels=240, cfm_params=_cfm_params(), n_spks=1,
                     spk_emb_dim=80, estimator=ref_est)
    ref_reg = RefReg(channels=80, sampling_ratios=[1, 1])
    ref = RefFlow(input_size=64, output_size=80, spk_embed_dim=24,
                  vocab_size=40, input_frame_rate=50, encoder=ref_enc,
                  length_regulator=ref_reg, decoder=ref_cfm).eval()
    ref.fp16 = False

    Tp, Tg = 3, 6
    token = rng.integers(0, 40, (1, Tp + Tg)).astype(np.int64)
    prompt_feat = (rng.standard_normal((1, 5, 80)) * 0.3).astype(np.float32)
    emb = rng.standard_normal((1, 24)).astype(np.float32)
    sr = 22050
    mel_len2 = int(Tg / 50 * sr / 256)
    fixed_z = rng.standard_normal((1, 5 + mel_len2, 80)).astype(np.float32)
    import cosyvoice.flow.flow_matching as rfm
    _orig = torch.randn_like
    torch.randn_like = lambda t: torch.from_numpy(fixed_z.transpose(0, 2, 1)).to(t.dtype)
    with torch.no_grad():
        mel_ref, cache_ref = ref.inference(
            token=torch.from_numpy(token[:, Tp:]), token_len=torch.tensor([Tg]),
            prompt_token=torch.from_numpy(token[:, :Tp]),
            prompt_token_len=torch.tensor([Tp]),
            prompt_feat=torch.from_numpy(prompt_feat),
            prompt_feat_len=torch.tensor([5]),
            embedding=torch.from_numpy(emb),
            flow_cache=torch.zeros(1, 80, 0, 2), sample_rate=sr)
    torch.randn_like = _orig

    model = MaskedDiffWithXvec(cfg)
    params = import_flow_v1_torch(ref_state_dict(ref), cfg)
    mel_j, cache_j = model.apply(params, jnp.asarray(token), jnp.asarray([Tp + Tg]),
                                 jnp.asarray(prompt_feat), jnp.asarray(emb),
                                 prompt_token_len=Tp, mel_len2=mel_len2,
                                 sample_rate=sr, noise=jnp.asarray(fixed_z),
                                 method=MaskedDiffWithXvec.inference)
    np.testing.assert_allclose(np.asarray(mel_j).transpose(0, 2, 1),
                               mel_ref.numpy(), atol=2e-3, rtol=1e-2)
    assert cache_j[0].shape[1] == 5 + min(34, 5 + mel_len2)  # prompt + overlap pin
    np.testing.assert_allclose(np.asarray(cache_j[0]).transpose(0, 2, 1),
                               cache_ref[..., 0].numpy(), atol=1e-5)


def test_v1_phoneme_lm_train_and_decode(rng):
    from cosyvoice_tpu.models.llm_phoneme import PhonemeEmbedConfig
    from cosyvoice_tpu.models.llm_v1_phoneme import (TransformerLMPhoneme,
                                                     V1PhonemeLMConfig,
                                                     v1_phoneme_generate)

    pho_cfg = PhonemeEmbedConfig(text_token_size=20, text_token_dim=12,
                                 text_tone_size=16, text_tone_dim=8,
                                 text_lang_size=2, text_lang_dim=2,
                                 text_prsd_size=6, text_prsd_dim=2)
    for spk_adapt in (False, True):
        te = ConformerConfig(dim=32, heads=4, linear_units=48, num_blocks=1,
                             dropout_rate=0.0, attention_dropout_rate=0.0,
                             input_size=24, static_chunk_size=1,
                             spk_adapt=spk_adapt, spk_emb_size=6)
        lm_body = ConformerConfig(dim=32, heads=4, linear_units=48, num_blocks=1,
                                  dropout_rate=0.0, attention_dropout_rate=0.0,
                                  input_size=32, static_chunk_size=1,
                                  input_layer="linear_legacy", activation="relu")
        cfg = V1PhonemeLMConfig(
            text_encoder_input_size=24, llm_input_size=32, llm_output_size=32,
            text_token_size=40, speech_token_size=12, spk_embed_dim=6,
            sampling=SamplingConfig(method="ras", top_k=4),
            text_encoder=te, llm=lm_body, phoneme=pho_cfg, spk_adapt=spk_adapt)
        model = TransformerLMPhoneme(cfg)
        rngl = np.random.default_rng(3)
        pho = jnp.asarray(np.stack([
            rngl.integers(0, [20, 16, 2, 6], (6, 4)),
            rngl.integers(0, [20, 16, 2, 6], (6, 4))]))
        speech = jnp.asarray(rngl.integers(0, 12, (2, 7)))
        emb = jnp.asarray(rngl.standard_normal((2, 6)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), pho, jnp.asarray([6, 5]),
                            speech, jnp.asarray([7, 6]), emb)
        out = model.apply(params, pho, jnp.asarray([6, 5]), speech,
                          jnp.asarray([7, 6]), emb)
        assert np.isfinite(float(out["loss"])), f"spk_adapt={spk_adapt}"

        toks, cnt = v1_phoneme_generate(
            model, params, pho[:1], jnp.asarray([6]), speech[:1, :4],
            jnp.asarray([4]), emb[:1], jnp.asarray([0]), jnp.asarray([10]),
            jax.random.PRNGKey(1), max_steps=12, cache_len=48)
        assert (np.asarray(toks[0][:int(cnt[0])]) < 12).all()


def test_lm_with_spk_vicreg_cotraining(rng):
    """TransformerLMPhonemeWithSpk (llm_with_spk.py:68-260): CE + VICReg
    between clean and SpecAug'ed speaker passes; grads reach the speaker
    encoder only through the clean pass (aug pass is stop_gradient)."""
    from cosyvoice_tpu.config import build_model
    from cosyvoice_tpu.models.llm_v1_phoneme import TransformerLMPhonemeWithSpk

    te = ConformerConfig(dim=24, heads=2, linear_units=32, num_blocks=1,
                         input_size=24, dropout_rate=0.0,
                         attention_dropout_rate=0.0)
    lm_body = ConformerConfig(dim=32, heads=2, linear_units=32, num_blocks=1,
                              input_size=32, dropout_rate=0.0,
                              attention_dropout_rate=0.0)
    model, cfg = build_model("transformer_lm_phoneme_with_spk", {
        "lm": {"text_encoder_input_size": 24, "llm_input_size": 32,
               "llm_output_size": 32, "text_token_size": 40,
               "speech_token_size": 12, "spk_embed_dim": 8,
               "phoneme": {"text_token_size": 20, "text_token_dim": 8,
                           "text_tone_size": 16, "text_tone_dim": 8,
                           "text_lang_size": 2, "text_lang_dim": 4,
                           "text_prsd_size": 6, "text_prsd_dim": 4}},
        "spk": {"spec_channels": 33, "inter_channels": 16,
                "hidden_channels": 16, "speaker_emb_dim": 8,
                "campplus": {"feat_dim": 80, "embedding_size": 8,
                             "growth_rate": 4, "bn_size": 2,
                             "init_channels": 8,
                             "blocks": [[2, 3, 1], [2, 3, 2]]},
                "style_hidden": 16, "style_heads": 2, "style_layers": 1,
                "gst_tokens": 8, "gst_heads": 2, "gst_layers": 1}})
    # patch the conformer bodies to the tiny ones (dicts above keep defaults)
    from cosyvoice_tpu.models.llm_v1_phoneme import dataclass_replace
    lm_cfg = dataclass_replace(cfg.lm, text_encoder=te, llm=lm_body)
    cfg = dataclass_replace(cfg, lm=lm_cfg)
    model = TransformerLMPhonemeWithSpk(cfg)

    rngl = np.random.default_rng(3)
    B, Tp, Ts = 2, 6, 7
    pho = jnp.asarray(rngl.integers(0, [20, 16, 2, 6], (B, Tp, 4)))
    speech = jnp.asarray(rngl.integers(0, 12, (B, Ts)))
    fbank = jnp.asarray(rngl.standard_normal((B, 20, 80)).astype(np.float32))
    spec = jnp.asarray(
        np.abs(rngl.standard_normal((B, 16, 33))).astype(np.float32))
    spec_len = jnp.asarray([16, 12])
    k = jax.random.PRNGKey(0)
    args = (pho, jnp.asarray([6, 5]), speech, jnp.asarray([7, 6]),
            fbank, spec, spec_len, k)
    variables = model.init({"params": k}, *args)

    out = model.apply(variables, *args, deterministic=False)
    assert np.isfinite(float(out["loss"]))
    assert float(out["vicreg"]) > 0

    def loss_fn(v):
        return model.apply({**variables, **v}, *args,
                           deterministic=False)["loss"]

    g = jax.grad(lambda p: loss_fn({"params": p}))(variables["params"])
    import optax
    spk_g = optax.global_norm(g["speaker_embed"])
    lm_g = optax.global_norm(g["lm"])
    assert float(spk_g) > 0 and float(lm_g) > 0
    # deterministic pass skips the aug branch entirely
    out_det = model.apply(variables, *args, deterministic=True)
    assert "vicreg" not in out_det
