"""Config registry + AOT export + CLI tool wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice_tpu.config import build_model


def test_build_every_model_kind():
    tiny_conf = ConformerConfig_dict = dict(dim=32, heads=4, linear_units=32,
                                            num_blocks=1, input_size=32)
    tiny_qwen = dict(vocab_size=50, hidden_size=32, num_layers=1, num_heads=4,
                     num_kv_heads=2, head_dim=8, intermediate_size=32)
    cases = {
        "qwen2lm": {"llm_input_size": 32, "llm_output_size": 32,
                    "speech_token_size": 16, "qwen": tiny_qwen},
        "flow": {"input_size": 32, "output_size": 8, "vocab_size": 20,
                 "encoder": tiny_conf,
                 "estimator": {"in_channels": 32, "out_channels": 8,
                               "channels": [16], "n_blocks": 1,
                               "num_mid_blocks": 1, "num_heads": 2,
                               "attention_head_dim": 8}},
        "hift": {"in_channels": 8, "base_channels": 16},
        "bigvgan": {"vocab_size": 20, "input_size": 16, "output_size": 16,
                    "upsample_initial_channel": 16},
        "vits": {"n_vocab": 20, "inter_channels": 8, "hidden_channels": 8,
                 "filter_channels": 16, "n_layers": 1},
        "campplus": {"feat_dim": 16, "embedding_size": 8},
        "s3tokenizer": {"dim": 32, "heads": 4, "layers": 1},
        "transformer_lm": {"text_encoder_input_size": 16, "llm_input_size": 32,
                           "llm_output_size": 32, "text_token_size": 30,
                           "speech_token_size": 12,
                           "text_encoder": dict(tiny_conf, input_size=16),
                           "llm": dict(tiny_conf, input_layer="linear_legacy",
                                       activation="relu")},
        "qwen2lm_phoneme_src2": {"llm_input_size": 32, "llm_output_size": 32,
                                 "speech_token_size": 16, "spk_embed_dim": 8,
                                 "qwen": tiny_qwen, "encoder": tiny_conf,
                                 "fusion_heads": 4, "fusion_ffn": 32,
                                 "phoneme": {"text_token_size": 20,
                                             "text_token_dim": 16,
                                             "text_tone_dim": 8,
                                             "text_lang_dim": 4,
                                             "text_prsd_dim": 4}},
    }
    for kind, conf in cases.items():
        model, cfg = build_model(kind, conf)
        assert model is not None, kind


def test_build_unknown_field_errors():
    with pytest.raises(KeyError):
        build_model("hift", {"nonexistent_field": 1})


def test_export_aot_estimator(tmp_path, rng):
    from cosyvoice_tpu.bin.export_aot import export_flow_estimator
    from cosyvoice_tpu.models.conformer import ConformerConfig
    from cosyvoice_tpu.models.flow import (CausalMaskedDiffWithXvec,
                                           EstimatorConfig, FlowConfig, CFMConfig)

    est = EstimatorConfig(in_channels=32, out_channels=8, causal=True,
                          channels=(16,), n_blocks=1, num_mid_blocks=1,
                          num_heads=2, attention_head_dim=8)
    cfg = FlowConfig(input_size=32, output_size=8, vocab_size=20,
                     encoder=ConformerConfig(dim=32, heads=4, linear_units=32,
                                             num_blocks=1, input_size=32),
                     estimator=est, cfm=CFMConfig(noise_frames=100))
    flow = CausalMaskedDiffWithXvec(cfg)
    params = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                       jnp.asarray([4]), jnp.zeros((1, 2, 8)), jnp.zeros((1, 192)),
                       method=CausalMaskedDiffWithXvec.inference)
    export_flow_estimator(flow, params, str(tmp_path), lengths=(16,))
    assert (tmp_path / "estimator_T16.stablehlo").exists()
