"""Golden parity: phoneme LLM variants vs torch reference."""
import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.conformer import ConformerConfig
from cosyvoice_tpu.models.llm import SamplingConfig
from cosyvoice_tpu.models.llm_phoneme import (PhonemeEmbedConfig, PhonemeLMConfig,
                                              Qwen2LMPhoneme, Qwen2LMPhonemeSrc2,
                                              import_phoneme_lm_torch,
                                              phoneme_lm_generate)
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.tokenizer.phoneme import PhonemeTokenizer

TINY_Q = Qwen2Config(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, head_dim=8, intermediate_size=64,
                     rope_theta=10000.0)
PHO = PhonemeEmbedConfig(text_token_size=30, text_token_dim=12,
                         text_tone_size=16, text_tone_dim=8,
                         text_lang_size=2, text_lang_dim=2,
                         text_prsd_size=6, text_prsd_dim=2,
                         use_frontend_prsd=True)
ENC = ConformerConfig(dim=40, heads=4, linear_units=48, num_blocks=1,
                      dropout_rate=0.0, attention_dropout_rate=0.0,
                      input_size=24)
CFG = PhonemeLMConfig(llm_input_size=32, llm_output_size=32,
                      speech_token_size=20, spk_embed_dim=10,
                      sampling=SamplingConfig(method="greedy"),
                      phoneme=PHO, encoder=ENC, qwen=TINY_Q,
                      fusion_heads=4, fusion_ffn=48)


def _ref_src2(tmp_path):
    from cosyvoice.llm.llm import Qwen2Encoder, Qwen2LM_Phoneme_Src2 as Ref
    from cosyvoice.transformer.encoder import ConformerEncoder as RefConf

    hf_cfg = dict(vocab_size=TINY_Q.vocab_size, hidden_size=TINY_Q.hidden_size,
                  num_hidden_layers=TINY_Q.num_layers,
                  num_attention_heads=TINY_Q.num_heads,
                  num_key_value_heads=TINY_Q.num_kv_heads,
                  intermediate_size=TINY_Q.intermediate_size,
                  max_position_embeddings=512, rope_theta=TINY_Q.rope_theta,
                  tie_word_embeddings=True, attn_implementation="eager")
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))
    torch.manual_seed(0)
    enc = Qwen2Encoder(str(tmp_path))
    te = RefConf(input_size=24, output_size=ENC.dim, attention_heads=ENC.heads,
                 linear_units=ENC.linear_units, num_blocks=ENC.num_blocks,
                 dropout_rate=0.0, positional_dropout_rate=0.0,
                 attention_dropout_rate=0.0, input_layer="linear",
                 pos_enc_layer_type="rel_pos_espnet",
                 selfattention_layer_type="rel_selfattn", use_cnn_module=False,
                 macaron_style=False)

    def greedy(ws, decoded, sampling):
        return ws.argmax().unsqueeze(0)

    ref = Ref(text_encoder_input_size=24, llm_input_size=32, llm_output_size=32,
              text_token_size=PHO.text_token_size, text_token_dim=PHO.text_token_dim,
              text_tone_size=PHO.text_tone_size, text_tone_dim=PHO.text_tone_dim,
              text_lang_size=PHO.text_lang_size, text_lang_dim=PHO.text_lang_dim,
              text_prsd_size=PHO.text_prsd_size, text_prsd_dim=PHO.text_prsd_dim,
              speech_token_size=CFG.speech_token_size, text_encoder=te, llm=enc,
              sampling=greedy, spk_embed_dim=CFG.spk_embed_dim,
              use_frontend_prsd=True).eval()
    # shrink the hardcoded 16-head/4096-ffn fusion to the tiny dims
    import cosyvoice.llm.llm as rl
    from cosyvoice.transformer.attention import MultiHeadedAttention as RefMHA
    from cosyvoice.transformer.decoder_layer import DecoderLayer as RefDL
    from cosyvoice.transformer.positionwise_feed_forward import \
        PositionwiseFeedForward as RefFF

    torch.manual_seed(1)
    ref.src_attention = torch.nn.ModuleList([
        RefDL(32, RefMHA(4, 32, 0.0, key_bias=True),
              RefMHA(4, 32, 0.0, key_bias=True),
              RefFF(32, 48, 0.0), dropout_rate=0.0, normalize_before=True)])
    return ref.eval()


def _pho_tokens(rng, n):
    pho = np.stack([rng.integers(0, PHO.text_token_size, n),
                    rng.integers(0, PHO.text_tone_size, n),
                    rng.integers(0, PHO.text_lang_size, n),
                    rng.integers(0, PHO.text_prsd_size, n)], axis=-1)
    return pho.astype(np.int64)


def test_src2_greedy_decode_parity(rng, tmp_path):
    rng = np.random.default_rng(12345)  # pinned: greedy parity needs fixed inputs
    ref = _ref_src2(tmp_path)
    text = rng.integers(0, TINY_Q.vocab_size, (1, 6)).astype(np.int64)
    pho = _pho_tokens(rng, 7)[None]
    psp = rng.integers(0, CFG.speech_token_size, (1, 4)).astype(np.int64)
    emb = rng.standard_normal((1, CFG.spk_embed_dim)).astype(np.float32)
    with torch.no_grad():
        toks_ref = list(ref.inference(
            text=(torch.from_numpy(text[:, 2:]), torch.from_numpy(pho[:, 3:])),
            text_len=(torch.tensor([4]), torch.tensor([4])),
            prompt_text=(torch.from_numpy(text[:, :2]), torch.from_numpy(pho[:, :3])),
            prompt_text_len=(torch.tensor([2]), torch.tensor([3])),
            prompt_speech_token=torch.from_numpy(psp),
            prompt_speech_token_len=torch.tensor([4]),
            embedding=torch.from_numpy(emb),
            min_token_text_ratio=0, max_token_text_ratio=4))

    model = Qwen2LMPhonemeSrc2(CFG)
    params = import_phoneme_lm_torch(ref_state_dict(ref), CFG, variant="src2")
    out, count = phoneme_lm_generate(
        model, params, jnp.asarray(text), jnp.asarray([6]), jnp.asarray(pho),
        jnp.asarray([7]), jnp.asarray(psp), jnp.asarray([4]), jnp.asarray(emb),
        jnp.asarray([0]), jnp.asarray([16]), jax.random.PRNGKey(0),
        max_steps=16, cache_len=64)
    toks_j = list(np.asarray(out[0][: int(count[0])]))
    assert toks_j == toks_ref, (toks_j, toks_ref)


def test_phoneme_lm_training_losses(rng):
    for cls in (Qwen2LMPhoneme, Qwen2LMPhonemeSrc2):
        model = cls(CFG)
        text = jnp.asarray(rng.integers(0, TINY_Q.vocab_size, (2, 6)))
        pho = jnp.asarray(np.stack([_pho_tokens(rng, 7), _pho_tokens(rng, 7)]))
        speech = jnp.asarray(rng.integers(0, CFG.speech_token_size, (2, 8)))
        emb = jnp.asarray(rng.standard_normal((2, CFG.spk_embed_dim)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([6, 4]),
                            pho, jnp.asarray([7, 5]), speech, jnp.asarray([8, 6]),
                            emb)
        out = model.apply(params, text, jnp.asarray([6, 4]), pho,
                          jnp.asarray([7, 5]), speech, jnp.asarray([8, 6]), emb)
        assert np.isfinite(float(out["loss"])), cls.__name__


def test_phoneme_tokenizer_matches_reference(tmp_path):
    from cosyvoice.tokenizer.phoneme_tokenizer import PhonemeTokenizer as Ref

    dict_path = "/root/reference/cosyvoice/tokenizer/assets/hnttsa_phoneme2id.json"
    ref = Ref(dict_path, mode="train", use_pause_label=True)
    ours = PhonemeTokenizer(dict_path, use_pause_label=True)
    phonemes = ["B", "AA4", "#1", "CH", "IY14", "<p>", "#3", "AY1", "T", "#4", "."]
    assert ours.encode(phonemes) == tuple(ref.encode(phonemes)) or \
           list(ours.encode(phonemes)) == list(ref.encode(phonemes))
