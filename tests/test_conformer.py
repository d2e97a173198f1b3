"""Golden parity: conformer stack vs torch reference (random weights)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.conformer import (
    ConformerConfig, ConformerEncoder, UpsampleConformerEncoder,
    import_conformer_encoder_torch, import_upsample_encoder_torch,
    espnet_rel_pos_emb, rel_shift)


def test_espnet_pos_emb_matches_reference():
    from cosyvoice.transformer.embedding import EspnetRelPositionalEncoding

    ref = EspnetRelPositionalEncoding(64, dropout_rate=0.0, max_len=50).eval()
    pe_ref = ref.position_encoding(offset=0, size=10).detach().numpy()
    pe_j = np.asarray(espnet_rel_pos_emb(10, 64))
    np.testing.assert_allclose(pe_j, pe_ref, atol=1e-6)


def test_rel_shift_matches_reference(rng):
    from cosyvoice.transformer.attention import RelPositionMultiHeadedAttention

    att = RelPositionMultiHeadedAttention(2, 8, 0.0)
    x = rng.standard_normal((2, 2, 7, 13)).astype(np.float32)
    out_ref = att.rel_shift(torch.from_numpy(x)).numpy()
    out_j = np.asarray(rel_shift(jnp.asarray(x)))
    np.testing.assert_allclose(out_j, out_ref, atol=1e-6)


def _small_cfg():
    return ConformerConfig(dim=512, heads=8, linear_units=64, num_blocks=1,
                           dropout_rate=0.0, attention_dropout_rate=0.0,
                           input_size=512)


def test_upsample_conformer_encoder_parity(rng):
    from cosyvoice.transformer.upsample_encoder import UpsampleConformerEncoder as Ref

    cfg = _small_cfg()
    torch.manual_seed(0)
    ref = Ref(input_size=cfg.input_size, output_size=cfg.dim,
              attention_heads=cfg.heads, linear_units=cfg.linear_units,
              num_blocks=cfg.num_blocks, dropout_rate=0.0,
              positional_dropout_rate=0.0, attention_dropout_rate=0.0,
              input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
              selfattention_layer_type="rel_selfattn",
              use_cnn_module=False, macaron_style=False).eval()

    B, T = 2, 12
    xs = rng.standard_normal((B, T, cfg.input_size)).astype(np.float32)
    lens = np.array([12, 9], np.int32)
    with torch.no_grad():
        out_ref, mask_ref = ref(torch.from_numpy(xs), torch.from_numpy(lens))

    model = UpsampleConformerEncoder(cfg)
    params = import_upsample_encoder_torch(ref_state_dict(ref), cfg)
    out_j, pad_j = model.apply(params, jnp.asarray(xs), jnp.asarray(lens))
    assert out_j.shape == tuple(out_ref.shape)
    # compare valid region only (padding region may differ harmlessly)
    valid = np.asarray(pad_j)
    np.testing.assert_allclose(np.asarray(out_j)[valid], out_ref.numpy()[valid],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_array_equal(valid, mask_ref.squeeze(1).numpy())


def test_conformer_encoder_parity_static_chunk(rng):
    """v1-LLM-style encoder: static_chunk_size=1 (pure causal)."""
    from cosyvoice.transformer.encoder import ConformerEncoder as Ref

    cfg = ConformerConfig(dim=64, heads=4, linear_units=128, num_blocks=2,
                          dropout_rate=0.0, attention_dropout_rate=0.0,
                          input_size=32, static_chunk_size=1)
    torch.manual_seed(0)
    ref = Ref(input_size=cfg.input_size, output_size=cfg.dim,
              attention_heads=cfg.heads, linear_units=cfg.linear_units,
              num_blocks=cfg.num_blocks, dropout_rate=0.0,
              positional_dropout_rate=0.0, attention_dropout_rate=0.0,
              input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
              selfattention_layer_type="rel_selfattn",
              use_cnn_module=False, macaron_style=False,
              static_chunk_size=1).eval()
    B, T = 2, 11
    xs = rng.standard_normal((B, T, cfg.input_size)).astype(np.float32)
    lens = np.array([11, 7], np.int32)
    with torch.no_grad():
        out_ref, _ = ref(torch.from_numpy(xs), torch.from_numpy(lens))
    model = ConformerEncoder(cfg)
    params = import_conformer_encoder_torch(ref_state_dict(ref), cfg)
    out_j, pad_j = model.apply(params, jnp.asarray(xs), jnp.asarray(lens))
    valid = np.asarray(pad_j)
    np.testing.assert_allclose(np.asarray(out_j)[valid], out_ref.numpy()[valid],
                               atol=2e-4, rtol=1e-3)
