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


def test_abs_positional_encodings_match_reference(rng):
    """PositionalEncoding / WhisperPositionalEncoding / NoPositionalEncoding
    tables + forward math vs transformer/embedding.py:26,150,178."""
    from cosyvoice.transformer.embedding import (NoPositionalEncoding,
                                                 PositionalEncoding,
                                                 WhisperPositionalEncoding)

    from cosyvoice_tpu.models.conformer import (no_pos_emb,
                                                sinusoidal_pos_emb,
                                                whisper_pos_emb)

    d, T, off = 32, 17, 5
    ref = PositionalEncoding(d, dropout_rate=0.0).eval()
    with torch.no_grad():
        want = ref.position_encoding(off, T, apply_dropout=False).numpy()
    np.testing.assert_allclose(np.asarray(sinusoidal_pos_emb(T, d, off)),
                               want, atol=1e-5, rtol=1e-5)
    x = rng.standard_normal((2, T, d)).astype(np.float32)
    with torch.no_grad():
        got_ref, _ = ref(torch.from_numpy(x))
    ours = jnp.asarray(x) * np.sqrt(d) + sinusoidal_pos_emb(T, d)
    np.testing.assert_allclose(np.asarray(ours), got_ref.numpy(), atol=1e-5)

    wref = WhisperPositionalEncoding(d, dropout_rate=0.0, max_len=64).eval()
    np.testing.assert_allclose(np.asarray(whisper_pos_emb(64, d)),
                               wref.pe.numpy(), atol=1e-5, rtol=1e-5)

    nref = NoPositionalEncoding(d, dropout_rate=0.0).eval()
    with torch.no_grad():
        _, pe = nref(torch.from_numpy(x))
    np.testing.assert_array_equal(np.asarray(no_pos_emb(T, d)), pe.numpy())


def test_learnable_positional_encoding_offset_slice(rng):
    from cosyvoice_tpu.models.conformer import LearnablePositionalEncoding
    import jax

    m = LearnablePositionalEncoding(max_len=16)
    x = jnp.asarray(rng.standard_normal((1, 4, 8)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y0, emb0 = m.apply(params, x)
    y3, emb3 = m.apply(params, x, offset=3)
    pe = np.asarray(params["params"]["pe"])
    np.testing.assert_allclose(np.asarray(emb0), pe[:, :4], atol=0)
    np.testing.assert_allclose(np.asarray(emb3), pe[:, 3:7], atol=0)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(x) + pe[:, 3:7],
                               atol=1e-6)


def test_moe_ffn_matches_reference(rng):
    """MoEFFNLayer (dense einsum form) vs the reference's top-k gather loop
    (positionwise_feed_forward.py:58-115) with imported weights."""
    import jax
    from cosyvoice.transformer.positionwise_feed_forward import (
        MoEFFNLayer as RefMoE)

    from cosyvoice_tpu.models.conformer import MoEFFNLayer

    E, K, D, H = 4, 2, 16, 24
    torch.manual_seed(0)
    ref = RefMoE(E, K, D, H, dropout_rate=0.0).eval()
    x = rng.standard_normal((2, 5, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    sd = ref_state_dict(ref)
    params = {"params": {
        "gate": {"kernel": jnp.asarray(np.asarray(sd["gate.weight"]).T)},
        "w1": jnp.stack([jnp.asarray(np.asarray(sd[f"experts.{i}.w_1.weight"]).T)
                         for i in range(E)]),
        "b1": jnp.stack([jnp.asarray(sd[f"experts.{i}.w_1.bias"])
                         for i in range(E)]),
        "w2": jnp.stack([jnp.asarray(np.asarray(sd[f"experts.{i}.w_2.weight"]).T)
                         for i in range(E)]),
        "b2": jnp.stack([jnp.asarray(sd[f"experts.{i}.w_2.bias"])
                         for i in range(E)]),
    }}
    got = MoEFFNLayer(E, K, H, D).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_conformer_encoder_with_moe_ffn(rng):
    """ffn_type='moe' wires MoEFFNLayer into the encoder layer stack."""
    import jax

    cfg = ConformerConfig(dim=16, heads=2, linear_units=24, num_blocks=1,
                          dropout_rate=0.0, attention_dropout_rate=0.0,
                          input_size=16, ffn_type="moe", n_expert=3,
                          n_expert_per_token=2)
    enc = ConformerEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
    lens = jnp.asarray([6, 4])
    params = enc.init(jax.random.PRNGKey(0), x, lens)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("gate" in "/".join(str(getattr(k, "key", k)) for k in kp)
               for kp, _ in flat)
    y, mask = enc.apply(params, x, lens)
    assert y.shape == (2, 6, 16) and np.isfinite(np.asarray(y)).all()
