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
    valid = np.asarray(pad_j)
    np.testing.assert_array_equal(valid, mask_ref.squeeze(1).numpy())
    # full-length row: exact parity.  The SHORT row intentionally diverges:
    # the reference's right-looking pre-lookahead conv reads whatever sits in
    # the pad region (embed-LayerNorm bias / garbage) into the row's last
    # pre_lookahead tokens — an upstream artifact that would make bucketed
    # inference disagree with the reference's exact-length runs.  We zero pad
    # embeds instead (conformer.py), which equals the reference at exact
    # length — the deployed configuration (flow.inference is B=1 exact-len).
    np.testing.assert_allclose(np.asarray(out_j)[0], out_ref.numpy()[0],
                               atol=2e-4, rtol=1e-3)


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


@pytest.mark.parametrize("which,rate", [("conv1d2", 2), ("conv2d", 4),
                                        ("conv2d6", 6), ("conv2d8", 8)])
def test_conv_subsampling_matches_reference(rng, which, rate):
    """Conv1dSubsampling2 / Conv2dSubsampling4/6/8 (subsampling.py:116-335)
    forward + mask parity with imported weights."""
    import jax
    from cosyvoice.utils.class_utils import COSYVOICE_SUBSAMPLE_CLASSES

    from cosyvoice_tpu.models.conformer import (
        Conv1dSubsampling2, Conv2dSubsampling4, Conv2dSubsampling6,
        Conv2dSubsampling8, import_conv2d_subsampling_torch)

    idim, odim, T = 40, 24, 37
    torch.manual_seed(0)
    ref = COSYVOICE_SUBSAMPLE_CLASSES[which](
        idim, odim, 0.0, torch.nn.Identity()).eval()
    # Identity pos_enc returns x only; emulate wenet contract manually
    x = rng.standard_normal((2, T, idim)).astype(np.float32)
    mask = np.ones((2, 1, T), bool)
    mask[1, :, 30:] = False
    with torch.no_grad():
        xt = torch.from_numpy(x)
        mt = torch.from_numpy(mask)
        if which == "conv1d2":
            h = xt.transpose(1, 2)
            h = ref.conv(h).transpose(1, 2)
            want, want_mask = h.numpy(), mt[:, :, (T + 1) % 2::2].numpy()
        else:
            h = ref.conv(xt.unsqueeze(1))
            b, c, t2, f = h.size()
            lin = ref.out if hasattr(ref, "out") else ref.linear
            want = lin(h.transpose(1, 2).contiguous().view(b, t2, c * f)).numpy()
            sl = {"conv2d": [slice(2, None, 2)] * 2,
                  "conv2d6": [slice(2, None, 2), slice(4, None, 3)],
                  "conv2d8": [slice(2, None, 2)] * 3}[which]
            wm = mt
            for s in sl:
                wm = wm[:, :, s]
            want_mask = wm.numpy()

    sd = ref_state_dict(ref)
    if which == "conv1d2":
        model = Conv1dSubsampling2(odim)
        params = {"params": {
            f"conv{i}": {"kernel": jnp.asarray(
                np.asarray(sd[f"conv.{2 * i}.weight"]).transpose(2, 1, 0)),
                "bias": jnp.asarray(sd[f"conv.{2 * i}.bias"])}
            for i in range(2)}}
    else:
        model = {"conv2d": Conv2dSubsampling4, "conv2d6": Conv2dSubsampling6,
                 "conv2d8": Conv2dSubsampling8}[which](odim)
        params = import_conv2d_subsampling_torch(sd, len(model.convs))
    got, got_mask = model.apply(params, jnp.asarray(x), jnp.asarray(mask))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask)


def test_transformer_decoder_matches_reference(rng):
    """TransformerDecoder (decoder.py:33-255): full forward parity with
    imported weights, ragged target/memory lengths."""
    import jax
    from cosyvoice.transformer.decoder import TransformerDecoder as RefDec

    from cosyvoice_tpu.models.decoder import (
        TransformerDecoder, import_transformer_decoder_torch)

    V, D, H, L, U = 30, 16, 2, 2, 24
    torch.manual_seed(0)
    ref = RefDec(vocab_size=V, encoder_output_size=D, attention_heads=H,
                 linear_units=U, num_blocks=L, dropout_rate=0.0,
                 positional_dropout_rate=0.0).eval()
    B, Tm, To = 2, 7, 5
    memory = rng.standard_normal((B, Tm, D)).astype(np.float32)
    mlens = np.asarray([7, 4])
    ys = rng.integers(0, V, (B, To)).astype(np.int64)
    ylens = np.asarray([5, 3])
    mem_mask = (np.arange(Tm)[None] < mlens[:, None])[:, None, :]
    with torch.no_grad():
        want, _, olens = ref(torch.from_numpy(memory),
                             torch.from_numpy(mem_mask),
                             torch.from_numpy(ys),
                             torch.from_numpy(ylens))
    model = TransformerDecoder(V, D, H, U, L)
    params = import_transformer_decoder_torch(ref_state_dict(ref), L)
    got = model.apply(params, jnp.asarray(memory), jnp.asarray(mlens),
                      jnp.asarray(ys), jnp.asarray(ylens))
    # valid rows only (pad rows differ by design: reference masks via loss)
    w = want.numpy()
    g = np.asarray(got)
    for b, n in enumerate(ylens):
        np.testing.assert_allclose(g[b, :n], w[b, :n], atol=3e-5, rtol=1e-4,
                                   err_msg=f"row {b}")


def test_bi_transformer_decoder_runs(rng):
    import jax

    from cosyvoice_tpu.models.decoder import BiTransformerDecoder

    model = BiTransformerDecoder(20, 16, 2, 24, num_blocks=1, r_num_blocks=1)
    memory = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
    ys = jnp.asarray(rng.integers(0, 20, (1, 4)))
    params = model.init(jax.random.PRNGKey(0), memory, jnp.asarray([6]),
                        ys, jnp.asarray([4]), ys, 0.3)
    lx, rx = model.apply(params, memory, jnp.asarray([6]), ys,
                         jnp.asarray([4]), ys[:, ::-1], 0.3)
    assert lx.shape == (1, 4, 20) and rx.shape == (1, 4, 20)
    assert np.isfinite(np.asarray(lx)).all() and np.isfinite(np.asarray(rx)).all()
