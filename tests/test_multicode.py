"""Multi-codebook delay-pattern LM: utils parity + train/decode smoke."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.ops.delay import (focal_loss, get_delay_pattern,
                                     revert_delay_pattern)


def test_delay_pattern_matches_reference(rng):
    from cosyvoice.utils.common import (get_delay_pattern_codec,
                                        revert_delay_pattern_codec)

    codec = rng.integers(0, 50, (2, 9, 4)).astype(np.int64)
    ref = get_delay_pattern_codec(torch.from_numpy(codec), 51, 50).numpy()
    ours = np.asarray(get_delay_pattern(jnp.asarray(codec), 51, 50))
    np.testing.assert_array_equal(ours, ref)
    rev_ref = revert_delay_pattern_codec(torch.from_numpy(ref)).numpy()
    rev_ours = np.asarray(revert_delay_pattern(jnp.asarray(ref)))
    np.testing.assert_array_equal(rev_ours, rev_ref)
    np.testing.assert_array_equal(rev_ours, codec)


def test_focal_loss_matches_reference(rng):
    from cosyvoice.utils.losses import FocalLoss

    logits = rng.standard_normal((2, 7, 10)).astype(np.float32)
    target = rng.integers(0, 10, (2, 7))
    ref = FocalLoss(gamma=1)(torch.from_numpy(logits).permute(0, 2, 1),
                             torch.from_numpy(target)).item()
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(target), gamma=1.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multicode_lm_train_and_decode(rng):
    from cosyvoice_tpu.models.conformer import ConformerConfig
    from cosyvoice_tpu.models.llm import SamplingConfig
    from cosyvoice_tpu.models.llm_multicode import (MultiCodeLMConfig,
                                                    Qwen2LMPhonemeMultiCode,
                                                    multicode_generate)
    from cosyvoice_tpu.models.llm_phoneme import PhonemeEmbedConfig
    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    qwen = Qwen2Config(vocab_size=100, hidden_size=32, num_layers=1, num_heads=4,
                       num_kv_heads=2, head_dim=8, intermediate_size=64)
    cfg = MultiCodeLMConfig(
        llm_input_size=32, llm_output_size=32, speech_token_size=16,
        spk_embed_dim=8, qwen=qwen, codebooknum=3, src_attn_layers=1,
        fusion_heads=4, fusion_ffn=48,
        sampling=SamplingConfig(method="greedy"),
        phoneme=PhonemeEmbedConfig(text_token_size=20, text_token_dim=12,
                                   text_tone_size=16, text_tone_dim=8,
                                   text_lang_size=2, text_lang_dim=2,
                                   text_prsd_size=6, text_prsd_dim=2),
        encoder=ConformerConfig(dim=32, heads=4, linear_units=48, num_blocks=1,
                                dropout_rate=0.0, attention_dropout_rate=0.0,
                                input_size=24))
    model = Qwen2LMPhonemeMultiCode(cfg)
    text = jnp.asarray(rng.integers(0, 100, (2, 5)))
    pho = jnp.asarray(np.stack([
        rng.integers(0, [20, 16, 2, 6], (6, 4)),
        rng.integers(0, [20, 16, 2, 6], (6, 4))]))
    codes = jnp.asarray(rng.integers(0, 16, (2, 7, 3)))
    emb = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), text, jnp.asarray([5, 4]),
                        pho, jnp.asarray([6, 5]), codes, jnp.asarray([7, 6]), emb)
    out = model.apply(params, text, jnp.asarray([5, 4]), pho, jnp.asarray([6, 5]),
                      codes, jnp.asarray([7, 6]), emb)
    assert np.isfinite(float(out["loss"]))

    dcodes, n, done = multicode_generate(
        model, params, text[:1], jnp.asarray([5]), pho[:1], jnp.asarray([6]),
        codes[:1, :4], jnp.asarray([4]), emb[:1], jnp.asarray([12]),
        jax.random.PRNGKey(1), max_steps=12, cache_len=64)
    dcodes = np.asarray(dcodes)
    assert dcodes.shape == (1, 13, 3)
    assert (dcodes[0, 0] == cfg.bos_id).all()
    n = int(n)
    if n >= 3:
        reverted = np.asarray(revert_delay_pattern(jnp.asarray(dcodes[:, 1:n + 1])))
        assert reverted.shape[1] == n - 2


def test_vicreg_matches_reference(rng):
    import torch
    from cosyvoice.llm.llm_with_spk import VICReg
    from cosyvoice_tpu.ops.delay import vicreg_loss

    x = rng.standard_normal((6, 8)).astype(np.float32)
    y = rng.standard_normal((6, 8)).astype(np.float32)
    ref = VICReg()(torch.from_numpy(x), torch.from_numpy(y)).item()
    ours = float(vicreg_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
