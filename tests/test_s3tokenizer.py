"""S3 tokenizer: whisper-mel contract + FSQ/encoder behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.s3tokenizer import (FSQ, S3Config, S3TokenizerV2,
                                              s3_tokenize, whisper_log_mel)


def test_whisper_log_mel_contract(rng):
    wav = (np.sin(np.arange(16000) * 2 * np.pi * 440 / 16000) * 0.5).astype(np.float32)
    mel = np.asarray(whisper_log_mel(jnp.asarray(wav)))
    assert mel.shape == (100, 128)  # 1 s -> 100 frames at hop 160
    assert np.isfinite(mel).all()
    # whisper normalization bounds: (x+4)/4 with 8-dB dynamic range clamp
    assert mel.max() <= 2.5 and mel.min() >= mel.max() - 2.0 - 1e-6


def test_fsq_vocab_range(rng):
    fsq = FSQ(dim=8, levels=3)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32) * 3)
    params = fsq.init(jax.random.PRNGKey(0), x)
    toks = np.asarray(fsq.apply(params, x))
    assert toks.min() >= 0 and toks.max() < 3 ** 8  # 6561 vocab


def test_s3_tokenizer_pipeline(rng):
    cfg = S3Config(dim=64, heads=4, layers=2)
    model = S3TokenizerV2(cfg)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mel = whisper_log_mel(jnp.asarray(wav))
    variables = model.init(jax.random.PRNGKey(0), mel[None],
                           jnp.asarray([mel.shape[0]]))
    toks = s3_tokenize(model, variables, wav)
    assert toks.shape[0] == 25  # 1 s -> 25 tokens (25 Hz)
    assert (toks >= 0).all() and (toks < 6561).all()
