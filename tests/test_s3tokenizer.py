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


def test_s3_frontend_fn_bucket_padding_exact(rng):
    """make_s3_frontend_fn pads the wav to 2 s buckets; the claim in its
    docstring is that padding is EXACT (zeroed pad mel == the conv's own
    zero edge-padding + masked attention).  Compare against the exact-length
    apply for several lengths."""
    from cosyvoice_tpu.models.s3tokenizer import (S3Config, S3TokenizerV2,
                                                  make_s3_frontend_fn,
                                                  s3_tokenize, whisper_log_mel)

    cfg = S3Config(dim=32, heads=2, layers=2, fsq_dim=4)
    model = S3TokenizerV2(cfg)
    wav0 = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mel0 = whisper_log_mel(jnp.asarray(wav0))
    variables = model.init(jax.random.PRNGKey(3), mel0[None],
                           jnp.asarray([mel0.shape[0]]))
    fn = make_s3_frontend_fn(model, variables, bucket_s=2.0)
    for n in (16000, 20000, 31999, 64000):
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        exact = s3_tokenize(model, variables, wav)
        bucketed = fn(wav)
        np.testing.assert_array_equal(bucketed, exact, err_msg=f"n={n}")
