"""S3 speech tokenizer: 16 kHz audio -> 25 Hz discrete speech tokens.

The reference treats this as a frozen external model: the ONNX
`speech_tokenizer_v2.onnx` at inference (`cosyvoice/cli/frontend.py:79-89`,
fed whisper 128-bin log-mel) and the `s3tokenizer` package during online-codec
training (`cosyvoice/utils/train_utils.py:434-457`).  This module provides:

  * `whisper_log_mel`: exact whisper.log_mel_spectrogram semantics (n_fft 400,
    hop 160, 128 slaney-normed mels, log10, max-8 floor, (x+4)/4 scaling) —
    the tokenizer's input contract.
  * `FSQ`: finite scalar quantization with 3^8 = 6561 codes (the v2 vocab).
  * `S3TokenizerV2`: whisper-style audio encoder (conv x2 stride-2 front,
    pre-LN transformer with sinusoidal positions) + FSQ head, dims matching
    the released v2_25hz checkpoint family so weights can be imported.
    Numerical parity against the official checkpoint requires the released
    weights (not available in this environment) — the architecture follows
    the public s3tokenizer release.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.mel import mel_filterbank
from cosyvoice_tpu.ops.stft import hann_window, stft


def whisper_log_mel(wav_16k: jax.Array, n_mels: int = 128) -> jax.Array:
    """[S] @16 kHz -> [T, n_mels] whisper-normalized log10-mel (hop 160)."""
    pad = 200  # center=True with n_fft=400
    y = jnp.pad(wav_16k, (pad, pad), mode="reflect")
    re, im = stft(y, 400, 160, hann_window(400), center=False)
    mag2 = (re * re + im * im)[..., :-1]  # whisper drops the last frame
    fb = jnp.asarray(mel_filterbank(16000, 400, n_mels, 0.0, 8000.0))
    mel = jnp.einsum("mf,ft->tm", fb, mag2)
    logspec = jnp.log10(jnp.maximum(mel, 1e-10))
    logspec = jnp.maximum(logspec, logspec.max() - 8.0)
    return (logspec + 4.0) / 4.0


class FSQ(nn.Module):
    """Finite scalar quantization: project -> bound -> round per dim.

    vocab = prod(levels); v2 uses 8 dims x 3 levels = 6561.
    """

    dim: int = 8
    levels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """hidden [B, T, D] -> token ids [B, T]."""
        h = nn.Dense(self.dim, name="project_in")(x)
        half = (self.levels - 1) / 2.0
        bounded = jnp.tanh(h) * half + half          # [0, levels-1]
        digits = jnp.round(bounded).astype(jnp.int32)
        weights = (self.levels ** np.arange(self.dim)).astype(np.int32)
        return jnp.sum(digits * jnp.asarray(weights), axis=-1)


@dataclass(frozen=True)
class S3Config:
    n_mels: int = 128
    dim: int = 1280
    heads: int = 20
    layers: int = 12
    fsq_dim: int = 8
    fsq_levels: int = 3
    stride2: int = 2  # conv2 stride: 100 Hz mel -> 50 Hz; pooling -> 25 Hz


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class S3AttentionBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        D = self.dim // self.heads
        h = nn.LayerNorm(name="attn_ln")(x)
        B, T, _ = x.shape
        q = nn.Dense(self.dim, name="q")(h).reshape(B, T, self.heads, D)
        k = nn.Dense(self.dim, use_bias=False, name="k")(h).reshape(B, T, self.heads, D)
        v = nn.Dense(self.dim, name="v")(h).reshape(B, T, self.heads, D)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(D)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", p, v).reshape(B, T, self.dim)
        x = x + nn.Dense(self.dim, name="out")(o)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(self.dim * 4, name="mlp_1")(h)
        h = jax.nn.gelu(h)
        return x + nn.Dense(self.dim, name="mlp_2")(h)


class S3TokenizerV2(nn.Module):
    cfg: S3Config = field(default_factory=S3Config)

    @nn.compact
    def __call__(self, mel: jax.Array, mel_len: jax.Array) -> tuple[jax.Array, jax.Array]:
        """mel [B, T, n_mels] (whisper-normalized) -> (tokens [B, T//4], len)."""
        cfg = self.cfg
        x = Conv1d(cfg.dim, 3, padding=1, name="conv1")(mel)
        x = jax.nn.gelu(x)
        x = Conv1d(cfg.dim, 3, stride=cfg.stride2, padding=1, name="conv2")(x)
        x = jax.nn.gelu(x)
        T = x.shape[1]
        x = x + jnp.asarray(_sinusoids(T, cfg.dim))
        out_len = mel_len // cfg.stride2
        mask = jnp.arange(T)[None, :] < out_len[:, None]
        for i in range(cfg.layers):
            x = S3AttentionBlock(cfg.dim, cfg.heads, name=f"blocks_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_post")(x)
        # 50 Hz -> 25 Hz: average-pool pairs (v2 25hz variant)
        B = x.shape[0]
        x = x[:, : (T // 2) * 2].reshape(B, T // 2, 2, cfg.dim).mean(axis=2)
        tokens = FSQ(cfg.fsq_dim, cfg.fsq_levels, name="quantizer")(x)
        tok_len = out_len // 2
        valid = jnp.arange(tokens.shape[1])[None, :] < tok_len[:, None]
        return jnp.where(valid, tokens, 0), tok_len


def s3_tokenize(model: S3TokenizerV2, variables, wav_16k: np.ndarray) -> np.ndarray:
    """Frontend contract (cli/frontend.py:79-89): <=30 s, whisper mel -> ids."""
    assert len(wav_16k) / 16000 <= 30
    mel = whisper_log_mel(jnp.asarray(wav_16k))
    toks, n = model.apply(variables, mel[None], jnp.asarray([mel.shape[0]]))
    return np.asarray(toks[0][: int(n[0])])
