"""Log-mel spectrogram matching the reference's canonical mel exactly.

Behavioral spec: `cosyvoice/dataset/processor_kaldidata.py:28-76`
(mel_spectrogram): librosa Slaney-scale mel filterbank, (n_fft-hop)/2 reflect
pre-pad, torch.stft(center=False), magnitude sqrt(re^2+im^2+1e-9), mel matmul,
log(clamp(x, 1e-5)).  CosyVoice2 config: n_fft 1920, hop 480, win 1920,
80 mels, fmin 0, fmax 8000, sr 24000 (`conf/cosyvoice.yaml:120-128`).

The mel filterbank is reimplemented from the librosa definition (Slaney scale,
slaney area normalization) in numpy — librosa itself is not a dependency.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .stft import hann_window, stft


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-10)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe_f / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """[n_mels, n_fft//2+1] Slaney-normalized triangular filters (librosa.filters.mel)."""
    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "n_mels", "sr", "hop", "win", "fmin", "fmax"))
def log_mel_spectrogram(y: jax.Array, n_fft: int = 1920, n_mels: int = 80,
                        sr: int = 24000, hop: int = 480, win: int = 1920,
                        fmin: float = 0.0, fmax: float = 8000.0) -> jax.Array:
    """waveform [..., S] in [-1,1] -> log-mel [..., n_mels, T]."""
    assert win == n_fft, "reference always uses win_size == n_fft"
    pad = (n_fft - hop) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    re, im = stft(y, n_fft, hop, hann_window(win, y.dtype), center=False)
    mag = jnp.sqrt(re * re + im * im + 1e-9)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,...ft->...mt", basis, mag)
    return jnp.log(jnp.maximum(mel, 1e-5))
