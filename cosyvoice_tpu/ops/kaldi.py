"""Kaldi-compatible fbank features (torchaudio.compliance.kaldi.fbank).

Behavioral spec: the reference extracts speaker-verification features with
`kaldi.fbank(num_mel_bins=80, dither=0, sample_frequency=16000)`
(`cosyvoice/cli/frontend.py:93-96`, `cosyvoice/speaker/CAMPPlus.py:304-339`).
Kaldi defaults replicated: 25 ms povey-windowed frames at 10 ms shift,
snip_edges, per-frame DC removal, pre-emphasis 0.97, 512-point FFT power
spectrum, HTK-mel triangular banks (low 20 Hz, high Nyquist), natural log
with floor eps.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@lru_cache(maxsize=None)
def _povey_window(n: int) -> np.ndarray:
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    return (hann ** 0.85).astype(np.float32)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


@lru_cache(maxsize=None)
def _kaldi_mel_banks(num_bins: int, fft_len: int, sr: int,
                     low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """[num_bins, fft_len//2+1] triangular banks on the HTK mel scale."""
    nyq = sr / 2.0
    high = nyq + high_freq if high_freq <= 0 else high_freq
    mel_low, mel_high = _mel(low_freq), _mel(high)
    delta = (mel_high - mel_low) / (num_bins + 1)
    fft_freqs = np.arange(fft_len // 2 + 1) * sr / fft_len
    mel_f = _mel(fft_freqs)
    banks = np.zeros((num_bins, len(fft_freqs)), np.float32)
    for b in range(num_bins):
        left = mel_low + b * delta
        center = left + delta
        right = center + delta
        up = (mel_f - left) / (center - left)
        down = (right - mel_f) / (right - center)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    return banks


def kaldi_fbank(wav: jax.Array, num_mel_bins: int = 80, sr: int = 16000,
                frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                preemphasis: float = 0.97, remove_dc: bool = True,
                eps: float = 1.1921e-7) -> jax.Array:
    """wav [S] (float, kaldi int16 scale or [-1,1] — scale-invariant up to a
    log offset that BN/mean-norm removes) -> [T, num_mel_bins] log-mel."""
    wav = wav * 32768.0  # kaldi operates on int16-scaled signals
    flen = int(sr * frame_length_ms / 1000)
    shift = int(sr * frame_shift_ms / 1000)
    S = wav.shape[-1]
    T = 1 + (S - flen) // shift
    idx = jnp.arange(T)[:, None] * shift + jnp.arange(flen)[None, :]
    frames = wav[idx]
    if remove_dc:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    pre = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
    frames = frames - preemphasis * pre
    frames = frames * jnp.asarray(_povey_window(flen))
    nfft = _next_pow2(flen)
    frames = jnp.pad(frames, ((0, 0), (0, nfft - flen)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2)
    banks = jnp.asarray(_kaldi_mel_banks(num_mel_bins, nfft, sr))
    mel = power @ banks.T
    return jnp.log(jnp.maximum(mel, eps))
