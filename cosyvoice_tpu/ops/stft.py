"""STFT / iSTFT with torch-exact semantics, expressed as matmuls for the MXU.

Behavioral spec:
  * `torch.stft(center=True|False, onesided=True, normalized=False)` as used by
    the reference HiFT vocoder (`cosyvoice/hifigan/generator.py:333-347`,
    n_fft 16 / hop 4 / hann, center default=True) and the canonical mel
    extractor (`cosyvoice/dataset/processor_kaldidata.py:37-76`, center=False
    with explicit (n_fft-hop)/2 reflect pre-pad).
  * `torch.istft(center=True)`: per-frame irFFT, window, overlap-add, divide by
    the overlapped window-square envelope, crop n_fft//2 from both ends.

TPU-first choices: the DFT is a dense [n_fft, n_freq] matmul (n_fft here is 16
or 1920 — both tiny next to MXU throughput, and matmul avoids XLA's FFT op on
the hot vocoder path); framing is a strided reshape when hop | n_fft, never a
gather; overlap-add is r = n_fft//hop shifted adds, unrolled statically.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann, == torch.hann_window(N) == scipy get_window('hann', N, fftbins=True)."""
    n = np.arange(win_length)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length), dtype)


@lru_cache(maxsize=None)
def _dft_mats(n_fft: int):
    """Forward rDFT matrices C, S with re = x@C, im = x@S (numpy, cached)."""
    n = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * f / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=None)
def _idft_mats(n_fft: int):
    """Inverse rDFT: x = re@Ci + im@Si, shapes [n_freq, n_fft] (numpy, cached)."""
    n_freq = n_fft // 2 + 1
    f = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    # onesided -> full spectrum weights: bins 1..n_fft/2-1 count twice
    w = np.full((n_freq, 1), 2.0, dtype=np.float64)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    ci = (w * np.cos(ang) / n_fft).astype(np.float32)
    si = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return ci, si


def frame_signal(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[..., S] -> [..., T, n_fft] frames x[.., t*hop : t*hop+n_fft].

    When hop | n_fft, frames come from a [..., S//hop, hop] reshape plus
    static slices (no gather, layout-friendly); otherwise a gather fallback.
    """
    S = x.shape[-1]
    T = (S - n_fft) // hop + 1
    if n_fft % hop == 0:
        r = n_fft // hop
        n_chunks = S // hop
        xc = x[..., : n_chunks * hop].reshape(*x.shape[:-1], n_chunks, hop)
        parts = [xc[..., j : j + T, :] for j in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.arange(T)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[..., T, n_fft] -> [..., (T-1)*hop + n_fft] by summing shifted frames."""
    *lead, T, n_fft = frames.shape
    assert n_fft % hop == 0
    r = n_fft // hop
    chunks = frames.reshape(*lead, T, r, hop)
    out_chunks = T + r - 1
    out = jnp.zeros((*lead, out_chunks, hop), frames.dtype)
    for j in range(r):
        out = out.at[..., j : j + T, :].add(chunks[..., :, j, :])
    return out.reshape(*lead, out_chunks * hop)


def stft(x: jax.Array, n_fft: int, hop: int, window: jax.Array,
         center: bool = True, pad_mode: str = "reflect"):
    """torch.stft-compatible. x [..., S] -> (re, im) each [..., n_freq, T]."""
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop) * window
    C, S = _dft_mats(n_fft)
    re = frames @ jnp.asarray(C)
    im = frames @ jnp.asarray(S)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def istft(re: jax.Array, im: jax.Array, n_fft: int, hop: int,
          window: jax.Array, center: bool = True) -> jax.Array:
    """torch.istft-compatible. (re, im) [..., n_freq, T] -> [..., (T-1)*hop]."""
    Ci, Si = _idft_mats(n_fft)
    reT = jnp.swapaxes(re, -1, -2)
    imT = jnp.swapaxes(im, -1, -2)
    frames = (reT @ jnp.asarray(Ci) + imT @ jnp.asarray(Si)) * window
    y = overlap_add(frames, hop)
    T = reT.shape[-2]
    win_sq = jnp.broadcast_to(window * window, (T, n_fft))
    env = overlap_add(win_sq, hop)
    y = y / jnp.maximum(env, 1e-11)
    if center:
        y = y[..., n_fft // 2 : -(n_fft // 2)]
    return y
