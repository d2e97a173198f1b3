"""F0 (pitch) extraction for GAN training targets.

The reference extracts pitch with torchaudio's kaldi pitch tracker
(`examples/.../cosyvoice_hift_tts.yaml:200`, compute_kaldi_pitch) and
interpolates it to mel length (`dataset/processor.py:182-200`).  Here:
a jit-able normalized-autocorrelation (YIN-style) tracker — deterministic,
host-free, adequate as the L1 f0 target (`hifigan/hifigan.py:73`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("sr", "frame", "hop", "fmin", "fmax"))
def autocorr_f0(wav: jax.Array, sr: int = 24000, frame: int = 1024,
                hop: int = 480, fmin: float = 60.0, fmax: float = 400.0) -> jax.Array:
    """[S] -> [T] f0 in Hz (0 for unvoiced)."""
    S = wav.shape[-1]
    T = max((S - frame) // hop + 1, 1)
    idx = jnp.arange(T)[:, None] * hop + jnp.arange(frame)[None, :]
    frames = wav[idx]
    frames = frames - frames.mean(axis=-1, keepdims=True)
    lag_min = int(sr / fmax)
    lag_max = min(int(sr / fmin), frame - 1)
    # normalized autocorrelation over candidate lags
    energy = jnp.sum(frames * frames, axis=-1, keepdims=True) + 1e-9
    lags = np.arange(lag_min, lag_max)
    corrs = []
    for lag in lags:  # static unroll; frame/lag counts are small
        a = frames[:, : frame - lag]
        b = frames[:, lag:]
        corrs.append(jnp.sum(a * b, axis=-1) /
                     (jnp.sqrt(jnp.sum(a * a, -1) * jnp.sum(b * b, -1)) + 1e-9))
    corr = jnp.stack(corrs, axis=-1)  # [T, n_lags]
    best = jnp.argmax(corr, axis=-1)
    peak = jnp.max(corr, axis=-1)
    f0 = sr / (lag_min + best).astype(jnp.float32)
    voiced = (peak > 0.5) & (energy[:, 0] / frame > 1e-6)
    return jnp.where(voiced, f0, 0.0)


def interp_to_len(x: jax.Array, new_len: int) -> jax.Array:
    """Linear interp [T] -> [new_len] (processor.py:198)."""
    T = x.shape[0]
    pos = (jnp.arange(new_len) + 0.5) * T / new_len - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)
    return x[lo] * (1 - w) + x[hi] * w
