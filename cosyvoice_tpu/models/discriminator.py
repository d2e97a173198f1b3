"""GAN discriminators for vocoder training.

Behavioral spec: reference `cosyvoice/hifigan/discriminator.py` —
DiscriminatorP (:253-289, period-folded 2-D convs), MultiPeriodDiscriminator
(:291-318, periods 2/3/5/7/11), DiscriminatorR (:444-512, banded STFT 2-D
convs, descript-audio-codec lineage), MultiResolutionDiscriminator
(:404-442, ffts 2048/1024/512), MultipleDiscriminator (:381-402 combo), and
the loss fns (:24-57 feature/discriminator/generator loss).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv2d
from cosyvoice_tpu.ops.stft import hann_window, stft

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, list[jax.Array]]:
        """x [B, T] -> (score [B, N], feature maps)."""
        B, T = x.shape
        p = self.period
        if T % p != 0:
            pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            T = T + pad
        h = x.reshape(B, T // p, p, 1)  # NHWC: H=time/p, W=period
        fmap = []
        chans = (32, 128, 512, 1024)
        for i, ch in enumerate(chans):
            h = Conv2d(ch, (self.kernel_size, 1), (self.stride, 1), (2, 0),
                       weight_norm=True, name=f"convs_{i}")(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = Conv2d(1024, (self.kernel_size, 1), (1, 1), (2, 0),
                   weight_norm=True, name="convs_4")(h)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = Conv2d(1, (3, 1), (1, 1), (1, 0), weight_norm=True,
                   name="conv_post")(h)
        fmap.append(h)
        return h.reshape(B, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, name=f"discriminators_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorR(nn.Module):
    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    bands: Sequence[tuple[float, float]] = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5),
                                            (0.5, 0.75), (0.75, 1.0))

    def _spectrogram(self, x: jax.Array) -> list[jax.Array]:
        x = x - x.mean(axis=-1, keepdims=True)
        x = 0.8 * x / (jnp.abs(x).max(axis=-1, keepdims=True) + 1e-9)
        n_fft = self.window_length
        hop = int(n_fft * self.hop_factor)
        re, im = stft(x, n_fft, hop, hann_window(n_fft, x.dtype), center=True)
        spec = jnp.stack([re, im], axis=1)             # [B, 2, F, T]
        spec = jnp.transpose(spec, (0, 3, 2, 1))       # [B, T, F, 2] (NHWC)
        nf = n_fft // 2 + 1
        return [spec[:, :, int(b0 * nf): int(b1 * nf), :] for b0, b1 in self.bands]

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, list[jax.Array]]:
        bands = self._spectrogram(x)
        fmap, outs = [], []
        for bi, band in enumerate(bands):
            h = band
            specs = [((3, 9), (1, 1), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                     ((3, 9), (1, 2), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                     ((3, 3), (1, 1), (1, 1))]
            for i, (k, s, p) in enumerate(specs):
                h = Conv2d(self.channels, k, s, p, weight_norm=True,
                           name=f"band_convs_{bi}_{i}")(h)
                h = jax.nn.leaky_relu(h, 0.1)
                if i > 0:
                    fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)  # cat on freq axis
        h = Conv2d(1, (3, 3), (1, 1), (1, 1), weight_norm=True,
                   name="conv_post")(h)
        fmap.append(h)
        return h, fmap


class MultiResolutionDiscriminator(nn.Module):
    fft_sizes: Sequence[int] = (2048, 1024, 512)

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, w in enumerate(self.fft_sizes):
            d = DiscriminatorR(w, name=f"discriminators_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultipleDiscriminator(nn.Module):
    """MPD + MRD combo used by the hift recipe (discriminator.py:381-402)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        r1 = MultiPeriodDiscriminator(self.periods, name="mpd")(y, y_hat)
        r2 = MultiResolutionDiscriminator(self.fft_sizes, name="mrd")(y, y_hat)
        # mrd scores are [B, T, F, 1]; flatten like the reference combo does
        flat = lambda t: t.reshape(t.shape[0], -1)
        return (r1[0] + [flat(t) for t in r2[0]],
                r1[1] + [flat(t) for t in r2[1]],
                r1[2] + r2[2], r1[3] + r2[3])


# ---- losses (discriminator.py:24-57, utils/losses.py) --------------------

def feature_loss(fmap_r, fmap_g) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(reals, gens) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(reals, gens):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_loss(gens) -> jax.Array:
    loss = 0.0
    for dg in gens:
        loss += jnp.mean((1.0 - dg) ** 2)
    return loss


def tpr_loss(reals, gens, tau: float) -> jax.Array:
    """Tanh-margin pairwise relativistic loss (utils/losses.py:5-12)."""
    loss = 0.0
    for dr, dg in zip(reals, gens):
        diff = dr - dg
        m = jnp.median(diff)
        sel = dr < dg + m
        sq = (diff - m) ** 2
        l_rel = jnp.sum(jnp.where(sel, sq, 0.0)) / jnp.maximum(jnp.sum(sel), 1)
        loss += tau - jax.nn.relu(tau - l_rel)
    return loss


def mel_l1_loss(real: jax.Array, gen: jax.Array, mel_transforms) -> jax.Array:
    loss = 0.0
    for tf in mel_transforms:
        loss += jnp.mean(jnp.abs(tf(gen) - tf(real)))
    return loss


class DiscriminatorS(nn.Module):
    """Scale discriminator (discriminator.py:320-348).  use_spectral_norm
    mirrors the torch variant exactly: weight = W / (u^T W_mat v) with the
    u/v power-iteration buffers imported from the checkpoint (eval-exact);
    sn_iters > 0 refreshes u/v per forward for training (nn/conv.py)."""

    use_spectral_norm: bool = False
    sn_iters: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, list[jax.Array]]:
        from cosyvoice_tpu.nn.conv import Conv1d

        sn = self.use_spectral_norm
        norm_kw = dict(weight_norm=not sn, spectral_norm=sn,
                       sn_iters=self.sn_iters if sn else 0)
        h = x[..., None]  # [B, T, 1]
        fmap = []
        specs = [(128, 15, 1, 7, 1), (128, 41, 2, 20, 4), (256, 41, 2, 20, 16),
                 (512, 41, 4, 20, 16), (1024, 41, 4, 20, 16),
                 (1024, 41, 1, 20, 16), (1024, 5, 1, 2, 1)]
        for i, (ch, k, s, p, g) in enumerate(specs):
            h = Conv1d(ch, k, stride=s, padding=p, groups=g, **norm_kw,
                       name=f"convs_{i}")(h)
            h = jax.nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = Conv1d(1, 3, padding=1, **norm_kw, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


def import_discriminator_s_torch(sd: dict, prefix: str = "",
                                 use_spectral_norm: bool = False) -> dict:
    """reference DiscriminatorS state_dict -> params.  weight_norm layers
    carry weight_g/weight_v; spectral_norm layers carry weight_orig plus the
    weight_u/weight_v power-iteration buffers (imported so eval sigma is
    torch-exact)."""
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    def conv(src):
        if use_spectral_norm:
            return {"kernel": torch_conv_weight(sd[f"{src}.weight_orig"]),
                    "sn_u": jnp.asarray(np.asarray(sd[f"{src}.weight_u"])),
                    "sn_v": jnp.asarray(np.asarray(sd[f"{src}.weight_v"])),
                    "bias": jnp.asarray(np.asarray(sd[f"{src}.bias"]))}
        return {"v": torch_conv_weight(sd[f"{src}.weight_v"]),
                "g": jnp.asarray(np.asarray(sd[f"{src}.weight_g"])).reshape(1, 1, -1),
                "bias": jnp.asarray(np.asarray(sd[f"{src}.bias"]))}

    p = {f"convs_{i}": conv(f"{prefix}convs.{i}") for i in range(7)}
    p["conv_post"] = conv(f"{prefix}conv_post")
    return p


def import_msd_torch(sd: dict) -> dict:
    """reference MultiScaleDiscriminator state_dict -> {'params': ...}
    (discriminator.py:350-379; discriminators.0 is the spectral-norm one)."""
    return {"params": {
        f"discriminators_{i}": import_discriminator_s_torch(
            sd, f"discriminators.{i}.", use_spectral_norm=(i == 0))
        for i in range(3)}}


def _avg_pool_421(x: jax.Array) -> jax.Array:
    """torch AvgPool1d(4, 2, padding=2) with count_include_pad=True."""
    xp = jnp.pad(x, ((0, 0), (2, 2)))
    T = (xp.shape[1] - 4) // 2 + 1
    idx = jnp.arange(T)[:, None] * 2 + jnp.arange(4)[None, :]
    return xp[:, idx].mean(axis=-1)


class MultiScaleDiscriminator(nn.Module):
    """3 scale discriminators with 2x mean-pooling (discriminator.py:350-379);
    the first uses spectral norm like the reference (:354-356)."""

    sn_iters: int = 0  # power-iteration refreshes per training forward

    @nn.compact
    def __call__(self, y: jax.Array, y_hat: jax.Array):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = _avg_pool_421(y)
                y_hat = _avg_pool_421(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0),
                               sn_iters=self.sn_iters,
                               name=f"discriminators_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
