"""HiFT vocoder: Neural-Source-Filter + iSTFT-net hybrid (mel -> waveform).

Behavioral spec: reference `cosyvoice/hifigan/generator.py` —
ResBlock (:43-103, Snake acts x2 per conv pair), SineGen (:106-168 harmonic
sine bank over cumsum phase, uv-gated noise), SourceModuleHnNSF (:171-220
tanh(linear(harmonics))), HiFTGenerator (:223-411: f0 predictor -> x480
upsampled f0 -> sine source; source STFT'd (n_fft 16 hop 4) and injected at
each transposed-conv upsample scale through source_downs/source_resblocks;
conv_post -> 9 log-magnitude + 9 phase -> iSTFT -> clamp +-0.99), and
`cosyvoice/hifigan/f0_predictor.py:19-55` (ConvRNNF0Predictor).

TPU-first: channels-last convs, matmul-DFT iSTFT (ops/stft), everything in one
jit; stochastic source phase/noise drawn from linen's 'noise' RNG collection
with a `deterministic` switch for golden parity tests.

Parity notes (easy to get wrong):
  * the final activation before conv_post is F.leaky_relu with DEFAULT slope
    0.01, unlike the 0.1 used at upsample layers (generator.py:373).
  * reflection-pad (1, 0) is applied after the LAST upsample only (:357).
  * magnitude is clipped at 1e2 before the iSTFT (:342).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv1d, ConvTranspose1d
from cosyvoice_tpu.ops.activations import snake
from cosyvoice_tpu.ops.stft import hann_window, istft, stft


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Sequence[int] = (8, 5, 3)
    upsample_kernel_sizes: Sequence[int] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop_len: int = 4
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: Sequence[int] = (7, 7, 11)
    source_resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512
    # serving compute dtype for the conv stack ("float32" | "bfloat16");
    # f0/sine-source phase (cumsum) and the iSTFT head stay fp32.  Caller
    # casts params (utils.dtype.to_bf16).  Mirrors the reference's fp16
    # serving (cli/model.py:43-45).
    dtype: str = "float32"
    # serving: polynomial sine in the snake activations (ops/activations.py
    # fast_sin, max err 6e-6 — below bf16 resolution).  Exact sin is the
    # hottest VPU op in the vocoder at audio rate.
    approx_sin: bool = False
    # serving: lane-pack narrow-channel levels (space-to-depth along time,
    # nn/conv.py pack_conv_weights).  At C=64 XLA lays elementwise fusions
    # out T-minor (to fill 128 lanes) while convs need C-minor, so EVERY
    # snake/residual<->conv edge pays a whole-tensor transpose copy and the
    # last upsample level runs ~5x slower than its FLOPs; packed to 128
    # lanes both agree.  Exact numerics (same MACs, same params).
    lane_pack: bool = False

    @property
    def upsample_scale(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.istft_hop_len


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class SnakeAct(nn.Module):
    channels: int
    alpha_logscale: bool = False
    approx_sin: bool = False
    pack: int = 1  # lane-packed input [.., pack*channels]: alpha tiles

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        if self.pack > 1:
            alpha = jnp.tile(alpha, self.pack)
        return snake(x, alpha, self.alpha_logscale, approx_sin=self.approx_sin)


class ResBlock(nn.Module):
    """MRF residual block: (snake -> dilated conv -> snake -> conv) x len(dilations).

    pack > 1: operates on a lane-packed [B, T/pack, pack*C] view (exact; see
    HiFTConfig.lane_pack).  Param tree is identical either way.
    """

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    approx_sin: bool = False
    pack: int = 1

    def _clean_tail(self, y: jax.Array, pad_tail: int) -> jax.Array:
        """Re-zero the space-to-depth zero-pad tail after a biased conv, so
        the next conv's real outputs read exact zeros there (what the
        unpacked conv's own zero padding would see)."""
        if self.pack <= 1 or pad_tail == 0:
            return y
        C = self.channels
        m = np.ones((self.pack, C), y.dtype)
        m[self.pack - pad_tail:] = 0.0
        # in-place DUS on the final packed row — NOT a whole-tensor concat
        return y.at[:, -1:].set(y[:, -1:] * m.reshape(1, 1, -1))

    @nn.compact
    def __call__(self, x: jax.Array, pad_tail: int = 0) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = SnakeAct(self.channels, approx_sin=self.approx_sin,
                          pack=self.pack, name=f"act1_{i}")(x)
            xt = Conv1d(self.channels, self.kernel_size, padding=_get_padding(self.kernel_size, d),
                        dilation=d, weight_norm=True, pack=self.pack,
                        name=f"convs1_{i}")(xt)
            xt = self._clean_tail(xt, pad_tail)
            xt = SnakeAct(self.channels, approx_sin=self.approx_sin,
                          pack=self.pack, name=f"act2_{i}")(xt)
            xt = Conv1d(self.channels, self.kernel_size, padding=_get_padding(self.kernel_size, 1),
                        weight_norm=True, pack=self.pack, name=f"convs2_{i}")(xt)
            xt = self._clean_tail(xt, pad_tail)
            x = x + xt
        return x


class ConvRNNF0Predictor(nn.Module):
    """mel [B, T, 80] -> f0 [B, T] (Hz); reference f0_predictor.py:19-55."""

    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        x = mel
        for i in range(5):
            x = Conv1d(self.cond_channels, 3, padding=1, weight_norm=True, name=f"conv_{i}")(x)
            x = jax.nn.elu(x)
        f0 = nn.Dense(1, name="classifier")(x)
        return jnp.abs(f0[..., 0])


class SourceModuleHnNSF(nn.Module):
    """f0 [B, L] at sample rate -> harmonic source [B, L, 1].

    SineGen folded in (generator.py:106-220): per-harmonic phase from the
    cumulative frequency sum, random phase offsets for harmonics > 0, uv gate,
    additive noise, then tanh(linear(harmonics)).
    """

    cfg: HiFTConfig
    deterministic: bool = False

    @nn.compact
    def __call__(self, f0: jax.Array) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        H = cfg.nb_harmonics + 1
        harm = jnp.arange(1, H + 1, dtype=f0.dtype)
        # [B, L, H]: instantaneous normalized frequency per harmonic
        fmat = f0[..., None] * harm / cfg.sampling_rate
        theta = 2.0 * jnp.pi * (jnp.cumsum(fmat, axis=1) % 1.0)
        if self.deterministic:
            phase = jnp.zeros((f0.shape[0], 1, H), f0.dtype)
            noise_unit = jnp.zeros_like(theta)
        else:
            kp, kn = jax.random.split(self.make_rng("noise"))
            phase = jax.random.uniform(kp, (f0.shape[0], 1, H), f0.dtype,
                                       -jnp.pi, jnp.pi).at[:, :, 0].set(0.0)
            noise_unit = jax.random.normal(kn, theta.shape, f0.dtype)
        sine = cfg.nsf_alpha * jnp.sin(theta + phase)
        uv = (f0 > cfg.nsf_voiced_threshold).astype(f0.dtype)[..., None]
        noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
        sine = sine * uv + noise_amp * noise_unit
        source = jnp.tanh(nn.Dense(1, name="l_linear")(sine))
        return source, uv


class HiFTGenerator(nn.Module):
    """mel [B, T, 80] -> waveform [B, T*480] (24 kHz v2 config)."""

    cfg: HiFTConfig = field(default_factory=HiFTConfig)
    deterministic: bool = False

    def setup(self):
        cfg = self.cfg
        self.f0_predictor = ConvRNNF0Predictor(cfg.f0_cond_channels)
        self.m_source = SourceModuleHnNSF(cfg, self.deterministic)
        self.conv_pre = Conv1d(cfg.base_channels, 7, padding=3, weight_norm=True)
        approx = cfg.approx_sin
        ups, source_downs, source_resblocks, resblocks = [], [], [], []
        down_cum = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1]))[::-1]
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.base_channels // (2 ** (i + 1))
            ups.append(ConvTranspose1d(ch, k, u, padding=(k - u) // 2,
                                       weight_norm=True, name=f"ups_{i}"))
            du = int(down_cum[i])
            sk = cfg.source_resblock_kernel_sizes[i]
            sd = cfg.source_resblock_dilation_sizes[i]
            if du == 1:
                source_downs.append(Conv1d(ch, 1, name=f"source_downs_{i}"))
            else:
                source_downs.append(Conv1d(ch, du * 2, stride=du, padding=du // 2,
                                           name=f"source_downs_{i}"))
            pk = max(1, 128 // ch) if cfg.lane_pack else 1
            source_resblocks.append(ResBlock(ch, sk, sd, approx_sin=approx,
                                             pack=pk,
                                             name=f"source_resblocks_{i}"))
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                resblocks.append(ResBlock(ch, rk, rd, approx_sin=approx,
                                          pack=pk,
                                          name=f"resblocks_{i}_{j}"))
        self.ups = ups
        self.source_downs = source_downs
        self.source_resblocks = source_resblocks
        self.resblocks = resblocks
        self.conv_post = Conv1d(cfg.istft_n_fft + 2, 7, padding=3, weight_norm=True)

    def _source(self, mel: jax.Array) -> tuple[jax.Array, jax.Array]:
        """mel -> (source s [B, L, 1], f0 [B, T])."""
        f0 = self.f0_predictor(mel)
        f0_up = jnp.repeat(f0, self.cfg.upsample_scale, axis=-1)  # nearest x480
        s, _ = self.m_source(f0_up)
        return s, f0

    def decode(self, mel: jax.Array, s: jax.Array) -> jax.Array:
        """Deterministic synthesis from mel [B,T,80] + source s [B,L,1]."""
        cfg = self.cfg
        n_fft, hop = cfg.istft_n_fft, cfg.istft_hop_len
        cdt = jnp.dtype(cfg.dtype)
        win = hann_window(n_fft, jnp.float32)
        s_re, s_im = stft(s[..., 0].astype(jnp.float32), n_fft, hop, win,
                          center=True)
        s_stft = jnp.concatenate([s_re, s_im], axis=1).swapaxes(1, 2)  # [B, T', 18]
        s_stft = s_stft.astype(cdt)

        x = self.conv_pre(mel.astype(cdt))
        nk = len(cfg.resblock_kernel_sizes)
        for i in range(len(self.ups)):
            x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                x = jnp.concatenate([x[:, 1:2], x], axis=1)  # ReflectionPad1d((1, 0))
            si = self.source_downs[i](s_stft)
            ch = cfg.base_channels // (2 ** (i + 1))
            pk = max(1, 128 // ch) if cfg.lane_pack else 1
            Ti = x.shape[1]
            if pk > 1:
                # lane-pack this level (see HiFTConfig.lane_pack): trailing
                # zero rows are exact (the convs zero-pad there anyway) and
                # sliced off at exit
                Tp = -(-Ti // pk) * pk
                grow = ((0, 0), (0, Tp - Ti), (0, 0))
                x = jnp.pad(x, grow).reshape(x.shape[0], Tp // pk, pk * ch)
                si = jnp.pad(si, grow).reshape(si.shape[0], Tp // pk, pk * ch)
            pad_tail = (-(-Ti // pk) * pk - Ti) if pk > 1 else 0
            si = self.source_resblocks[i](si, pad_tail=pad_tail)
            x = x + si
            xs = x * 0.0
            for j in range(nk):
                xs = xs + self.resblocks[i * nk + j](x, pad_tail=pad_tail)
            x = xs / nk
            if pk > 1:
                x = x.reshape(x.shape[0], -1, ch)[:, :Ti]
        x = jax.nn.leaky_relu(x, 0.01)  # torch default slope here, not lrelu_slope
        x = self.conv_post(x).astype(jnp.float32)  # mag/phase + iSTFT in fp32
        nb = n_fft // 2 + 1
        mag = jnp.minimum(jnp.exp(x[..., :nb]), 1e2)
        phase = jnp.sin(x[..., nb:])
        re = mag * jnp.cos(phase)
        im = mag * jnp.sin(phase)
        wav = istft(re.swapaxes(1, 2), im.swapaxes(1, 2), n_fft, hop, win, center=True)
        return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)

    def __call__(self, mel: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Training forward: mel [B,T,80] -> (wav [B, T*480], f0 [B,T])."""
        s, f0 = self._source(mel)
        return self.decode(mel, s), f0

    def inference(self, mel: jax.Array, cache_source: jax.Array | None = None
                  ) -> tuple[jax.Array, jax.Array]:
        """Streaming inference: splice `cache_source` [B, Lc, 1] over the head
        of the new source to avoid chunk-boundary glitches (generator.py:399-411).
        cache length must be static; pass None for the first chunk."""
        s, _ = self._source(mel)
        if cache_source is not None and cache_source.shape[1] > 0:
            lc = cache_source.shape[1]
            s = jnp.concatenate([cache_source, s[:, lc:]], axis=1)
        return self.decode(mel, s), s


def import_hift_torch(state_dict, cfg: HiFTConfig = HiFTConfig()) -> dict:
    """Map a reference HiFTGenerator torch state_dict -> linen params pytree.

    Key layout per reference `hifigan/generator.py` + `f0_predictor.py`; the
    `generator.` prefix (GAN wrapper checkpoints) is stripped by the caller.
    """
    from cosyvoice_tpu.nn.conv import torch_conv_weight, torch_convT_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def wn_conv(prefix):
        g = sd[f"{prefix}.weight_g"]  # [out, 1, 1]
        v = sd[f"{prefix}.weight_v"]
        p = {"g": jnp.asarray(g).reshape(1, 1, -1), "v": torch_conv_weight(v)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def wn_convT(prefix):
        g = sd[f"{prefix}.weight_g"]  # [in, 1, 1]
        v = sd[f"{prefix}.weight_v"]  # [in, out, k]
        return {"g": jnp.asarray(g).reshape(1, -1, 1), "v": torch_convT_weight(v),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def plain_conv(prefix):
        return {"kernel": torch_conv_weight(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def resblock(prefix, n):
        p = {}
        for j in range(n):
            p[f"convs1_{j}"] = wn_conv(f"{prefix}.convs1.{j}")
            p[f"convs2_{j}"] = wn_conv(f"{prefix}.convs2.{j}")
            p[f"act1_{j}"] = {"alpha": jnp.asarray(sd[f"{prefix}.activations1.{j}.alpha"])}
            p[f"act2_{j}"] = {"alpha": jnp.asarray(sd[f"{prefix}.activations2.{j}.alpha"])}
        return p

    params = {
        "conv_pre": wn_conv("conv_pre"),
        "conv_post": wn_conv("conv_post"),
        "m_source": {"l_linear": {
            "kernel": jnp.asarray(sd["m_source.l_linear.weight"]).T,
            "bias": jnp.asarray(sd["m_source.l_linear.bias"]),
        }},
        "f0_predictor": {
            **{f"conv_{i}": wn_conv(f"f0_predictor.condnet.{i * 2}") for i in range(5)},
            "classifier": {
                "kernel": jnp.asarray(sd["f0_predictor.classifier.weight"]).T,
                "bias": jnp.asarray(sd["f0_predictor.classifier.bias"]),
            },
        },
    }
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = wn_convT(f"ups.{i}")
        params[f"source_downs_{i}"] = plain_conv(f"source_downs.{i}")
        ndil = len(cfg.source_resblock_dilation_sizes[i])
        params[f"source_resblocks_{i}"] = resblock(f"source_resblocks.{i}", ndil)
        for j in range(nk):
            ndil_j = len(cfg.resblock_dilation_sizes[j])
            params[f"resblocks_{i}_{j}"] = resblock(f"resblocks.{i * nk + j}", ndil_j)
    return {"params": params}
