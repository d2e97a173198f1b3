"""VITS decoder: speech tokens -> waveform via a normalizing-flow VAE.

Behavioral spec: reference `cosyvoice/vits/models.py` — TextEncoder (:18-100,
token embed [+optional conformer upsamplers] -> windowed-relative-attention
encoder -> (m, logs)), PosteriorEncoder (:139-172, linear-spec -> WN ->
reparam sample), ResidualCouplingBlock (:102-137, 4 x [affine coupling
(mean-only) + flip]), HiFiGAN-style Generator (:174-238), VitsDecoder
(:240-353: training samples a random segment for the GAN loss; inference
z_p = m_p + noise*exp(logs_p)*scale -> reverse flow -> generator), plus
`cosyvoice/vits/attentions.py` (window_size-4 learned relative attention)
and `cosyvoice/speaker/modules.py` (WN with fused tanh-sigmoid gates,
LRELU 0.1 ResBlock1).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.conformer import ConformerConfig, UpsampleConformerEncoder
from cosyvoice_tpu.nn.conv import Conv1d, ConvTranspose1d
from cosyvoice_tpu.ops.masks import make_non_pad_mask

LRELU_SLOPE = 0.1


class ChanLayerNorm(nn.Module):
    """speaker/modules.LayerNorm: LN over channels (ours: plain last-axis LN)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class WindowRelAttention(nn.Module):
    """VITS windowed relative self-attention (attentions.py:115-345):
    1x1-conv q/k/v/o + learned +-window relative key/value embeddings."""

    channels: int
    heads: int
    window_size: int = 4

    @nn.compact
    def __call__(self, x, attn_mask=None):
        H = self.heads
        D = self.channels // H
        B, T, _ = x.shape
        q = Conv1d(self.channels, 1, name="conv_q")(x).reshape(B, T, H, D)
        k = Conv1d(self.channels, 1, name="conv_k")(x).reshape(B, T, H, D)
        v = Conv1d(self.channels, 1, name="conv_v")(x).reshape(B, T, H, D)
        scores = jnp.einsum("bihd,bjhd->bhij", q / np.sqrt(D), k)

        W = self.window_size
        emb_k = self.param("emb_rel_k", nn.initializers.normal(D ** -0.5),
                           (1, 2 * W + 1, D))
        emb_v = self.param("emb_rel_v", nn.initializers.normal(D ** -0.5),
                           (1, 2 * W + 1, D))
        rel_k = _expand_rel(emb_k, T, W)              # [1, 2T-1, D]
        rel_logits = jnp.einsum("bihd,gmd->bhim", q / np.sqrt(D), rel_k)
        scores = scores + _rel_to_abs(rel_logits)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None], scores, -1e4)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", p, v)
        rel_w = _abs_to_rel(p)                        # [B, H, T, 2T-1]
        rel_v = _expand_rel(emb_v, T, W)
        out = out + jnp.einsum("bhim,gmd->bihd", rel_w, rel_v)
        out = out.reshape(B, T, self.channels)
        return Conv1d(self.channels, 1, name="conv_o")(out)


def _expand_rel(emb: jax.Array, T: int, W: int) -> jax.Array:
    """[1, 2W+1, D] -> [1, 2T-1, D] (pad/slice, attentions.py:233-249)."""
    pad = max(T - (W + 1), 0)
    start = max((W + 1) - T, 0)
    e = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return e[:, start: start + 2 * T - 1]


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] -> [B, H, T, T] (attentions.py:251-268)."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    xf = x.reshape(B, H, T * 2 * T)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (0, T - 1)))
    xf = xf.reshape(B, H, T + 1, 2 * T - 1)
    return xf[:, :, :T, T - 1:]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[B, H, T, T] -> [B, H, T, 2T-1] (attentions.py:270-283)."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T - 1)))
    xf = x.reshape(B, H, T * (2 * T - 1))
    xf = jnp.pad(xf, ((0, 0), (0, 0), (T, 0)))
    return xf.reshape(B, H, T, 2 * T)[:, :, :, 1:]


class VitsFFN(nn.Module):
    filter_channels: int
    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, mask):
        pad = self.kernel_size // 2
        h = Conv1d(self.filter_channels, self.kernel_size, padding=pad,
                   name="conv_1")(x * mask[..., None])
        h = jax.nn.relu(h)
        h = Conv1d(self.channels, self.kernel_size, padding=pad,
                   name="conv_2")(h * mask[..., None])
        return h * mask[..., None]


class VitsEncoder(nn.Module):
    """Post-norm attention encoder (attentions.py:10-52)."""

    channels: int
    filter_channels: int
    heads: int
    n_layers: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, mask, attn_mask=None):
        if attn_mask is None:
            attn_mask = mask[:, :, None] & mask[:, None, :]
        x = x * mask[..., None]
        for i in range(self.n_layers):
            y = WindowRelAttention(self.channels, self.heads,
                                   name=f"attn_{i}")(x, attn_mask)
            x = ChanLayerNorm(name=f"norm1_{i}")(x + y)
            y = VitsFFN(self.filter_channels, self.channels, self.kernel_size,
                        name=f"ffn_{i}")(x, mask)
            x = ChanLayerNorm(name=f"norm2_{i}")(x + y)
        return x * mask[..., None]


class WN(nn.Module):
    """WaveNet-style gated stack (speaker/modules.py:145-228)."""

    hidden: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None):
        out = jnp.zeros_like(x)
        if g is not None:
            g_all = Conv1d(2 * self.hidden * self.n_layers, 1, weight_norm=True,
                           name="cond_layer")(g)
        for i in range(self.n_layers):
            d = self.dilation_rate ** i
            pad = (self.kernel_size * d - d) // 2
            x_in = Conv1d(2 * self.hidden, self.kernel_size, padding=pad,
                          dilation=d, weight_norm=True, name=f"in_{i}")(x)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * self.hidden:(i + 1) * 2 * self.hidden]
            a, b = jnp.split(x_in, 2, axis=-1)
            acts = jnp.tanh(a) * jax.nn.sigmoid(b)
            rs_ch = 2 * self.hidden if i < self.n_layers - 1 else self.hidden
            rs = Conv1d(rs_ch, 1, weight_norm=True, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + rs[..., : self.hidden]) * mask[..., None]
                out = out + rs[..., self.hidden:]
            else:
                out = out + rs
        return out * mask[..., None]


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (speaker/modules.py:373-423)."""

    channels: int
    hidden: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden, 1, name="pre")(x0) * mask[..., None]
        h = WN(self.hidden, self.kernel_size, self.dilation_rate,
               self.n_layers, self.gin_channels, name="enc")(h, mask, g)
        m = Conv1d(half, 1, name="post")(h) * mask[..., None]
        if not reverse:
            x1 = m + x1 * mask[..., None]
        else:
            x1 = (x1 - m) * mask[..., None]
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x = ResidualCouplingLayer(self.channels, self.hidden,
                                          self.kernel_size, self.dilation_rate,
                                          self.n_layers, self.gin_channels,
                                          name=f"flow_{i}")(x, mask, g, False)
                x = x[..., ::-1]  # Flip
            else:
                x = x[..., ::-1]
                x = ResidualCouplingLayer(self.channels, self.hidden,
                                          self.kernel_size, self.dilation_rate,
                                          self.n_layers, self.gin_channels,
                                          name=f"flow_{i}")(x, mask, g, True)
        return x


class VitsResBlock1(nn.Module):
    """HiFiGAN ResBlock1 with leaky-relu 0.1 (speaker/modules.py:230-296)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=(self.kernel_size * d - d) // 2,
                        weight_norm=True, name=f"convs1_{i}")(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size,
                        padding=(self.kernel_size - 1) // 2,
                        weight_norm=True, name=f"convs2_{i}")(xt)
            x = x + xt
        return x


class VitsGenerator(nn.Module):
    """HiFiGAN generator (vits/models.py:174-238)."""

    upsample_initial_channel: int
    upsample_rates: Sequence[int]
    upsample_kernel_sizes: Sequence[int]
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, g=None):
        x = Conv1d(self.upsample_initial_channel, 7, padding=3,
                   name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)
        nk = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, padding=(k - u) // 2,
                                weight_norm=True, name=f"ups_{i}")(x)
            xs = x * 0.0
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                xs = xs + VitsResBlock1(ch, rk, rd, name=f"resblocks_{i}_{j}")(x)
            x = xs / nk
        x = jax.nn.leaky_relu(x, 0.01)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x[..., 0])


@dataclass(frozen=True)
class VitsConfig:
    n_vocab: int = 6561
    spec_channels: int = 513
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (5, 4, 3, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (10, 8, 6, 4, 4)
    segment_size: int = 9600
    gin_channels: int = 512
    sample_rate: int = 24000
    frame_rate: int = 25
    token_upsample_ratio: int = 4
    up_enc1: Optional[ConformerConfig] = None
    up_enc2: Optional[ConformerConfig] = None

    @property
    def hop_length(self) -> int:
        return self.sample_rate // self.frame_rate // self.token_upsample_ratio


class VitsDecoder(nn.Module):
    cfg: VitsConfig = field(default_factory=VitsConfig)

    def setup(self):
        cfg = self.cfg
        self.emb = nn.Embed(cfg.n_vocab, cfg.hidden_channels)
        self.up_enc1 = (UpsampleConformerEncoder(cfg.up_enc1, name="up_enc1")
                        if cfg.up_enc1 else None)
        self.up_enc2 = (UpsampleConformerEncoder(cfg.up_enc2, name="up_enc2")
                        if cfg.up_enc2 else None)
        self.encoder = VitsEncoder(cfg.hidden_channels, cfg.filter_channels,
                                   cfg.n_heads, cfg.n_layers, cfg.kernel_size)
        self.enc_proj = Conv1d(cfg.inter_channels * 2, 1)
        self.enc_q_pre = Conv1d(cfg.hidden_channels, 1)
        self.enc_q_wn = WN(cfg.hidden_channels, 5, 1, 16, cfg.gin_channels)
        self.enc_q_proj = Conv1d(cfg.inter_channels * 2, 1)
        self.flow = ResidualCouplingBlock(cfg.inter_channels,
                                          cfg.hidden_channels,
                                          gin_channels=cfg.gin_channels)
        self.dec = VitsGenerator(cfg.upsample_initial_channel,
                                 cfg.upsample_rates, cfg.upsample_kernel_sizes,
                                 cfg.resblock_kernel_sizes,
                                 cfg.resblock_dilation_sizes, cfg.gin_channels)

    def enc_p(self, tokens, token_len, deterministic=True):
        cfg = self.cfg
        x = self.emb(tokens) * np.sqrt(cfg.hidden_channels)
        if self.up_enc1 is not None:
            x, _ = self.up_enc1(x, token_len, deterministic=deterministic)
            token_len = token_len * 2
        if self.up_enc2 is not None:
            x, _ = self.up_enc2(x, token_len, deterministic=deterministic)
            token_len = token_len * 2
        mask = make_non_pad_mask(token_len, x.shape[1])
        x = self.encoder(x, mask)
        stats = self.enc_proj(x) * mask[..., None]
        m, logs = jnp.split(stats, 2, axis=-1)
        return x, m, logs, mask, token_len

    def enc_q(self, spec, spec_len, g, rng):
        mask = make_non_pad_mask(spec_len, spec.shape[1])
        h = self.enc_q_pre(spec) * mask[..., None]
        h = self.enc_q_wn(h, mask, g)
        stats = self.enc_q_proj(h) * mask[..., None]
        m, logs = jnp.split(stats, 2, axis=-1)
        z = (m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)) * mask[..., None]
        return z, m, logs, mask

    def __call__(self, tokens, token_len, spec, spec_len, g, rng,
                 deterministic: bool = True):
        """Training forward (vits/models.py:317-345): returns (wav_slice,
        (ids_slice, masks, z, z_p, m_p, logs_p, m_q, logs_q))."""
        cfg = self.cfg
        k_q, k_slice = jax.random.split(rng)
        g3 = g[:, None, :]
        _, m_p, logs_p, x_mask, _ = self.enc_p(tokens, token_len, deterministic)
        z, m_q, logs_q, y_mask = self.enc_q(spec, spec_len, g3, k_q)
        z_p = self.flow(z, y_mask, g3, reverse=False)
        seg_frames = cfg.segment_size // cfg.hop_length
        max_start = jnp.maximum(spec_len - seg_frames, 1)
        ids = (jax.random.uniform(k_slice, (z.shape[0],)) * max_start).astype(jnp.int32)
        z_slice = jax.vmap(
            lambda zz, s: jax.lax.dynamic_slice_in_dim(zz, s, seg_frames, axis=0))(z, ids)
        o = self.dec(z_slice, g3)
        return o, (ids, x_mask, y_mask, z, z_p, m_p, logs_p, m_q, logs_q)

    def inference(self, tokens, token_len, g, rng, noise_scale: float = 0.5):
        """tokens -> wav (vits/models.py:347-353)."""
        g3 = g[:, None, :]
        _, m_p, logs_p, mask, _ = self.enc_p(tokens, token_len)
        z_p = m_p + jax.random.normal(rng, m_p.shape, m_p.dtype) * \
            jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, mask, g3, reverse=True)
        return self.dec(z * mask[..., None], g3)


def vits_kl_loss(z_p, logs_q, m_p, logs_p, mask):
    """utils/losses.kl_loss:23-38: sum over (channels, frames) of masked KL,
    normalized by the number of valid FRAMES (mask is [B, T])."""
    m = mask[..., None].astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * m) / jnp.maximum(jnp.sum(mask), 1)


def linear_spectrogram(y: jax.Array, n_fft: int = 1024, hop: int = 240,
                       win: int = 1024) -> jax.Array:
    """speaker/mel_processing.spectrogram_torch: reflect-padded magnitude
    linear spec [B, T, n_fft//2+1] (the PosteriorEncoder input)."""
    from cosyvoice_tpu.ops.stft import hann_window, stft

    pad = (n_fft - hop) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    re, im = stft(y, n_fft, hop, hann_window(n_fft, y.dtype), center=False)
    return jnp.sqrt(re * re + im * im + 1e-6).swapaxes(1, 2)


def import_vits_torch(state_dict, cfg: VitsConfig) -> dict:
    """reference VitsDecoder state_dict -> params pytree."""
    from cosyvoice_tpu.models.conformer import import_upsample_encoder_torch
    from cosyvoice_tpu.nn.conv import torch_conv_weight, torch_convT_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix, bias=True):
        p = {"kernel": torch_conv_weight(sd[f"{prefix}.weight"])}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def wn_conv(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight_g"]).reshape(1, 1, -1),
                "v": torch_conv_weight(sd[f"{prefix}.weight_v"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def wn_convT(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight_g"]).reshape(1, -1, 1),
                "v": torch_convT_weight(sd[f"{prefix}.weight_v"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def wn_module(prefix, n_layers, gin):
        p = {}
        if gin:
            p["cond_layer"] = wn_conv(f"{prefix}.cond_layer")
        for i in range(n_layers):
            p[f"in_{i}"] = wn_conv(f"{prefix}.in_layers.{i}")
            p[f"res_skip_{i}"] = wn_conv(f"{prefix}.res_skip_layers.{i}")
        return p

    P = {"emb": {"embedding": jnp.asarray(sd["enc_p.emb.weight"])},
         "enc_proj": conv("enc_p.proj"),
         "enc_q_pre": conv("enc_q.pre"),
         "enc_q_wn": wn_module("enc_q.enc", 16, True),
         "enc_q_proj": conv("enc_q.proj")}
    enc = {}
    for i in range(cfg.n_layers):
        enc[f"attn_{i}"] = {
            "conv_q": conv(f"enc_p.encoder.attn_layers.{i}.conv_q"),
            "conv_k": conv(f"enc_p.encoder.attn_layers.{i}.conv_k"),
            "conv_v": conv(f"enc_p.encoder.attn_layers.{i}.conv_v"),
            "conv_o": conv(f"enc_p.encoder.attn_layers.{i}.conv_o"),
            "emb_rel_k": jnp.asarray(sd[f"enc_p.encoder.attn_layers.{i}.emb_rel_k"]),
            "emb_rel_v": jnp.asarray(sd[f"enc_p.encoder.attn_layers.{i}.emb_rel_v"]),
        }
        for ni, nl in ((1, "norm1"), (2, "norm2")):
            enc[f"{nl}_{i}"] = {"ln": {
                "scale": jnp.asarray(sd[f"enc_p.encoder.norm_layers_{ni}.{i}.gamma"]),
                "bias": jnp.asarray(sd[f"enc_p.encoder.norm_layers_{ni}.{i}.beta"])}}
        enc[f"ffn_{i}"] = {"conv_1": conv(f"enc_p.encoder.ffn_layers.{i}.conv_1"),
                           "conv_2": conv(f"enc_p.encoder.ffn_layers.{i}.conv_2")}
    P["encoder"] = enc
    flow = {}
    for fi in range(4):
        pre = f"flow.flows.{fi * 2}"
        flow[f"flow_{fi}"] = {"pre": conv(f"{pre}.pre"),
                              "post": conv(f"{pre}.post"),
                              "enc": wn_module(f"{pre}.enc", 4, True)}
    P["flow"] = flow
    dec = {"conv_pre": conv("dec.conv_pre"), "cond": conv("dec.cond"),
           "conv_post": conv("dec.conv_post", bias=False)}
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        dec[f"ups_{i}"] = wn_convT(f"dec.ups.{i}")
        for j in range(nk):
            rb = {}
            for di in range(len(cfg.resblock_dilation_sizes[j])):
                rb[f"convs1_{di}"] = wn_conv(f"dec.resblocks.{i * nk + j}.convs1.{di}")
                rb[f"convs2_{di}"] = wn_conv(f"dec.resblocks.{i * nk + j}.convs2.{di}")
            dec[f"resblocks_{i}_{j}"] = rb
    P["dec"] = dec
    for enc_name in ("up_enc1", "up_enc2"):
        enc_cfg = getattr(cfg, enc_name)
        if enc_cfg is not None:
            esd = {k[len(f"enc_p.{enc_name}."):]: v for k, v in sd.items()
                   if k.startswith(f"enc_p.{enc_name}.")}
            P[enc_name] = import_upsample_encoder_torch(esd, enc_cfg)["params"]
    return {"params": P}


# --------------------------------------------------------------------------
# VITS stochastic-duration-predictor plumbing (speaker/modules.py flows).
# Dead code in the shipped recipes (VitsDecoder drops the duration
# predictor — tokens are already time-aligned), ported for surface parity.
# --------------------------------------------------------------------------

class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (speaker/modules.py:102-142)."""

    channels: int
    kernel_size: int
    n_layers: int

    @nn.compact
    def __call__(self, x, mask, g=None):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            d = self.kernel_size ** i
            pad = (self.kernel_size * d - d) // 2
            y = Conv1d(self.channels, self.kernel_size, groups=self.channels,
                       dilation=d, padding=pad,
                       name=f"convs_sep_{i}")(x * mask[..., None])
            y = nn.LayerNorm(epsilon=1e-5, name=f"norms_1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"convs_1x1_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norms_2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            x = x + y
        return x * mask[..., None]


class ConvFlow(nn.Module):
    """Rational-quadratic spline coupling (speaker/modules.py:385-470)."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, mask, g=None, reverse=False):
        from cosyvoice_tpu.ops.splines import \
            piecewise_rational_quadratic_transform

        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.n_layers,
                    name="convs")(h, mask, g=g)
        h = Conv1d(half * (self.num_bins * 3 - 1), 1,
                   name="proj")(h) * mask[..., None]
        # torch: [b, c*(3n-1), t] -> (b, c, 3n-1, t) -> (b, c, t, 3n-1);
        # channels-last: [B, T, c*(3n-1)] -> [B, T, c, 3n-1] -> [B, c, T, ...]
        B, T = h.shape[:2]
        h = h.reshape(B, T, half, 3 * self.num_bins - 1).transpose(0, 2, 1, 3)
        scale = float(np.sqrt(self.filter_channels))
        uw = h[..., : self.num_bins] / scale
        uh = h[..., self.num_bins: 2 * self.num_bins] / scale
        ud = h[..., 2 * self.num_bins:]
        x1c = x1.transpose(0, 2, 1)  # [B, half, T]
        y1, logabsdet = piecewise_rational_quadratic_transform(
            x1c, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound)
        x = jnp.concatenate([x0, y1.transpose(0, 2, 1)], axis=-1) * mask[..., None]
        if reverse:
            return x
        logdet = jnp.sum(logabsdet * mask[:, None, :], axis=(1, 2))
        return x, logdet


class ElementwiseAffine(nn.Module):
    """speaker/modules.py:355-370."""

    channels: int

    @nn.compact
    def __call__(self, x, mask, reverse=False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * mask[..., None]
            logdet = jnp.sum(logs[None, None, :] * mask[..., None], axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * mask[..., None]


def flip_flow(x, reverse=False):
    """speaker/modules.py:345-352 (channel flip; logdet 0)."""
    y = x[..., ::-1]
    if not reverse:
        return y, jnp.zeros(x.shape[0], x.dtype)
    return y


def log_flow(x, mask, reverse=False):
    """speaker/modules.py:332-342."""
    if not reverse:
        y = jnp.log(jnp.clip(x, 1e-5)) * mask[..., None]
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * mask[..., None]


def import_conv_flow_torch(sd, n_layers: int) -> dict:
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    def conv(prefix):
        p = {"kernel": torch_conv_weight(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    convs = {}
    for i in range(n_layers):
        convs[f"convs_sep_{i}"] = conv(f"convs.convs_sep.{i}")
        convs[f"convs_1x1_{i}"] = conv(f"convs.convs_1x1.{i}")
        convs[f"norms_1_{i}"] = {"scale": jnp.asarray(sd[f"convs.norms_1.{i}.gamma"]),
                                 "bias": jnp.asarray(sd[f"convs.norms_1.{i}.beta"])}
        convs[f"norms_2_{i}"] = {"scale": jnp.asarray(sd[f"convs.norms_2.{i}.gamma"]),
                                 "bias": jnp.asarray(sd[f"convs.norms_2.{i}.beta"])}
    return {"params": {"pre": conv("pre"), "proj": conv("proj"),
                       "convs": convs}}
