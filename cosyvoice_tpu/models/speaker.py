"""Production 512-d speaker embedding (timbre + style) — "LAM" stack.

Behavioral spec: reference `cosyvoice/speaker/speaker_encoder.py:119-270`
(SpeakerEmbedding): CAMPPlus timbre vector (kaldi fbank 80 @16k, 192-d) +
PosteriorEncoder over the 1024-pt/hop-300 linear spectrum -> StyleEncoder_v2
(spectral FC + Conv1dGLU temporal + self-attention, masked mean pool,
`style_encoder.py:21-115`) -> GlobalStyleTokens_v2 (4096 tokens x 6 layers,
8-head attention onto tanh'd token keys, :117-158) -> StyleFuser Add
(style projected 512->512, no bias, + timbre, :160-192).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.campplus import CAMPPlus, CAMPPlusConfig
from cosyvoice_tpu.models.vits import WN, linear_spectrogram
from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.activations import mish
from cosyvoice_tpu.ops.kaldi import kaldi_fbank
from cosyvoice_tpu.ops.masks import make_non_pad_mask


class Conv1dGLU(nn.Module):
    """conv -> GLU + residual (speaker/modules.py:498-516)."""

    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        h = Conv1d(2 * self.channels, self.kernel_size,
                   padding=(self.kernel_size - 1) // 2, name="conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        return x + a * jax.nn.sigmoid(b)


class StyleMHA(nn.Module):
    """speaker/modules.MultiHeadAttention:551-606 — note the unusual
    1/sqrt(d_model) score scale and residual without norm."""

    heads: int
    d_model: int

    @nn.compact
    def __call__(self, x, mask=None):
        H = self.heads
        dk = self.d_model // H
        B, T, _ = x.shape
        q = nn.Dense(H * dk, name="w_qs")(x).reshape(B, T, H, dk)
        k = nn.Dense(H * dk, name="w_ks")(x).reshape(B, T, H, dk)
        v = nn.Dense(H * dk, name="w_vs")(x).reshape(B, T, H, dk)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(self.d_model)
        if mask is not None:
            scores = jnp.where(mask[:, None], -jnp.inf, scores)
        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", p, v).reshape(B, T, H * dk)
        return x + nn.Dense(self.d_model, name="fc")(out)


class StyleEncoderV2(nn.Module):
    """style_encoder.py:21-115."""

    hidden: int = 256
    out_dim: int = 512
    kernel_size: int = 5
    heads: int = 4
    num_layers: int = 6

    @nn.compact
    def __call__(self, x, valid_mask):
        """x [B, T, in_dim], valid_mask [B, T] bool -> [B, out_dim]."""
        pad = ~valid_mask
        slf_mask = pad[:, None, :] & jnp.ones_like(pad)[:, :, None]
        x = nn.Dense(self.hidden, name="in_fc")(x)
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden, name=f"spectral_{i}_0")(x)
            h = mish(h)
            h = nn.Dense(self.hidden, name=f"spectral_{i}_1")(h)
            x = mish(h)
            x = Conv1dGLU(self.hidden, self.kernel_size, name=f"glu_{i}_0")(x)
            x = Conv1dGLU(self.hidden, self.kernel_size, name=f"glu_{i}_1")(x)
            x = jnp.where(pad[..., None], 0.0, x)
            x = StyleMHA(self.heads, self.hidden, name=f"attn_{i}")(x, slf_mask)
        x = nn.Dense(self.out_dim, name="fc")(x)
        x = jnp.where(pad[..., None], 0.0, x)
        n = jnp.maximum(valid_mask.sum(axis=1, keepdims=True), 1)
        return x.sum(axis=1) / n


class GSTAttention(nn.Module):
    """modules.MultiHeadAttention_GivenK:666-711."""

    num_units: int
    num_heads: int
    key_dim: int

    @nn.compact
    def __call__(self, query, keys):
        H = self.num_units // self.num_heads
        q = nn.Dense(self.num_units, use_bias=False, name="W_query")(query)
        k = nn.Dense(self.num_units, use_bias=False, name="W_key")(keys)
        v = nn.Dense(self.num_units, use_bias=False, name="W_value")(keys)
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        q = q.reshape(B, Tq, self.num_heads, H)
        k = k.reshape(B, Tk, self.num_heads, H)
        v = v.reshape(B, Tk, self.num_heads, H)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(self.key_dim)
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhij,bjhd->bihd", p, v).reshape(B, Tq, self.num_units)


class GlobalStyleTokensV2(nn.Module):
    """style_encoder.py:117-158."""

    token_num: int = 4096
    embed_dim: int = 512
    num_heads: int = 8
    num_layers: int = 6

    @nn.compact
    def __call__(self, style_vec):
        """[B, E] -> [B, 1, E]."""
        q = style_vec[:, None, :]
        dk = self.embed_dim // self.num_heads
        for i in range(self.num_layers):
            tokens = self.param(f"embed_{i}", nn.initializers.normal(0.5),
                                (self.token_num, dk))
            keys = jnp.broadcast_to(jnp.tanh(tokens)[None],
                                    (q.shape[0],) + tokens.shape)
            q = GSTAttention(self.embed_dim, self.num_heads, dk,
                             name=f"attention_{i}")(q, keys)
        return q


@dataclass(frozen=True)
class SpeakerEmbeddingConfig:
    spec_channels: int = 513
    inter_channels: int = 512
    hidden_channels: int = 512
    speaker_emb_dim: int = 512
    sampling_rate: int = 24000
    hop_length: int = 300
    filter_length: int = 1024
    fbank_sr: int = 16000
    campplus: CAMPPlusConfig = field(default_factory=lambda: CAMPPlusConfig(
        embedding_size=192))
    style_hidden: int = 256
    style_heads: int = 4
    style_kernel: int = 5
    style_layers: int = 6
    gst_tokens: int = 4096
    gst_heads: int = 8
    gst_layers: int = 6


class SpeakerEmbedding(nn.Module):
    cfg: SpeakerEmbeddingConfig = field(default_factory=SpeakerEmbeddingConfig)

    def setup(self):
        cfg = self.cfg
        self.speaker_encoder = CAMPPlus(cfg.campplus)
        self.enc_q_pre = Conv1d(cfg.hidden_channels, 1)
        self.enc_q_wn = WN(cfg.hidden_channels, 5, 1, 16, 0)
        self.enc_q_proj = Conv1d(cfg.inter_channels * 2, 1)
        self.style_encoder = StyleEncoderV2(cfg.style_hidden,
                                            cfg.speaker_emb_dim,
                                            cfg.style_kernel, cfg.style_heads,
                                            cfg.style_layers)
        self.gst = GlobalStyleTokensV2(
            cfg.gst_tokens, cfg.speaker_emb_dim, cfg.gst_heads, cfg.gst_layers)
        if cfg.speaker_emb_dim != cfg.campplus.embedding_size:
            self.speaker_adapter = nn.Dense(cfg.speaker_emb_dim, use_bias=False)
        else:
            self.speaker_adapter = None

    def __call__(self, fbank, spec, spec_len, rng):
        """fbank [B, Tf, 80] (16k kaldi, mean-normed), spec [B, Ts, 513]
        (24k linear spectrum), rng for the posterior reparam sample.
        Returns [B, speaker_emb_dim]."""
        timbre = self.speaker_encoder(fbank)  # [B, 192]
        mask = make_non_pad_mask(spec_len, spec.shape[1])
        h = self.enc_q_pre(spec) * mask[..., None]
        h = self.enc_q_wn(h, mask)
        stats = self.enc_q_proj(h) * mask[..., None]
        m, logs = jnp.split(stats, 2, axis=-1)
        z = (m + jax.random.normal(rng, m.shape, m.dtype) * jnp.exp(logs)) * mask[..., None]
        style = self.style_encoder(z, mask)            # [B, 512]
        style = self.gst(style)                        # [B, 1, 512]
        if self.speaker_adapter is not None:
            # StyleFuser(feat=512, style=192, Add): g = style + W(timbre)
            # (speaker_encoder.py:183-184 composed at :262-264)
            g = style[:, 0] + self.speaker_adapter(timbre)
        else:
            g = timbre + style[:, 0]
        return g


def speaker_embed(model: SpeakerEmbedding, variables, wave_24k: np.ndarray,
                  rng) -> np.ndarray:
    """Host helper: 24 kHz wav -> 512-d speaker vector."""
    from cosyvoice_tpu.runtime.frontend import resample_poly

    cfg = model.cfg
    wav16 = resample_poly(wave_24k, cfg.sampling_rate, cfg.fbank_sr)
    fb = kaldi_fbank(jnp.asarray(wav16))
    fb = fb - fb.mean(axis=0, keepdims=True)
    spec = linear_spectrogram(jnp.asarray(wave_24k)[None], cfg.filter_length,
                              cfg.hop_length, cfg.filter_length)
    spec_len = jnp.asarray([spec.shape[1]])
    return np.asarray(model.apply(variables, fb[None], spec, spec_len, rng))[0]


def import_speaker_embedding_torch(state_dict, cfg: SpeakerEmbeddingConfig) -> dict:
    """reference SpeakerEmbedding state_dict -> {'params','batch_stats'}."""
    from cosyvoice_tpu.models.campplus import import_campplus_torch
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(prefix, bias=True):
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"]).T}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def conv(prefix, bias=True):
        p = {"kernel": torch_conv_weight(sd[f"{prefix}.weight"])}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def wn_conv(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight_g"]).reshape(1, 1, -1),
                "v": torch_conv_weight(sd[f"{prefix}.weight_v"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    camp_sd = {k[len("speaker_encoder."):]: v for k, v in sd.items()
               if k.startswith("speaker_encoder.")}
    camp = import_campplus_torch(camp_sd, cfg.campplus)

    style = {"in_fc": dense("style_encoder.in_fc.fc"),
             "fc": dense("style_encoder.fc.fc")}
    for i in range(cfg.style_layers):
        style[f"spectral_{i}_0"] = dense(f"style_encoder.spectral_layers.{i}.0.fc")
        style[f"spectral_{i}_1"] = dense(f"style_encoder.spectral_layers.{i}.3.fc")
        for gi in range(2):
            style[f"glu_{i}_{gi}"] = {"conv1": conv(
                f"style_encoder.temporal_layers.{i}.{gi}.conv1.conv")}
        style[f"attn_{i}"] = {
            "w_qs": dense(f"style_encoder.attn_layers.{i}.w_qs"),
            "w_ks": dense(f"style_encoder.attn_layers.{i}.w_ks"),
            "w_vs": dense(f"style_encoder.attn_layers.{i}.w_vs"),
            "fc": dense(f"style_encoder.attn_layers.{i}.fc")}

    gst = {}
    for i in range(cfg.gst_layers):
        gst[f"embed_{i}"] = jnp.asarray(sd[f"gst.embeds.{i}"])
        gst[f"attention_{i}"] = {
            "W_query": dense(f"gst.attentions.{i}.W_query", bias=False),
            "W_key": dense(f"gst.attentions.{i}.W_key", bias=False),
            "W_value": dense(f"gst.attentions.{i}.W_value", bias=False)}

    wn = {}
    for i in range(16):
        wn[f"in_{i}"] = wn_conv(f"enc_q.enc.in_layers.{i}")
        wn[f"res_skip_{i}"] = wn_conv(f"enc_q.enc.res_skip_layers.{i}")

    params = {"speaker_encoder": camp["params"],
              "enc_q_pre": conv("enc_q.pre"),
              "enc_q_wn": wn,
              "enc_q_proj": conv("enc_q.proj"),
              "style_encoder": style,
              "gst": gst}
    if "speaker_adapter.style_fuser.weight" in sd:
        params["speaker_adapter"] = {
            "kernel": jnp.asarray(sd["speaker_adapter.style_fuser.weight"]).T}
    return {"params": params,
            "batch_stats": {"speaker_encoder": camp["batch_stats"]}}


class SpeakerEmbeddingWoPostEnc(nn.Module):
    """Variant without the posterior encoder (speaker_encoder.py:273+):
    the style encoder consumes the linear spectrum directly."""

    cfg: SpeakerEmbeddingConfig = field(default_factory=SpeakerEmbeddingConfig)

    def setup(self):
        cfg = self.cfg
        self.speaker_encoder = CAMPPlus(cfg.campplus)
        self.style_encoder = StyleEncoderV2(cfg.style_hidden,
                                            cfg.speaker_emb_dim,
                                            cfg.style_kernel, cfg.style_heads,
                                            cfg.style_layers)
        self.gst = GlobalStyleTokensV2(cfg.gst_tokens, cfg.speaker_emb_dim,
                                       cfg.gst_heads, cfg.gst_layers)
        if cfg.speaker_emb_dim != cfg.campplus.embedding_size:
            self.speaker_adapter = nn.Dense(cfg.speaker_emb_dim, use_bias=False)
        else:
            self.speaker_adapter = None

    def __call__(self, fbank, spec, spec_len, rng=None):
        timbre = self.speaker_encoder(fbank)
        mask = make_non_pad_mask(spec_len, spec.shape[1])
        style = self.style_encoder(spec, mask)
        style = self.gst(style)
        if self.speaker_adapter is not None:
            g = style[:, 0] + self.speaker_adapter(timbre)
        else:
            g = timbre + style[:, 0]
        return g
