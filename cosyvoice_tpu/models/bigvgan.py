"""BigVGAN vocoder: speech tokens -> waveform with anti-aliased Snake acts.

Behavioral spec: reference `cosyvoice/BigVGAN/bigvgan.py` —
AMPBlock1/2 (:32-243, anti-aliased Snake/SnakeBeta between convs),
BigVGAN (:244-452: token embed -> optional two conformer 2x upsamplers ->
proj -> conv_pre + speaker cond; 6 transposed-conv upsamples with per-layer
speaker conditioning; aux mel_proj head for the mel-recon loss; final
anti-aliased act -> conv_post -> tanh), and
`BigVGAN/alias_free_activation/torch/` (kaiser-sinc 2x up/down resampling
around the activation; filter.py:15-70, resample.py, act.py).

The reference's only native kernel — the fused CUDA anti-alias activation
(`alias_free_activation/cuda/`, ~490 LoC) — maps here to
`ops/pallas/snake_aa.py` (fused upsample->snake->downsample Pallas kernel)
with `anti_alias_activation()` below as its XLA reference twin.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.conformer import ConformerConfig, UpsampleConformerEncoder
from cosyvoice_tpu.models.hift import SnakeAct, _get_padding
from cosyvoice_tpu.nn.conv import Conv1d, ConvTranspose1d
from cosyvoice_tpu.ops.activations import snake, snake_beta
from cosyvoice_tpu.ops.masks import make_non_pad_mask


# --------------------------------------------------------------------------
# kaiser-sinc anti-aliasing (XLA reference path)
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """[kernel_size] lowpass FIR (filter.py:31-63; julius lineage)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _depthwise(x: jax.Array, filt: jax.Array, stride: int = 1,
               lhs_dilation: int = 1, pad=(0, 0)) -> jax.Array:
    """[B, T, C] depthwise conv with a shared scalar filter per channel."""
    C = x.shape[-1]
    k = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, C))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(stride,), padding=[pad],
        lhs_dilation=(lhs_dilation,), feature_group_count=C,
        dimension_numbers=("NWC", "WIO", "NWC"))


def upsample2(x: jax.Array, ratio: int = 2, kernel_size: Optional[int] = None) -> jax.Array:
    """Anti-aliased ratio-x upsample (resample.py UpSample1d)."""
    ks = kernel_size or int(6 * ratio // 2) * 2
    pad = ks // ratio - 1
    pad_left = pad * ratio + (ks - ratio) // 2
    pad_right = pad * ratio + (ks - ratio + 1) // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks))
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # convT(stride=ratio) == lhs-dilated correlation with flipped kernel
    y = ratio * _depthwise(x, filt[::-1], lhs_dilation=ratio, pad=(ks - 1, ks - 1))
    return y[:, pad_left: y.shape[1] - pad_right, :]


def downsample2(x: jax.Array, ratio: int = 2, kernel_size: Optional[int] = None) -> jax.Array:
    """Anti-aliased ratio-x decimation (resample.py DownSample1d)."""
    ks = kernel_size or int(6 * ratio // 2) * 2
    even = ks % 2 == 0
    pad_left = ks // 2 - int(even)
    pad_right = ks // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, ks))
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise(x, filt, stride=ratio)


def anti_alias_activation(x: jax.Array, alpha: jax.Array,
                          beta: Optional[jax.Array] = None,
                          logscale: bool = True) -> jax.Array:
    """2x upsample -> snake(-beta) -> 2x decimate (act.py Activation1d).

    XLA reference twin of the fused Pallas kernel; replaces the reference's
    only CUDA kernel (alias_free_activation/cuda/anti_alias_activation_cuda.cu).
    """
    y = upsample2(x)
    y = snake(y, alpha, logscale) if beta is None else snake_beta(y, alpha, beta, logscale)
    return downsample2(y)


class AAAct(nn.Module):
    """Parameterized anti-aliased Snake/SnakeBeta activation layer.

    use_pallas=True routes through the fused Pallas kernel
    (ops/pallas/snake_aa.py — the TPU twin of the reference CUDA kernel);
    default is the XLA composite path.
    """

    channels: int
    activation: str = "snakebeta"
    logscale: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = (self.param("beta", init, (self.channels,))
                if self.activation == "snakebeta" else None)
        if self.use_pallas:
            from cosyvoice_tpu.ops.pallas.snake_aa import snake_aa_pallas

            return snake_aa_pallas(x, alpha, beta, self.logscale)
        return anti_alias_activation(x, alpha, beta, self.logscale)


class AMPBlock1(nn.Module):
    """(aa-act -> dilated conv -> aa-act -> conv) x len(dilations), residual."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    activation: str = "snakebeta"
    logscale: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = AAAct(self.channels, self.activation, self.logscale,
                       self.use_pallas, name=f"act_{2 * i}")(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=_get_padding(self.kernel_size, d),
                        weight_norm=True, name=f"convs1_{i}")(xt)
            xt = AAAct(self.channels, self.activation, self.logscale,
                       self.use_pallas, name=f"act_{2 * i + 1}")(xt)
            xt = Conv1d(self.channels, self.kernel_size,
                        padding=_get_padding(self.kernel_size, 1),
                        weight_norm=True, name=f"convs2_{i}")(xt)
            x = x + xt
        return x


class AMPBlock2(nn.Module):
    """convs1-only variant (bigvgan.py:146-243)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    activation: str = "snakebeta"
    logscale: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = AAAct(self.channels, self.activation, self.logscale,
                       self.use_pallas, name=f"act_{i}")(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=_get_padding(self.kernel_size, d),
                        weight_norm=True, name=f"convs1_{i}")(xt)
            x = x + xt
        return x


@dataclass(frozen=True)
class BigVGANConfig:
    vocab_size: int = 6561
    input_size: int = 512
    output_size: int = 1024
    mel_bin: int = 80
    resblock: str = "1"
    upsample_rates: Sequence[int] = (4, 4, 4, 4, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    speaker_embedding_dim: int = 512
    cond_in_each_up_layer: bool = True
    activation: str = "snakebeta"
    snake_logscale: bool = True
    encoder1: Optional[ConformerConfig] = None  # optional 2x conformer upsamplers
    encoder2: Optional[ConformerConfig] = None
    use_pallas_act: bool = False  # fused Pallas anti-alias snake kernel


class BigVGAN(nn.Module):
    cfg: BigVGANConfig = field(default_factory=BigVGANConfig)

    @nn.compact
    def __call__(self, token: jax.Array, token_len: jax.Array,
                 speaker_embedding: jax.Array,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        """token [B, T], speaker_embedding [B, spk_dim] ->
        (wav [B, T * prod(rates) * (2x per encoder)], aux mel [B, T', mel_bin])."""
        cfg = self.cfg
        mask = make_non_pad_mask(token_len, token.shape[1])
        x = nn.Embed(cfg.vocab_size, cfg.input_size, name="input_embedding")(
            jnp.maximum(token, 0)) * mask[..., None]
        mel_feat = None
        if cfg.encoder1 is not None:
            x, _ = UpsampleConformerEncoder(cfg.encoder1, name="encoder1")(
                x, token_len, deterministic=deterministic)
            token_len = token_len * 2
        if cfg.encoder2 is not None:
            x, _ = UpsampleConformerEncoder(cfg.encoder2, name="encoder2")(
                x, token_len, deterministic=deterministic)
            token_len = token_len * 2
            mel_feat = nn.Dense(cfg.mel_bin, name="mel_proj")(x)
        x = nn.Dense(cfg.output_size, name="encoder_proj")(x)

        x = Conv1d(cfg.upsample_initial_channel, 7, padding=3, weight_norm=True,
                   name="conv_pre")(x)
        spk = speaker_embedding[:, None, :]  # [B, 1, spk_dim]
        x = x + Conv1d(cfg.upsample_initial_channel, 1, name="cond_layer")(spk)
        if cfg.encoder2 is None:
            mel_feat = nn.Dense(cfg.mel_bin, name="mel_proj")(x)

        block_cls = AMPBlock1 if cfg.resblock == "1" else AMPBlock2
        nk = len(cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = ConvTranspose1d(ch, k, u, padding=(k - u) // 2, weight_norm=True,
                                name=f"ups_{i}")(x)
            if cfg.cond_in_each_up_layer:
                x = x + Conv1d(ch, 1, name=f"conds_{i}")(spk)
            xs = x * 0.0
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                xs = xs + block_cls(ch, rk, rd, cfg.activation, cfg.snake_logscale,
                                    cfg.use_pallas_act,
                                    name=f"resblocks_{i}_{j}")(x)
            x = xs / nk
        x = AAAct(ch, cfg.activation, cfg.snake_logscale, cfg.use_pallas_act,
                  name="activation_post")(x)
        x = Conv1d(1, 7, padding=3, weight_norm=True, name="conv_post")(x)
        return jnp.tanh(x[..., 0]), mel_feat


def import_bigvgan_torch(state_dict, cfg: BigVGANConfig) -> dict:
    """reference BigVGAN state_dict -> params pytree."""
    from cosyvoice_tpu.models.conformer import (_dense,
                                                import_upsample_encoder_torch)
    from cosyvoice_tpu.nn.conv import torch_conv_weight, torch_convT_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def wn_conv(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight_g"]).reshape(1, 1, -1),
                "v": torch_conv_weight(sd[f"{prefix}.weight_v"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def wn_convT(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight_g"]).reshape(1, -1, 1),
                "v": torch_convT_weight(sd[f"{prefix}.weight_v"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def plain_conv(prefix):
        return {"kernel": torch_conv_weight(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def aa_act(prefix):
        p = {"alpha": jnp.asarray(sd[f"{prefix}.act.alpha"])}
        if f"{prefix}.act.beta" in sd:
            p["beta"] = jnp.asarray(sd[f"{prefix}.act.beta"])
        return p

    params = {
        "input_embedding": {"embedding": jnp.asarray(sd["input_embedding.weight"])},
        "encoder_proj": _dense(sd, "encoder_proj"),
        "mel_proj": _dense(sd, "mel_proj"),
        "conv_pre": wn_conv("conv_pre"),
        "conv_post": wn_conv("conv_post"),
        "cond_layer": plain_conv("cond_layer"),
        "activation_post": aa_act("activation_post"),
    }
    for enc_name in ("encoder1", "encoder2"):
        enc_cfg = getattr(cfg, enc_name)
        if enc_cfg is not None:
            esd = {k[len(enc_name) + 1:]: v for k, v in sd.items()
                   if k.startswith(enc_name + ".")}
            params[enc_name] = import_upsample_encoder_torch(esd, enc_cfg)["params"]
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        params[f"ups_{i}"] = wn_convT(f"ups.{i}.0")
        if cfg.cond_in_each_up_layer:
            params[f"conds_{i}"] = plain_conv(f"conds.{i}")
        for j in range(nk):
            pre = f"resblocks.{i * nk + j}"
            bp = {}
            ndil = len(cfg.resblock_dilation_sizes[j])
            for di in range(ndil):
                bp[f"convs1_{di}"] = wn_conv(f"{pre}.convs1.{di}")
                if cfg.resblock == "1":
                    bp[f"convs2_{di}"] = wn_conv(f"{pre}.convs2.{di}")
            n_acts = 2 * ndil if cfg.resblock == "1" else ndil
            for ai in range(n_acts):
                bp[f"act_{ai}"] = aa_act(f"{pre}.activations.{ai}")
            params[f"resblocks_{i}_{j}"] = bp
    return {"params": params}
