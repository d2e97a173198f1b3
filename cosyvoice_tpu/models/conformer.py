"""Conformer encoder stack with Transformer-XL/espnet relative attention.

Behavioral spec (wenet lineage): reference `cosyvoice/transformer/` —
attention.py:200-330 (RelPositionMultiHeadedAttention: u/v bias terms,
rel_shift), embedding.py:201-294 (EspnetRelPositionalEncoding: symmetric
+-positions, pe length 2T-1, sqrt(d) input scale), encoder_layer.py:109-237
(pre-norm macaron/attn/conv/ffn with eps 1e-12 norms), convolution.py:24-145
(GLU pointwise + depthwise conv module), subsampling.py:69-114
(LinearNoSubsampling: Dense + LayerNorm eps 1e-5),
upsample_encoder.py:37-320 (PreLookaheadLayer, Upsample1D, 6+4-block
UpsampleConformerEncoder used as the CosyVoice2 flow encoder).

TPU-first: everything takes static shapes and boolean masks; the rel-shift is
the O(T^2) pad/reshape trick (pure reshapes, no gather); layers are plain
linen modules so the whole encoder fuses into one jit region.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.activations import swish
from cosyvoice_tpu.ops.masks import NEG_INF, add_chunk_mask, make_non_pad_mask


@lru_cache(maxsize=None)
def _espnet_rel_pos_np(T: int, d: int) -> np.ndarray:
    """[1, 2T-1, d] rel-pos table: index m <-> relative distance r = T-1-m."""
    pos = np.arange(T, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(np.log(10000.0) / d))
    pe_pos = np.zeros((T, d), np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((T, d), np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)
    return pe[None]


def espnet_rel_pos_emb(T: int, d: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_espnet_rel_pos_np(T, d), dtype)


def rel_shift(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] -> [B, H, T, T]: out[..., i, j] = x[..., i, T-1-i+j]."""
    B, H, T, L = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(B, H, L + 1, T)[:, :, 1:].reshape(B, H, T, L)
    return x[..., : (L + 1) // 2]


class RelPositionAttention(nn.Module):
    """Multi-head attention with espnet relative position bias.

    mask: bool [B, 1|Tq, Tk] (True == attend) or None for full attention.
    """

    heads: int
    dim: int
    key_bias: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, q_in: jax.Array, kv_in: jax.Array, pos_emb: jax.Array,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        H, D = self.heads, self.dim // self.heads
        q = nn.Dense(self.dim, name="linear_q")(q_in)
        k = nn.Dense(self.dim, use_bias=self.key_bias, name="linear_k")(kv_in)
        v = nn.Dense(self.dim, name="linear_v")(kv_in)
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, D)
        k = k.reshape(B, Tk, H, D)
        v = v.reshape(B, Tk, H, D)
        p = nn.Dense(self.dim, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(pos_emb.shape[0], -1, H, D)
        ub = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, D))
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, D))

        ac = jnp.einsum("bihd,bjhd->bhij", q + ub, k)
        bd = jnp.einsum("bihd,bjhd->bhij", q + vb, p)
        if bd.shape != ac.shape:
            bd = rel_shift(bd)[..., :Tk]
        scores = (ac + bd) / np.sqrt(D)
        if mask is not None:
            m = mask[:, None, :, :]  # [B, 1, 1|Tq, Tk]
            scores = jnp.where(m, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout_rate, deterministic=False)(attn)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, Tq, self.dim)
        return nn.Dense(self.dim, name="linear_out")(out)


class PositionwiseFeedForward(nn.Module):
    hidden: int
    dim: int
    dropout_rate: float = 0.0
    activation: str = "swish"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden, name="w_1")(x)
        x = {"swish": swish, "relu": jax.nn.relu, "gelu": jax.nn.gelu}[self.activation](x)
        if self.dropout_rate > 0.0 and not deterministic:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        return nn.Dense(self.dim, name="w_2")(x)


class ConvolutionModule(nn.Module):
    """Conformer conv module: GLU pointwise -> depthwise -> norm -> swish -> pointwise."""

    channels: int
    kernel_size: int = 15
    causal: bool = False
    norm: str = "batch_norm"
    activation: str = "swish"

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        x = Conv1d(2 * self.channels, 1, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        if self.causal:
            pad = (self.kernel_size - 1, 0)
        else:
            pad = ((self.kernel_size - 1) // 2,) * 2
        x = Conv1d(self.channels, self.kernel_size, padding=pad,
                   groups=self.channels, name="depthwise_conv")(x)
        if self.norm == "layer_norm":
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        else:
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name="norm")(x)
        x = {"swish": swish, "relu": jax.nn.relu}[self.activation](x)
        x = Conv1d(self.channels, 1, name="pointwise_conv2")(x)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        return x


@dataclass(frozen=True)
class ConformerConfig:
    dim: int = 512
    heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.1
    input_size: int = 512
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 15
    cnn_causal: bool = False
    cnn_norm: str = "batch_norm"
    key_bias: bool = True
    activation: str = "swish"
    static_chunk_size: int = 0


class ConformerEncoderLayer(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, pos_emb: jax.Array,
                 attn_mask: Optional[jax.Array], pad_mask: Optional[jax.Array],
                 deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        drop = lambda y: (nn.Dropout(cfg.dropout_rate, deterministic=False)(y)
                          if cfg.dropout_rate > 0.0 and not deterministic else y)
        ff_scale = 0.5 if cfg.macaron_style else 1.0
        if cfg.macaron_style:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            h = PositionwiseFeedForward(cfg.linear_units, cfg.dim, cfg.dropout_rate,
                                        cfg.activation, name="ff_macaron")(h, deterministic)
            x = x + ff_scale * drop(h)
        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        h = RelPositionAttention(cfg.heads, cfg.dim, cfg.key_bias,
                                 cfg.attention_dropout_rate, name="self_attn")(
            h, h, pos_emb, attn_mask, deterministic)
        x = x + drop(h)
        if cfg.use_cnn_module:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_conv")(x)
            h = ConvolutionModule(cfg.dim, cfg.cnn_module_kernel, cfg.cnn_causal,
                                  cfg.cnn_norm, cfg.activation, name="conv_module")(
                h, pad_mask, train=not deterministic)
            x = x + drop(h)
        h = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        h = PositionwiseFeedForward(cfg.linear_units, cfg.dim, cfg.dropout_rate,
                                    cfg.activation, name="ff")(h, deterministic)
        x = x + ff_scale * drop(h)
        if cfg.use_cnn_module:
            x = nn.LayerNorm(epsilon=1e-12, name="norm_final")(x)
        return x


class LinearEmbed(nn.Module):
    """LinearNoSubsampling: Dense -> LayerNorm(1e-5) [-> dropout], then xscale."""

    dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.dim, name="linear")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.dropout_rate > 0.0 and not deterministic:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        return x * np.sqrt(self.dim)


class ConformerEncoder(nn.Module):
    """Generic full-context / chunk-masked conformer (reference encoder.py:388)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, xs: jax.Array, lens: jax.Array,
                 chunk_size: Optional[jax.Array] = None,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        T = xs.shape[1]
        pad = make_non_pad_mask(lens, T)
        xs = LinearEmbed(cfg.dim, cfg.dropout_rate, name="embed")(xs, deterministic)
        pos_emb = espnet_rel_pos_emb(T, cfg.dim, xs.dtype)
        attn_mask = add_chunk_mask(pad, cfg.static_chunk_size, chunk_size)
        for i in range(cfg.num_blocks):
            xs = ConformerEncoderLayer(cfg, name=f"layers_{i}")(
                xs, pos_emb, attn_mask, pad, deterministic)
        xs = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs)
        return xs, pad


class PreLookaheadLayer(nn.Module):
    """Right-pad lookahead conv + causal conv, residual (upsample_encoder.py:66-96)."""

    channels: int
    pre_lookahead_len: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        la = self.pre_lookahead_len
        if context is not None:
            # streaming: real lookahead tokens instead of zero pad (v2 encoder)
            h = jnp.concatenate([x, context[:, :la]], axis=1)
        else:
            h = jnp.pad(x, ((0, 0), (0, la), (0, 0)))
        h = Conv1d(self.channels, la + 1, name="conv1")(h)
        h = jax.nn.leaky_relu(h, 0.01)
        h = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
        h = Conv1d(self.channels, 3, name="conv2")(h)
        return h + x


class Upsample1D(nn.Module):
    """Nearest x`stride` upsample, left zero-pad 2*stride, conv k=2*stride+1."""

    channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(x, self.stride, axis=1)
        x = jnp.pad(x, ((0, 0), (self.stride * 2, 0), (0, 0)))
        return Conv1d(self.channels, self.stride * 2 + 1, name="conv")(x)


class UpsampleConformerEncoder(nn.Module):
    """CosyVoice2 flow encoder: lookahead -> 6 blocks -> x2 upsample -> 4 blocks.

    Reference `transformer/upsample_encoder.py:99-320`.  static_chunk_size
    doubles after the upsample (reference :295).
    """

    cfg: ConformerConfig
    up_blocks: int = 4
    pre_lookahead_len: int = 3
    up_stride: int = 2

    @nn.compact
    def __call__(self, xs: jax.Array, lens: jax.Array,
                 streaming: bool = False,
                 context: Optional[jax.Array] = None,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        T = xs.shape[1]
        pad = make_non_pad_mask(lens, T)
        xs = LinearEmbed(cfg.dim, cfg.dropout_rate, name="embed")(xs, deterministic)
        pos_emb = espnet_rel_pos_emb(T, cfg.dim, xs.dtype)
        chunk = cfg.static_chunk_size if streaming else 0
        attn_mask = add_chunk_mask(pad, chunk)
        xs = PreLookaheadLayer(cfg.dim, self.pre_lookahead_len,
                               name="pre_lookahead_layer")(xs, context)
        for i in range(cfg.num_blocks):
            xs = ConformerEncoderLayer(cfg, name=f"encoders_{i}")(
                xs, pos_emb, attn_mask, pad, deterministic)

        xs = Upsample1D(cfg.dim, self.up_stride, name="up_layer")(xs)
        lens2 = lens * self.up_stride
        T2 = xs.shape[1]
        pad2 = make_non_pad_mask(lens2, T2)
        xs = LinearEmbed(cfg.dim, cfg.dropout_rate, name="up_embed")(xs, deterministic)
        pos_emb2 = espnet_rel_pos_emb(T2, cfg.dim, xs.dtype)
        attn_mask2 = add_chunk_mask(pad2, chunk * self.up_stride if streaming else 0)
        for i in range(self.up_blocks):
            xs = ConformerEncoderLayer(cfg, name=f"up_encoders_{i}")(
                xs, pos_emb2, attn_mask2, pad2, deterministic)
        xs = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs)
        return xs, pad2


# --------------------------------------------------------------------------
# torch checkpoint import
# --------------------------------------------------------------------------

def _dense(sd, prefix, bias=True):
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
    return p


def _ln(sd, prefix):
    return {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))}


def _conv(sd, prefix):
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    p = {"kernel": torch_conv_weight(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
    return p


def import_conformer_layer(sd, prefix, cfg: ConformerConfig) -> dict:
    p = {
        "norm_mha": _ln(sd, f"{prefix}.norm_mha"),
        "norm_ff": _ln(sd, f"{prefix}.norm_ff"),
        "self_attn": {
            "linear_q": _dense(sd, f"{prefix}.self_attn.linear_q"),
            "linear_k": _dense(sd, f"{prefix}.self_attn.linear_k"),
            "linear_v": _dense(sd, f"{prefix}.self_attn.linear_v"),
            "linear_out": _dense(sd, f"{prefix}.self_attn.linear_out"),
            "linear_pos": _dense(sd, f"{prefix}.self_attn.linear_pos", bias=False),
            "pos_bias_u": jnp.asarray(np.asarray(sd[f"{prefix}.self_attn.pos_bias_u"])),
            "pos_bias_v": jnp.asarray(np.asarray(sd[f"{prefix}.self_attn.pos_bias_v"])),
        },
        "ff": {"w_1": _dense(sd, f"{prefix}.feed_forward.w_1"),
               "w_2": _dense(sd, f"{prefix}.feed_forward.w_2")},
    }
    if cfg.macaron_style:
        p["norm_ff_macaron"] = _ln(sd, f"{prefix}.norm_ff_macaron")
        p["ff_macaron"] = {"w_1": _dense(sd, f"{prefix}.feed_forward_macaron.w_1"),
                           "w_2": _dense(sd, f"{prefix}.feed_forward_macaron.w_2")}
    if cfg.use_cnn_module:
        p["norm_conv"] = _ln(sd, f"{prefix}.norm_conv")
        p["norm_final"] = _ln(sd, f"{prefix}.norm_final")
        cm = {"pointwise_conv1": _conv(sd, f"{prefix}.conv_module.pointwise_conv1"),
              "pointwise_conv2": _conv(sd, f"{prefix}.conv_module.pointwise_conv2"),
              "depthwise_conv": _conv(sd, f"{prefix}.conv_module.depthwise_conv")}
        if cfg.cnn_norm == "layer_norm":
            cm["norm"] = _ln(sd, f"{prefix}.conv_module.norm")
        else:
            cm["norm"] = {"scale": jnp.asarray(np.asarray(sd[f"{prefix}.conv_module.norm.weight"])),
                          "bias": jnp.asarray(np.asarray(sd[f"{prefix}.conv_module.norm.bias"]))}
        p["conv_module"] = cm
    return p


def import_upsample_encoder_torch(state_dict, cfg: ConformerConfig,
                                  up_blocks: int = 4) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {
        "embed": {"linear": _dense(sd, "embed.out.0"), "norm": _ln(sd, "embed.out.1")},
        "up_embed": {"linear": _dense(sd, "up_embed.out.0"), "norm": _ln(sd, "up_embed.out.1")},
        "pre_lookahead_layer": {"conv1": _conv(sd, "pre_lookahead_layer.conv1"),
                                "conv2": _conv(sd, "pre_lookahead_layer.conv2")},
        "up_layer": {"conv": _conv(sd, "up_layer.conv")},
        "after_norm": _ln(sd, "after_norm"),
    }
    for i in range(cfg.num_blocks):
        params[f"encoders_{i}"] = import_conformer_layer(sd, f"encoders.{i}", cfg)
    for i in range(up_blocks):
        params[f"up_encoders_{i}"] = import_conformer_layer(sd, f"up_encoders.{i}", cfg)
    return {"params": params}


def import_conformer_encoder_torch(state_dict, cfg: ConformerConfig) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {
        "embed": {"linear": _dense(sd, "embed.out.0"), "norm": _ln(sd, "embed.out.1")},
        "after_norm": _ln(sd, "after_norm"),
    }
    for i in range(cfg.num_blocks):
        params[f"layers_{i}"] = import_conformer_layer(sd, f"encoders.{i}", cfg)
    return {"params": params}
