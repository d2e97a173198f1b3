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
    """[B, H, T, 2T-1] -> [B, H, T, T]: out[..., i, j] = x[..., i, T-1-i+j].

    The pad/reshape/slice skew trick (`transformer/attention.py:225-247`).
    NOTE: a per-element gather formulation is catastrophically slow on TPU
    (scalar gather, ~100x worse) — keep the skew.  Callers on the hot path
    should prefer `rel_shift_prepadded` (pad folded into the bd matmul)."""
    B, H, T, L = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    return rel_shift_prepadded(x)[..., : (L + 1) // 2]


def rel_shift_prepadded(x: jax.Array) -> jax.Array:
    """Skew for an already left-padded [B, H, T, 2T] input: returns
    [B, H, T, 2T-1] with out[..., i, j] = x[..., i, T-i+j].

    Separated so the zero pad column can be folded into the producing
    matmul (one extra zero row on the rel-pos table) instead of costing a
    GB-scale pad pass on the [B, H, T, 2T-1] score tensor."""
    B, H, T, L1 = x.shape
    x = x.reshape(B, H, L1, T)[:, :, 1:].reshape(B, H, T, L1 - 1)
    return x


class RelPositionAttention(nn.Module):
    """Multi-head attention with espnet relative position bias.

    Two entry points sharing one parameter set:
      * __call__: full/chunk-masked attention (training, encoders)
      * decode:   one query token against a static KV cache buffer — the
        Tq=1 degenerate of rel_shift is direct indexing by key distance, so
        bd comes from a reversed rel-pos table + dynamic slice.
    """

    heads: int
    dim: int
    key_bias: bool = True
    dropout_rate: float = 0.0

    def setup(self):
        H, D = self.heads, self.dim // self.heads
        self.linear_q = nn.Dense(self.dim)
        self.linear_k = nn.Dense(self.dim, use_bias=self.key_bias)
        self.linear_v = nn.Dense(self.dim)
        self.linear_out = nn.Dense(self.dim)
        self.linear_pos = nn.Dense(self.dim, use_bias=False)
        self.pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (H, D))
        self.pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (H, D))
        # declared here (not inline) — submodules in a setup-style module must
        # be created in setup(); needs an apply-time "dropout" rng when active
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, q_in: jax.Array, kv_in: jax.Array, pos_emb: jax.Array,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        H, D = self.heads, self.dim // self.heads
        q = self.linear_q(q_in)
        k = self.linear_k(kv_in)
        v = self.linear_v(kv_in)
        B, Tq = q.shape[:2]
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, D)
        k = k.reshape(B, Tk, H, D)
        v = v.reshape(B, Tk, H, D)
        p = self.linear_pos(pos_emb)
        p = p.reshape(pos_emb.shape[0], -1, H, D)

        ac = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_u, k)
        if p.shape[1] == 2 * Tq - 1:
            # espnet full-table rel-pos: fold rel_shift's zero pad column
            # into the (tiny) projected table so the skew needs no pad pass
            # over the [B, H, Tq, 2Tq] score tensor
            p = jnp.pad(p, ((0, 0), (1, 0), (0, 0), (0, 0)))
            bd = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_v, p)
            bd = rel_shift_prepadded(bd)[..., :Tk]
        else:
            bd = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_v, p)
        scores = (ac + bd) / float(np.sqrt(D))
        if mask is not None:
            m = mask[:, None, :, :]  # [B, 1, 1|Tq, Tk]
            scores = jnp.where(m, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = jnp.where(m, attn, 0.0)
        else:
            attn = jax.nn.softmax(scores, axis=-1)
        if self.dropout_rate > 0.0 and not deterministic:
            attn = self.attn_dropout(attn, deterministic=False)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, Tq, self.dim)
        return self.linear_out(out)

    def decode(self, q_in: jax.Array, layer_k: jax.Array, layer_v: jax.Array,
               pos: jax.Array, valid: jax.Array):
        """q_in [B, 1, dim]; layer_k/v [B, Tmax, H, D] cache buffers; pos:
        scalar write slot; valid [B, Tmax] key mask.
        Returns (out [B, 1, dim], new_k, new_v)."""
        H, D = self.heads, self.dim // self.heads
        B = q_in.shape[0]
        Tmax = layer_k.shape[1]
        q = self.linear_q(q_in).reshape(B, 1, H, D)
        k = self.linear_k(q_in).reshape(B, 1, H, D)
        v = self.linear_v(q_in).reshape(B, 1, H, D)
        layer_k = jax.lax.dynamic_update_slice(layer_k, k, (0, pos, 0, 0))
        layer_v = jax.lax.dynamic_update_slice(layer_v, v, (0, pos, 0, 0))

        table = espnet_rel_pos_emb(Tmax, self.dim, q_in.dtype)  # [1, 2Tmax-1, dim]
        p = self.linear_pos(table).reshape(1, -1, H, D)
        ac = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_u, layer_k)
        bd_full = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_v, p)
        # slot j <-> table index (Tmax-1) - pos + j
        bd = jax.lax.dynamic_slice_in_dim(bd_full, Tmax - 1 - pos, Tmax, axis=3)
        scores = (ac + bd) / float(np.sqrt(D))
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, layer_v).reshape(B, 1, self.dim)
        return self.linear_out(out), layer_k, layer_v

    def chunk_decode(self, x: jax.Array, layer_k: jax.Array,
                     layer_v: jax.Array, pos: jax.Array, bias: jax.Array):
        """M new rows against a static cache (the incremental streaming
        twin of __call__ — flow_chunk.py drives it per flow-encoder layer).

        x [B, M, dim] new rows at absolute positions pos_b + i (pos [B]
        per-row frontiers); layer_k/v [B, Tcap, H, D] cache buffers (K/V of
        the new rows are written at pos before attending); bias [B, M, Tcap]
        additive (carries pad validity + the anchored chunk mask).  Returns
        (out [B, M, dim], new_k, new_v).

        The rel-pos bd term generalizes `decode`'s Tq=1 slice to M queries:
        bd[i, j] must read the espnet table at index (Tcap-1) - (pos+i) + j,
        which after a per-row slice is the standard rel_shift skew with a
        dynamic offset (see the index algebra inline)."""
        H, D = self.heads, self.dim // self.heads
        B, M = x.shape[:2]
        Tcap = layer_k.shape[1]
        q = self.linear_q(x).reshape(B, M, H, D)
        k = self.linear_k(x).reshape(B, M, H, D)
        v = self.linear_v(x).reshape(B, M, H, D)
        upd = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
            c, u, (p, 0, 0)))
        layer_k = upd(layer_k, k.astype(layer_k.dtype), pos)
        layer_v = upd(layer_v, v.astype(layer_v.dtype), pos)

        table = espnet_rel_pos_emb(Tcap, self.dim, x.dtype)  # [1, 2Tcap-1, d]
        p_t = self.linear_pos(table).reshape(1, -1, H, D)
        ac = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_u, layer_k)
        bd_full = jnp.einsum("bihd,bjhd->bhij", q + self.pos_bias_v, p_t)
        # want bd[i, j] = bd_full[i, (Tcap-1) - (pos+i) + j].  Pad left 1
        # (indices shift +1), slice per row at s0 = Tcap - pos - M (>= 0
        # while pos + M <= Tcap) to width W = M + Tcap, then the rel_shift
        # reshape trick gives out[i, j] = sliced[i, M - i + j] — exactly the
        # wanted index: (M - i + j) + s0 = Tcap - pos - i + j.
        bd_full = jnp.pad(bd_full, ((0, 0), (0, 0), (0, 0), (1, 0)))
        W = M + Tcap
        sl = jax.vmap(lambda bf, s: jax.lax.dynamic_slice(
            bf, (0, 0, s), (H, M, W)))(bd_full, Tcap - pos - M)
        bd = sl.reshape(B, H, W, M)[:, :, 1:, :].reshape(B, H, M, W - 1)[..., :Tcap]
        scores = (ac + bd) / float(np.sqrt(D)) + bias[:, None]
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, layer_v
                         ).reshape(B, M, self.dim)
        return self.linear_out(out), layer_k, layer_v


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


def sinusoidal_pos_emb(T: int, d: int, offset: int = 0,
                       dtype=jnp.float32) -> jax.Array:
    """Absolute sinusoidal table [1, T, d] (reference PositionalEncoding,
    transformer/embedding.py:26-117: interleaved sin/cos; caller adds it to
    x * sqrt(d)).  `offset` gives the streaming slice (position_encoding)."""
    pos = np.arange(offset, offset + T, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(np.log(10000.0) / d))
    pe = np.zeros((T, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe[None], dtype)


def whisper_pos_emb(T: int, d: int, dtype=jnp.float32) -> jax.Array:
    """openai-whisper encoder sinusoids [1, T, d] (embedding.py:150-165:
    concatenated sin|cos, log-timescales over d//2; xscale 1)."""
    inc = np.log(10000.0) / (d // 2 - 1)
    inv = np.exp(-inc * np.arange(d // 2, dtype=np.float32))
    t = np.arange(T, dtype=np.float32)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(t), np.cos(t)], axis=1)[None],
                       dtype)


class LearnablePositionalEncoding(nn.Module):
    """whisper-decoder style learned positions (embedding.py:167-175);
    xscale 1, table is a parameter."""

    max_len: int = 448

    @nn.compact
    def __call__(self, x: jax.Array, offset: int = 0) -> tuple[jax.Array, jax.Array]:
        d = x.shape[-1]
        pe = self.param("pe", nn.initializers.normal(0.02),
                        (1, self.max_len, d))
        emb = jax.lax.dynamic_slice(pe, (0, offset, 0), (1, x.shape[1], d))
        return x + emb.astype(x.dtype), emb.astype(x.dtype)


def no_pos_emb(T: int, d: int, dtype=jnp.float32) -> jax.Array:
    """NoPositionalEncoding (embedding.py:178-198): zero vector for
    interface compatibility."""
    return jnp.zeros((1, T, d), dtype)


class MoEFFNLayer(nn.Module):
    """Mixture-of-experts positionwise FFN (reference
    transformer/positionwise_feed_forward.py:58-115: linear router, top-k
    experts per token, softmax over the selected logits).

    TPU-native form: every expert runs on every token (dense einsum over a
    stacked expert dim — static shapes, MXU-friendly) and the top-k mask
    weights the sum; identical math to the reference's gather/scatter loop.
    At scale the expert dim shards on the mesh "model" axis like any other
    ffn kernel.  Unused by the shipped configs, as in the reference.
    """

    n_expert: int
    n_expert_per_token: int
    hidden: int
    dim: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        E, H, D = self.n_expert, self.hidden, self.dim
        router = nn.Dense(E, use_bias=False, name="gate")(x)  # [B, T, E]
        logits, idx = jax.lax.top_k(router, self.n_expert_per_token)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                                 ).astype(x.dtype)            # [B, T, k]
        # scatter selected weights back to a dense [B, T, E] gate
        dense_gate = jax.nn.one_hot(idx, E, dtype=x.dtype) * weights[..., None]
        dense_gate = jnp.sum(dense_gate, axis=-2)              # [B, T, E]
        act = {"swish": swish, "relu": jax.nn.relu,
               "gelu": jax.nn.gelu}[self.activation]
        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, D, H))
        b1 = self.param("b1", nn.initializers.zeros, (E, H))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, H, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        h = act(jnp.einsum("btd,edh->bteh", x, w1) + b1[None, None])
        y = jnp.einsum("bteh,ehd->bted", h, w2) + b2[None, None]
        return jnp.einsum("bted,bte->btd", y, dense_gate)


class EmbedNoSubsampling(nn.Module):
    """EmbedinigNoSubsampling (subsampling.py:35-66): id embedding, no rate
    change; positional encoding applied by the caller (wenet passes the
    pos_enc class in; here encoders own their rel-pos tables)."""

    vocab: int
    odim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array):
        return nn.Embed(self.vocab, self.odim, name="embed")(x), mask


class Conv1dSubsampling2(nn.Module):
    """Whisper-style 1/2-rate conv frontend (subsampling.py:116-170):
    conv1d(k3,p1) -> GELU -> conv1d(k3,s2,p1) -> GELU; mask sliced
    [(T+1)%2::2]."""

    odim: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array):
        T = x.shape[1]
        x = nn.Conv(self.odim, (3,), padding=((1, 1),), name="conv0")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(self.odim, (3,), strides=(2,), padding=((1, 1),),
                    name="conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return x, mask[:, :, (T + 1) % 2::2]


class _Conv2dSubsampling(nn.Module):
    """Shared body for Conv2dSubsampling4/6/8 (subsampling.py:173-335):
    stack of VALID 2D convs over (time, feat) + ReLU, then a Linear over the
    flattened (channels x reduced-feat)."""

    odim: int
    convs: tuple          # ((kernel, stride), ...)
    mask_slices: tuple    # per-conv python slice over the time mask

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array):
        h = x[..., None]  # [B, T, F, 1] (NHWC; torch uses NCHW channel 1)
        for i, (k, s) in enumerate(self.convs):
            h = nn.Conv(self.odim, (k, k), strides=(s, s), padding="VALID",
                        name=f"conv{i}")(h)
            h = jax.nn.relu(h)
        B, T2, F2, C = h.shape
        # torch flattens channel-major: view(b, t, c * f)
        h = h.transpose(0, 1, 3, 2).reshape(B, T2, C * F2)
        h = nn.Dense(self.odim, name="out")(h)
        for sl in self.mask_slices:
            mask = mask[:, :, sl]
        return h, mask


def Conv2dSubsampling4(odim: int) -> _Conv2dSubsampling:
    return _Conv2dSubsampling(odim, ((3, 2), (3, 2)),
                              (slice(2, None, 2), slice(2, None, 2)))


def Conv2dSubsampling6(odim: int) -> _Conv2dSubsampling:
    return _Conv2dSubsampling(odim, ((3, 2), (5, 3)),
                              (slice(2, None, 2), slice(4, None, 3)))


def Conv2dSubsampling8(odim: int) -> _Conv2dSubsampling:
    return _Conv2dSubsampling(odim, ((3, 2), (3, 2), (3, 2)),
                              (slice(2, None, 2),) * 3)


def import_conv2d_subsampling_torch(sd, n_convs: int) -> dict:
    """torch Conv2dSubsampling* state_dict -> params (conv.{0,2,4} + out/linear)."""
    params = {}
    for i in range(n_convs):
        w = np.asarray(sd[f"conv.{2 * i}.weight"])  # [O, 1|O, kh, kw]
        params[f"conv{i}"] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                              "bias": jnp.asarray(sd[f"conv.{2 * i}.bias"])}
    lw = sd.get("out.0.weight", sd.get("linear.weight"))
    lb = sd.get("out.0.bias", sd.get("linear.bias"))
    params["out"] = {"kernel": jnp.asarray(np.asarray(lw).T),
                     "bias": jnp.asarray(lb)}
    return {"params": params}


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
    input_layer: str = "linear"  # linear | linear_legacy
    spk_adapt: bool = False      # per-layer speaker injection (encoder.py:478)
    spk_emb_size: int = 512
    # positionwise layer: "ffn" | "moe" (reference MoEFFNLayer — present in
    # the inventory but unused by shipped configs; class_utils has no map
    # entry for it either)
    ffn_type: str = "ffn"
    n_expert: int = 8
    n_expert_per_token: int = 2


class ConformerEncoderLayer(nn.Module):
    cfg: ConformerConfig

    def setup(self):
        cfg = self.cfg
        # SpkAdapt layers use eps 1e-5 norms (encoder_layer.py:278-281)
        eps = 1e-5 if cfg.spk_adapt else 1e-12
        if cfg.spk_adapt:
            self.spk_linear = nn.Dense(cfg.dim)
        self.norm_mha = nn.LayerNorm(epsilon=eps)
        self.norm_ff = nn.LayerNorm(epsilon=eps)
        # residual-path dropout (encoder_layer.py:160,186); created in setup
        # because this is a setup-style module
        self.res_dropout = nn.Dropout(cfg.dropout_rate)
        self.self_attn = RelPositionAttention(cfg.heads, cfg.dim, cfg.key_bias,
                                              cfg.attention_dropout_rate)
        if cfg.ffn_type == "moe":
            self.ff = MoEFFNLayer(cfg.n_expert, cfg.n_expert_per_token,
                                  cfg.linear_units, cfg.dim, cfg.activation)
        else:
            self.ff = PositionwiseFeedForward(cfg.linear_units, cfg.dim,
                                              cfg.dropout_rate, cfg.activation)
        if cfg.macaron_style:
            self.norm_ff_macaron = nn.LayerNorm(epsilon=1e-12)
            self.ff_macaron = PositionwiseFeedForward(
                cfg.linear_units, cfg.dim, cfg.dropout_rate, cfg.activation)
        if cfg.use_cnn_module:
            self.norm_conv = nn.LayerNorm(epsilon=1e-12)
            self.norm_final = nn.LayerNorm(epsilon=1e-12)
            self.conv_module = ConvolutionModule(cfg.dim, cfg.cnn_module_kernel,
                                                 cfg.cnn_causal, cfg.cnn_norm,
                                                 cfg.activation)

    def __call__(self, x: jax.Array, pos_emb: jax.Array,
                 attn_mask: Optional[jax.Array], pad_mask: Optional[jax.Array],
                 deterministic: bool = True,
                 spk_emb: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.cfg
        drop = lambda y: (self.res_dropout(y, deterministic=False)
                          if cfg.dropout_rate > 0.0 and not deterministic else y)
        if cfg.spk_adapt and spk_emb is not None:
            # speaker adaptation at layer entry (encoder_layer.py:325-327)
            x = x + self.spk_linear(spk_emb)[:, None, :]
        ff_scale = 0.5 if cfg.macaron_style else 1.0
        if cfg.macaron_style:
            h = self.norm_ff_macaron(x)
            h = self.ff_macaron(h, deterministic)
            x = x + ff_scale * drop(h)
        h = self.norm_mha(x)
        h = self.self_attn(h, h, pos_emb, attn_mask, deterministic)
        x = x + drop(h)
        if cfg.use_cnn_module:
            h = self.norm_conv(x)
            h = self.conv_module(h, pad_mask, train=not deterministic)
            x = x + drop(h)
        h = self.norm_ff(x)
        h = self.ff(h, deterministic)
        x = x + ff_scale * drop(h)
        if cfg.use_cnn_module:
            x = self.norm_final(x)
        return x

    def decode(self, x, layer_k, layer_v, pos, valid):
        """One-token streaming step (no conv module support)."""
        cfg = self.cfg
        ff_scale = 0.5 if cfg.macaron_style else 1.0
        if cfg.macaron_style:
            x = x + ff_scale * self.ff_macaron(self.norm_ff_macaron(x))
        h, layer_k, layer_v = self.self_attn.decode(
            self.norm_mha(x), layer_k, layer_v, pos, valid)
        x = x + h
        x = x + ff_scale * self.ff(self.norm_ff(x))
        return x, layer_k, layer_v

    def chunk(self, x, layer_k, layer_v, pos, bias):
        """M-row incremental step over a static KV cache.  Supports the
        flow-encoder config only (no macaron FFN, no conv module — the conv
        module spans time and would need its own history cache)."""
        cfg = self.cfg
        assert not cfg.macaron_style and not cfg.use_cnn_module
        h, layer_k, layer_v = self.self_attn.chunk_decode(
            self.norm_mha(x), layer_k, layer_v, pos, bias)
        x = x + h
        x = x + self.ff(self.norm_ff(x))
        return x, layer_k, layer_v


class LinearEmbed(nn.Module):
    """LinearNoSubsampling: Dense -> LayerNorm(1e-5) [-> dropout], then xscale.
    legacy=True adds the trailing ReLU of LegacyLinearNoSubsampling
    (subsampling.py:338-383, the v1 LLM's 'linear_legacy' input layer)."""

    dim: int
    dropout_rate: float = 0.1
    legacy: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.dim, name="linear")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.dropout_rate > 0.0 and not deterministic:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        if self.legacy:
            x = jax.nn.relu(x)
        return x * float(np.sqrt(self.dim))


class ConformerEncoder(nn.Module):
    """Generic full-context / chunk-masked conformer (reference encoder.py:388)
    with streaming twins (prefill / decode_step over ConformerKVCache) that
    replace wenet's forward_chunk concat-grow protocol (encoder.py:184-273)."""

    cfg: ConformerConfig

    def setup(self):
        cfg = self.cfg
        self.embed = LinearEmbed(cfg.dim, cfg.dropout_rate,
                                 legacy=cfg.input_layer == "linear_legacy")
        self.layers = [ConformerEncoderLayer(cfg, name=f"layers_{i}")
                       for i in range(cfg.num_blocks)]
        self.after_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, xs: jax.Array, lens: jax.Array,
                 chunk_size: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 spk_emb: Optional[jax.Array] = None) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        T = xs.shape[1]
        pad = make_non_pad_mask(lens, T)
        xs = self.embed(xs, deterministic)
        pos_emb = espnet_rel_pos_emb(T, cfg.dim, xs.dtype)
        attn_mask = add_chunk_mask(pad, cfg.static_chunk_size, chunk_size)
        for layer in self.layers:
            xs = layer(xs, pos_emb, attn_mask, pad, deterministic, spk_emb)
        xs = self.after_norm(xs)
        return xs, pad

    def _decode_one(self, x, cache_k, cache_v, pos, valid):
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, lk, lv = layer.decode(x, cache_k[i], cache_v[i], pos, valid)
            new_k.append(lk)
            new_v.append(lv)
        return self.after_norm(x), jnp.stack(new_k), jnp.stack(new_v)

    def prefill(self, xs: jax.Array, cache: "ConformerKVCache"
                ) -> tuple[jax.Array, "ConformerKVCache"]:
        """Causal pass over a prefix, writing the cache: a lax.scan of the
        one-token decode (numerically identical to chunked forward_chunk)."""
        B = xs.shape[0]
        xs = self.embed(xs)

        def step(mdl, carry, xt):
            cache_k, cache_v, pos = carry
            valid = jnp.broadcast_to(
                jnp.arange(cache_k.shape[2])[None, :] <= pos,
                (B, cache_k.shape[2]))
            out, k, v = mdl._decode_one(xt[:, None, :], cache_k, cache_v, pos, valid)
            return (k, v, pos + 1), out[:, 0]

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        (k, v, pos), outs = scan(self, (cache.k, cache.v, cache.pos), xs)
        return outs, ConformerKVCache(k, v, pos)

    def decode_step(self, x: jax.Array, cache: "ConformerKVCache"
                    ) -> tuple[jax.Array, "ConformerKVCache"]:
        """x [B, 1, input_size] -> ([B, 1, dim], cache advanced by 1)."""
        B = x.shape[0]
        x = self.embed(x)
        valid = jnp.broadcast_to(
            jnp.arange(cache.k.shape[2])[None, :] <= cache.pos,
            (B, cache.k.shape[2]))
        out, k, v = self._decode_one(x, cache.k, cache.v, cache.pos, valid)
        return out, ConformerKVCache(k, v, cache.pos + 1)


class PreLookaheadLayer(nn.Module):
    """Right-pad lookahead conv + causal conv, residual (upsample_encoder.py:66-96).

    setup-style so the incremental streaming path can drive the same convs
    chunk-by-chunk (chunk method)."""

    channels: int
    pre_lookahead_len: int = 3

    def setup(self):
        self.conv1 = Conv1d(self.channels, self.pre_lookahead_len + 1,
                            name="conv1")
        self.conv2 = Conv1d(self.channels, 3, name="conv2")

    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        la = self.pre_lookahead_len
        if context is not None:
            # streaming: real lookahead tokens instead of zero pad (v2 encoder)
            h = jnp.concatenate([x, context[:, :la]], axis=1)
        else:
            h = jnp.pad(x, ((0, 0), (0, la), (0, 0)))
        h = self.conv1(h)
        h = jax.nn.leaky_relu(h, 0.01)
        h = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
        h = self.conv2(h)
        return h + x

    def chunk(self, x: jax.Array, ctx_buf: jax.Array, hist2: jax.Array
              ) -> tuple[jax.Array, jax.Array]:
        """Incremental step over N new rows.  x [B, N, C] (pad rows zero);
        ctx_buf [B, N+la, C] holds the lookahead rows SCATTERED at each
        row's own valid frontier (zeros elsewhere — callers place the next
        chunk's first `la` embedded tokens there, or nothing on finalize,
        reproducing the one-shot right-zero-pad); hist2 [B, 2, C] = last two
        valid conv2-input rows of the stream (zeros at stream start == the
        one-shot left pad).  Returns (out [B, N, C], conv2-input rows
        [B, 2+N, C] for the caller's history roll)."""
        la = self.pre_lookahead_len
        h = jnp.concatenate([x, jnp.zeros_like(x[:, :la])], axis=1) + ctx_buf
        h = self.conv1(h)                       # no pad: (N+la) -> N rows
        h = jax.nn.leaky_relu(h, 0.01)
        h2in = jnp.concatenate([hist2, h], axis=1)
        h = self.conv2(h2in)                    # no pad: (N+2) -> N rows
        return h + x, h2in


class Upsample1D(nn.Module):
    """Nearest x`stride` upsample, left zero-pad 2*stride, conv k=2*stride+1."""

    channels: int
    stride: int = 2

    def setup(self):
        self.conv = Conv1d(self.channels, self.stride * 2 + 1, name="conv")

    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(x, self.stride, axis=1)
        x = jnp.pad(x, ((0, 0), (self.stride * 2, 0), (0, 0)))
        return self.conv(x)

    def chunk(self, x: jax.Array, hist2: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Incremental step: x [B, N, C] new token-rate rows, hist2 [B, 2, C]
        last two valid token-rate rows (zeros at stream start == the one-shot
        left zero-pad of 2*stride).  Returns (out [B, N*stride, C], conv
        input rows [B, 2+N, C] for the history roll)."""
        xin = jnp.concatenate([hist2, x], axis=1)
        up = jnp.repeat(xin, self.stride, axis=1)   # [B, (2+N)*s, C]
        # one-shot pads 2*stride zeros left then convs (k=2s+1, no pad):
        # output row t covers upsampled rows [t-2s .. t]; with 2 history
        # rows (= 2s upsampled rows) prepended the first N*s outputs after
        # the history region are exactly the chunk's rows
        return self.conv(up), xin


class UpsampleConformerEncoder(nn.Module):
    """CosyVoice2 flow encoder: lookahead -> 6 blocks -> x2 upsample -> 4 blocks.

    Reference `transformer/upsample_encoder.py:99-320`.  static_chunk_size
    doubles after the upsample (reference :295).
    """

    cfg: ConformerConfig
    up_blocks: int = 4
    pre_lookahead_len: int = 3
    up_stride: int = 2
    # v2-flow encoder (upsample_encoder.py:99-320) applies the static chunk
    # mask whenever static_chunk_size > 0 — production sets it to 2*fr
    # (cli/model.py:314) so even non-stream inference is chunk-masked.  The
    # stream-family v2 encoder (upsample_encoder.py:501,514) instead gates
    # the mask on the runtime `streaming` flag — set chunk_always=False.
    chunk_always: bool = True

    def setup(self):
        cfg = self.cfg
        self.embed = LinearEmbed(cfg.dim, cfg.dropout_rate, name="embed")
        self.pre_lookahead_layer = PreLookaheadLayer(
            cfg.dim, self.pre_lookahead_len, name="pre_lookahead_layer")
        self.encoders = tuple(ConformerEncoderLayer(cfg, name=f"encoders_{i}")
                              for i in range(cfg.num_blocks))
        self.up_layer = Upsample1D(cfg.dim, self.up_stride, name="up_layer")
        self.up_embed = LinearEmbed(cfg.dim, cfg.dropout_rate,
                                    name="up_embed")
        self.up_encoders = tuple(
            ConformerEncoderLayer(cfg, name=f"up_encoders_{i}")
            for i in range(self.up_blocks))
        self.after_norm = nn.LayerNorm(epsilon=1e-5, name="after_norm")

    def __call__(self, xs: jax.Array, lens: jax.Array,
                 streaming: bool = False,
                 context: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 chunk_anchor: Optional[jax.Array] = None
                 ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        T = xs.shape[1]
        pad = make_non_pad_mask(lens, T)
        if context is not None:
            # streaming non-finalize chunks: the lookahead context tokens go
            # through the same input embed (upsample_encoder.py:495-498; the
            # positional part is discarded there — rel-pos is handled in
            # attention here, so only the linear embed applies)
            both = self.embed(jnp.concatenate([xs, context], axis=1),
                              deterministic)
            xs, context = both[:, :T], both[:, T:]
        else:
            xs = self.embed(xs, deterministic)
        pos_emb = espnet_rel_pos_emb(T, cfg.dim, xs.dtype)
        chunk = cfg.static_chunk_size if (self.chunk_always or streaming) else 0
        if chunk_anchor is not None and chunk:
            # anchored grid (prompt/gen boundary) — the incremental serving
            # twin (flow_chunk.py); ops/masks.anchored_chunk_ids for why
            from cosyvoice_tpu.ops.masks import anchored_chunk_mask
            attn_mask = anchored_chunk_mask(pad, chunk, chunk_anchor)
        else:
            attn_mask = add_chunk_mask(pad, chunk)
        # zero pad positions before the right-looking lookahead conv: the
        # embed LayerNorm maps zero inputs to its bias (nonzero), and the
        # conv would leak that into the last pre_lookahead_len VALID tokens —
        # the reference runs exact lengths where the conv right-pad is zero
        # (upsample_encoder.py:87), so bucketed padding must look identical
        xs = xs * pad[..., None].astype(xs.dtype)
        xs = self.pre_lookahead_layer(xs, context)
        for layer in self.encoders:
            xs = layer(xs, pos_emb, attn_mask, pad, deterministic)

        xs = self.up_layer(xs)
        lens2 = lens * self.up_stride
        T2 = xs.shape[1]
        pad2 = make_non_pad_mask(lens2, T2)
        xs = self.up_embed(xs, deterministic)
        pos_emb2 = espnet_rel_pos_emb(T2, cfg.dim, xs.dtype)
        if chunk_anchor is not None and chunk:
            from cosyvoice_tpu.ops.masks import anchored_chunk_mask
            attn_mask2 = anchored_chunk_mask(
                pad2, chunk * self.up_stride,
                jnp.asarray(chunk_anchor) * self.up_stride)
        else:
            attn_mask2 = add_chunk_mask(pad2, chunk * self.up_stride)
        for layer in self.up_encoders:
            xs = layer(xs, pos_emb2, attn_mask2, pad2, deterministic)
        xs = self.after_norm(xs)
        return xs, pad2


# --------------------------------------------------------------------------
# streaming decode (static KV cache) — the TPU replacement for wenet's
# forward_chunk concat-grow protocol (reference encoder.py:184-273)
# --------------------------------------------------------------------------

from typing import NamedTuple


class ConformerKVCache(NamedTuple):
    """Per-layer K/V: [L, B, T_max, H, D]; `pos` = filled length."""

    k: jax.Array
    v: jax.Array
    pos: jax.Array

    @staticmethod
    def create(cfg: ConformerConfig, batch: int, max_len: int,
               dtype=jnp.float32) -> "ConformerKVCache":
        H, D = cfg.heads, cfg.dim // cfg.heads
        shape = (cfg.num_blocks, batch, max_len, H, D)
        return ConformerKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                                jnp.zeros((), jnp.int32))


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


def import_conformer_layer(sd, prefix, cfg: ConformerConfig,
                           transformer_layer: bool = False) -> dict:
    """transformer_layer=True maps wenet TransformerEncoderLayer key names
    (norm1/norm2, encoder_layer.py:24-108) onto the same structure."""
    n_mha = "norm1" if transformer_layer else "norm_mha"
    n_ff = "norm2" if transformer_layer else "norm_ff"
    p = {
        "norm_mha": _ln(sd, f"{prefix}.{n_mha}"),
        "norm_ff": _ln(sd, f"{prefix}.{n_ff}"),
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


def import_conformer_encoder_torch(state_dict, cfg: ConformerConfig,
                                   transformer_layer: bool = False) -> dict:
    """Imports both wenet ConformerEncoder and TransformerEncoder (set
    transformer_layer=True for the latter's norm1/norm2 key names)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = {
        "embed": {"linear": _dense(sd, "embed.out.0"), "norm": _ln(sd, "embed.out.1")},
        "after_norm": _ln(sd, "after_norm"),
    }
    for i in range(cfg.num_blocks):
        params[f"layers_{i}"] = import_conformer_layer(sd, f"encoders.{i}", cfg,
                                                       transformer_layer)
    return {"params": params}
