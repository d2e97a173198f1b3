"""wenet-lineage attention decoder stack.

Behavioral spec: reference `cosyvoice/transformer/decoder.py` —
TransformerDecoder:33-255 (embed + abs sinusoidal positions, N pre-norm
DecoderLayers of self-attn (subsequent+pad mask) / cross-attn over encoder
memory / relu FFN, final LayerNorm, vocab output layer) and
BiTransformerDecoder:256+ (left-to-right + right-to-left decoders; the
reverse branch scores reversed label sequences, weighted by reverse_weight
in the loss).  Dead code in the shipped CosyVoice recipes (nothing
instantiates it — the speech LM decodes through the encoder's KV-cached
forward_chunk instead) but part of the transformer stack's surface, so it
ships golden-tested.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.conformer import sinusoidal_pos_emb
from cosyvoice_tpu.models.llm_phoneme import MultiHeadedAttention
from cosyvoice_tpu.ops.masks import make_non_pad_mask


class _DecoderLayer(nn.Module):
    """decoder_layer.py:24-132, pre-norm; src_attention optional (CIF-style
    decoders drop it, decoder.py:72-73)."""

    dim: int
    heads: int
    ffn_hidden: int
    src_attention: bool = True
    key_bias: bool = True

    @nn.compact
    def __call__(self, tgt, tgt_mask, memory, memory_mask):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt = tgt + MultiHeadedAttention(self.heads, self.dim, self.key_bias,
                                         name="self_attn")(h, h, h, tgt_mask)
        if self.src_attention:
            h = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
            tgt = tgt + MultiHeadedAttention(
                self.heads, self.dim, self.key_bias,
                name="src_attn")(h, memory, memory, memory_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        h = nn.Dense(self.ffn_hidden, name="ff_w1")(h)
        h = jax.nn.relu(h)
        return tgt + nn.Dense(self.dim, name="ff_w2")(h)


class TransformerDecoder(nn.Module):
    vocab_size: int
    dim: int
    heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    use_output_layer: bool = True
    src_attention: bool = True
    key_bias: bool = True

    @nn.compact
    def __call__(self, memory: jax.Array, memory_lens: jax.Array,
                 ys_in: jax.Array, ys_in_lens: jax.Array) -> jax.Array:
        """memory [B, Tm, D] encoder output, ys_in [B, To] token ids ->
        logits [B, To, vocab] (pad rows garbage, mask by ys_in_lens)."""
        B, To = ys_in.shape
        x = nn.Embed(self.vocab_size, self.dim, name="embed")(ys_in)
        x = x * np.sqrt(self.dim) + sinusoidal_pos_emb(To, self.dim, dtype=x.dtype)
        sub = jnp.arange(To)[None, :] <= jnp.arange(To)[:, None]
        pad = make_non_pad_mask(ys_in_lens, To)
        tgt_mask = sub[None] & pad[:, None, :]                  # [B, To, To]
        mem_mask = make_non_pad_mask(memory_lens, memory.shape[1])[:, None, :]
        for i in range(self.num_blocks):
            x = _DecoderLayer(self.dim, self.heads, self.linear_units,
                              self.src_attention, self.key_bias,
                              name=f"decoders_{i}")(x, tgt_mask, memory,
                                                    mem_mask)
        x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
        if self.use_output_layer:
            x = nn.Dense(self.vocab_size, name="output_layer")(x)
        return x


class BiTransformerDecoder(nn.Module):
    """decoder.py:256+: left-to-right decoder + right-to-left decoder over
    reversed labels (r_ys_in), combined by reverse_weight in the CE loss."""

    vocab_size: int
    dim: int
    heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 6
    r_num_blocks: int = 0
    use_output_layer: bool = True
    key_bias: bool = True

    def setup(self):
        self.left_decoder = TransformerDecoder(
            self.vocab_size, self.dim, self.heads, self.linear_units,
            self.num_blocks, self.use_output_layer, key_bias=self.key_bias)
        if self.r_num_blocks > 0:
            self.right_decoder = TransformerDecoder(
                self.vocab_size, self.dim, self.heads, self.linear_units,
                self.r_num_blocks, self.use_output_layer,
                key_bias=self.key_bias)

    def __call__(self, memory, memory_lens, ys_in, ys_in_lens,
                 r_ys_in: Optional[jax.Array] = None,
                 reverse_weight: float = 0.0):
        l_x = self.left_decoder(memory, memory_lens, ys_in, ys_in_lens)
        r_x = jnp.zeros(())
        if reverse_weight > 0.0 and self.r_num_blocks > 0:
            assert r_ys_in is not None
            r_x = self.right_decoder(memory, memory_lens, r_ys_in, ys_in_lens)
        return l_x, r_x


def import_transformer_decoder_torch(sd, num_blocks: int,
                                     prefix: str = "") -> dict:
    """torch TransformerDecoder state_dict -> params pytree."""
    def dense(p, bias=True):
        out = {"kernel": jnp.asarray(np.asarray(sd[f"{p}.weight"]).T)}
        if bias and f"{p}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{p}.bias"])
        return out

    def ln(p):
        return {"scale": jnp.asarray(sd[f"{p}.weight"]),
                "bias": jnp.asarray(sd[f"{p}.bias"])}

    params = {
        "embed": {"embedding": jnp.asarray(sd[f"{prefix}embed.0.weight"])},
        "after_norm": ln(f"{prefix}after_norm"),
    }
    if f"{prefix}output_layer.weight" in sd:
        params["output_layer"] = dense(f"{prefix}output_layer")
    for i in range(num_blocks):
        d = f"{prefix}decoders.{i}"
        layer = {
            "norm1": ln(f"{d}.norm1"),
            "norm3": ln(f"{d}.norm3"),
            "self_attn": {k: dense(f"{d}.self_attn.linear_{s}")
                          for k, s in [("linear_q", "q"), ("linear_k", "k"),
                                       ("linear_v", "v"), ("linear_out", "out")]},
            "ff_w1": dense(f"{d}.feed_forward.w_1"),
            "ff_w2": dense(f"{d}.feed_forward.w_2"),
        }
        if f"{d}.src_attn.linear_q.weight" in sd:
            layer["norm2"] = ln(f"{d}.norm2")
            layer["src_attn"] = {k: dense(f"{d}.src_attn.linear_{s}")
                                 for k, s in [("linear_q", "q"), ("linear_k", "k"),
                                              ("linear_v", "v"), ("linear_out", "out")]}
        params[f"decoders_{i}"] = layer
    return {"params": params}
