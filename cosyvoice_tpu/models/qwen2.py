"""Qwen2 transformer body in JAX with a static preallocated KV cache.

Behavioral spec: HF `transformers` Qwen2 as driven by the reference
(`cosyvoice/llm/llm.py:743-766` Qwen2Encoder wraps Qwen2ForCausalLM and feeds
`inputs_embeds` + `past_key_values`; CosyVoice2-0.5B config: hidden 896,
24 layers, 14 query / 2 kv heads, head_dim 64, intermediate 4864, rope theta
1e6, rms eps 1e-6, tied embeddings).

TPU-first design (NOT a port of HF):
  * static shapes: KV cache is [L, B, T_max, kvH, D] written with
    dynamic_update_slice; decode is one fused step (no concat-grow protocol)
  * GQA: kv heads kept un-repeated until the einsum — XLA broadcasts on the
    MXU without materializing the repeat
  * RMSNorm and logits accumulate in fp32; activations may be bf16
  * no data-dependent control flow — the decode loop lives in the caller's
    lax.while_loop (models/llm.py)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.ops.masks import NEG_INF


@dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    dtype: jnp.dtype = jnp.float32
    # weight-only quantization of the 7 per-layer projection matrices
    # ("none" | "int8" | "int4" | "int4xla").  Decode is weight-bandwidth-
    # bound: int8 halves its HBM traffic; "int4xla" (r5) halves it again
    # through NATIVE jnp.int4 buffers cast inside each decode program
    # (utils.quant.int4_device_cast) — measured 1.29x over int8 on this
    # backend, where the "int4" Pallas packed route loses 3x to custom-call
    # DMA (kept for backends with full-rate Pallas DMA).  Produce params
    # with utils.quant.quantize_qwen_int8 / int4 / int4xla (the latter
    # optionally AWQ-equalized from collect_act_stats calibration).
    quant: str = "none"
    quant_group: int = 128  # int4 scale group size (input-dim sub-channels)
    # decode attention + cache append through the fused Pallas kernel over a
    # packed [B, T, KH*D] cache (ops/pallas/lm_decode_attention.py).  The XLA
    # dynamic_update_slice + einsum form copies the whole cache every decode
    # step (~37% of step time at B=32) and lane-pads every cache read 64->128;
    # the kernel is in-place, lane-exact, and skips the unwritten tail.
    # TPU serving lever; numerically identical (greedy-token parity tested).
    fused_cache_update: bool = False
    # gradient rematerialization per layer (training): naive attention saves
    # [B, H, N, N] scores+probabilities per layer for backward — beyond
    # bs 8 x seq 450 that exhausts HBM.  Forward/inference unaffected;
    # loss/grads identical (tested).
    #   remat=True, remat_policy="scores" (default): save every residual
    #     EXCEPT the tagged [.., N, N] score/prob tensors — backward
    #     recomputes only the attention-score chain (~15% extra FLOPs).
    #   remat_policy="all": recompute the whole layer (max memory savings;
    #     measured ~2x step cost on this backend — use when even q/k/v
    #     activations don't fit).
    remat: bool = False
    remat_policy: str = "scores"
    # blockwise (flash-structure) attention for cache-less forwards
    # (training / teacher-forcing): lax.scan over KV blocks with a running
    # max/normalizer and a custom_vjp backward (ops/block_attention.py) —
    # nothing quadratic in T is saved, so long packed rows train WITHOUT
    # full-layer remat (round-4 VERDICT #3: the bs16 OOM and the dead
    # selective-remat policy both traced to the materialized [B,H,N,N]
    # scores).  Decode/cached paths unaffected.  Forward/grad equivalence:
    # tests/test_train.py::test_block_attention_*.
    block_attention: bool = False
    attention_block: int = 256


class KVCache(NamedTuple):
    """Preallocated KV: k/v are per-layer TUPLES of cache buffers, filled
    length in `pos`.

    Layout choices, all decode-bandwidth-critical:
      * per-layer tuples, NOT one stacked [L, ...] array — a stacked cache
        forces a full-cache jnp.stack + per-layer slice every decode step
        (profiled at ~45% of step time at B=32); separate buffers update
        in place inside the lax.while_loop carry.
      * default layout is head-major [B, kvH, T, D] so the attention
        einsum's batch dims lead.
      * with cfg.fused_cache_update the layout is packed [B, T, kvH*D]
        (exactly 128 lanes for Qwen2-0.5B — no XLA lane padding) and all
        reads/writes go through the fused Pallas decode-attention kernel.
    """

    k: tuple
    v: tuple
    pos: jax.Array  # scalar int32: number of valid positions

    @staticmethod
    def create(cfg: Qwen2Config, batch: int, max_len: int, dtype=None) -> "KVCache":
        if cfg.fused_cache_update:
            shape = (batch, max_len, cfg.num_kv_heads * cfg.head_dim)
        else:
            shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
        dt = dtype or cfg.dtype
        return KVCache(tuple(jnp.zeros(shape, dt) for _ in range(cfg.num_layers)),
                       tuple(jnp.zeros(shape, dt) for _ in range(cfg.num_layers)),
                       jnp.zeros((), jnp.int32))


class QDense(nn.Module):
    """Dense with optional int8 weight-only quantization.

    Param paths match nn.Dense ("kernel"/"bias") so fp checkpoints import
    unchanged; with quant="int8" the kernel is int8 plus a per-output-channel
    "scale" (f32).  XLA fuses the int8->bf16 convert into the dot's operand
    read, so HBM traffic is the int8 bytes.
    """

    features: int
    use_bias: bool = True
    quant: str = "none"
    quant_group: int = 128  # int4 scale group size along the input dim

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        if self.quant == "int8":
            k = self.param("kernel", nn.initializers.zeros_init(),
                           (in_f, self.features), jnp.int8)
            s = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
            y = jnp.dot(x, k.astype(x.dtype)) * s.astype(x.dtype)
        elif self.quant == "int4xla":
            # XLA-native int4 (r5): kernel holds nibble VALUES [-7, 7] as
            # int8 at the program boundary; decode-loop programs cast the
            # whole tree to jnp.int4 once at entry (utils.quant.
            # int4_device_cast) so the loop streams packed int4 HBM buffers
            # (measured 1.29x over int8 — tools/probe_int4_xla.py; the
            # Pallas packed route lost 3x to custom-call DMA).  Group-wise
            # scales along the input dim via a per-group batched dot.
            g = min(self.quant_group, in_f)
            G = in_f // g
            k = self.param("kernel", nn.initializers.zeros_init(),
                           (in_f, self.features), jnp.int8)
            s = self.param("scale", nn.initializers.ones,
                           (G, self.features), jnp.float32)
            w = k.astype(jnp.int4) if k.dtype == jnp.int8 else k
            wb = w.astype(x.dtype).reshape(G, g, self.features)
            lead = x.shape[:-1]
            xg = x.reshape(-1, G, g)
            p = jnp.einsum("bgi,gio->bgo", xg, wb)
            y = jnp.einsum("bgo,go->bo", p, s.astype(x.dtype))
            y = y.reshape(*lead, self.features)
        elif self.quant == "int4":
            # packed two-rows-per-byte kernel + Pallas dequant matmul: decode
            # HBM weight traffic is the int4 bytes (half of int8's).  Scales
            # are group-wise along the input dim (quant_group).  Large-row
            # calls (prefill: B*T rows) are MXU-compute-bound and take the
            # XLA unpack twin instead — the packed x-block would not fit
            # VMEM and the bandwidth saving is irrelevant there.
            from cosyvoice_tpu.ops.pallas.int4_matmul import (int4_matmul,
                                                              int4_matmul_xla)

            g = min(self.quant_group, in_f)
            k = self.param("kernel", nn.initializers.zeros_init(),
                           (in_f // 2, self.features), jnp.int8)
            s = self.param("scale", nn.initializers.ones,
                           (in_f // g, self.features), jnp.float32)
            lead = x.shape[:-1]
            rows = int(np.prod(lead)) if lead else 1
            x2 = x.reshape(rows, in_f)
            if rows <= 512:
                y = int4_matmul(x2, k, s)
            else:
                y = int4_matmul_xla(x2, k, s)
            y = y.reshape(*lead, self.features)
        else:
            k = self.param("kernel", nn.initializers.lecun_normal(),
                           (in_f, self.features))
            y = jnp.dot(x, k.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


from jax.ad_checkpoint import checkpoint_name as _checkpoint_name


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * weight.astype(jnp.float32)).astype(dt)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """positions [B, T] -> cos/sin [B, T, head_dim] (HF half-rotation layout)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    ang = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    return cos.astype(dtype), sin.astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, T, H, D]; rotate_half convention: (x*cos) + (rot(x)*sin)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, :, None, :] + rot * sin[:, :, None, :]


class Qwen2Layer(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias, layer_cache=None, cache_pos=None):
        """x [B, T, D]; attn_bias [B, 1, T, Tk] additive (already includes
        causal+pad); layer_cache: optional (k, v) [B, T_max, kvH, hd] to
        read+write at cache_pos.  Returns (x, (new_k, new_v))."""
        cfg = self.cfg
        H, KH, HD = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        B, T, _ = x.shape
        h = rms_norm(x, self.param("input_layernorm", nn.initializers.ones,
                                   (cfg.hidden_size,)), cfg.rms_norm_eps)
        # per-channel activation magnitudes for AWQ calibration (free unless
        # applied with mutable=["intermediates"] — see llm.collect_act_stats)
        self.sow("intermediates", "attn_in_amax",
                 jnp.max(jnp.abs(h), axis=tuple(range(h.ndim - 1))))
        q = QDense(H * HD, quant=cfg.quant, quant_group=cfg.quant_group, name="q_proj")(h).reshape(B, T, H, HD)
        k = QDense(KH * HD, quant=cfg.quant, quant_group=cfg.quant_group, name="k_proj")(h).reshape(B, T, KH, HD)
        v = QDense(KH * HD, quant=cfg.quant, quant_group=cfg.quant_group, name="v_proj")(h).reshape(B, T, KH, HD)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        g = H // KH  # query groups per kv head
        if (layer_cache is not None and cfg.fused_cache_update and T == 1):
            # serving decode: fused Pallas attention over the packed
            # [B, T_max, KH*D] cache with in-place append (see
            # ops/pallas/lm_decode_attention.py for why XLA ops can't)
            from cosyvoice_tpu.ops.pallas.lm_decode_attention import \
                lm_decode_attention

            ck, cv = layer_cache
            qp = q.reshape(B, KH, g, HD).transpose(0, 2, 1, 3).reshape(B, g, KH * HD)
            kf = k.reshape(B, 1, KH * HD).astype(ck.dtype)
            vf = v.reshape(B, 1, KH * HD).astype(cv.dtype)
            bias_row = attn_bias[:, 0, 0, :].astype(jnp.float32)
            op, ck, cv = lm_decode_attention(
                qp, kf, vf, ck, cv, bias_row, cache_pos, head_dim=HD,
                sm_scale=1.0 / float(np.sqrt(HD)),
                interpret=jax.default_backend() != "tpu")
            new_cache = (ck, cv)
            o = (op.reshape(B, g, KH, HD).transpose(0, 2, 1, 3)
                 .reshape(B, T, H * HD).astype(x.dtype))
        else:
            # head-major [B, KH, T, D] so the attention batch dims lead
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            if layer_cache is None:
                k_all, v_all = kt, vt
                new_cache = None
                bias = attn_bias
            elif cfg.fused_cache_update:
                # prefill into the packed cache layout; this is the FIRST
                # write (cache_pos == 0), so the current tokens ARE the
                # whole valid cache — attend over them directly instead of
                # the full buffer (skips the zero tail, bias cols sliced)
                ck, cv = layer_cache
                kf = k.reshape(B, T, KH * HD).astype(ck.dtype)
                vf = v.reshape(B, T, KH * HD).astype(cv.dtype)
                ck = jax.lax.dynamic_update_slice(ck, kf, (0, cache_pos, 0))
                cv = jax.lax.dynamic_update_slice(cv, vf, (0, cache_pos, 0))
                new_cache = (ck, cv)
                k_all, v_all = kt, vt
                bias = attn_bias[..., :T]
            else:
                ck, cv = layer_cache
                if getattr(cache_pos, "ndim", 0) == 1:
                    # per-row frontier (continuous-batching engine): every
                    # slot appends at its own position
                    upd = jax.vmap(lambda c, u, p: jax.lax.dynamic_update_slice(
                        c, u, (0, p, 0)))
                    ck = upd(ck, kt.astype(ck.dtype), cache_pos)
                    cv = upd(cv, vt.astype(cv.dtype), cache_pos)
                else:
                    ck = jax.lax.dynamic_update_slice(ck, kt.astype(ck.dtype), (0, 0, cache_pos, 0))
                    cv = jax.lax.dynamic_update_slice(cv, vt.astype(cv.dtype), (0, 0, cache_pos, 0))
                k_all, v_all = ck.astype(x.dtype), cv.astype(x.dtype)
                new_cache = (ck, cv)
                bias = attn_bias
            if cfg.block_attention and layer_cache is None and T > 1:
                # flash-structure scan over KV blocks; k_all/v_all stay
                # GQA-un-repeated [B, KH, T, D] (the op broadcasts groups)
                from cosyvoice_tpu.ops.block_attention import block_attention

                o = block_attention(q.transpose(0, 2, 1, 3), k_all, v_all,
                                    bias, 1.0 / float(np.sqrt(HD)),
                                    cfg.attention_block)
                o = o.transpose(0, 2, 1, 3).reshape(B, T, H * HD)
            else:
                qg = q.reshape(B, T, KH, g, HD)
                scores = jnp.einsum("bikgd,bkjd->bkgij", qg, k_all,
                                    preferred_element_type=jnp.float32) / np.sqrt(HD)
                scores = scores + bias[:, :, None, :, :]
                # tagged for the "scores" remat policy: the [.., T, T]
                # tensors are the only ones worth recomputing in backward
                scores = _checkpoint_name(scores, "attn_scores")
                attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
                attn = _checkpoint_name(attn, "attn_probs")
                o = jnp.einsum("bkgij,bkjd->bikgd", attn, v_all
                               ).reshape(B, T, H * HD)
        x = x + QDense(cfg.hidden_size, use_bias=False, quant=cfg.quant, quant_group=cfg.quant_group, name="o_proj")(o)

        h = rms_norm(x, self.param("post_attention_layernorm", nn.initializers.ones,
                                   (cfg.hidden_size,)), cfg.rms_norm_eps)
        self.sow("intermediates", "mlp_in_amax",
                 jnp.max(jnp.abs(h), axis=tuple(range(h.ndim - 1))))
        gate = QDense(cfg.intermediate_size, use_bias=False, quant=cfg.quant, quant_group=cfg.quant_group, name="gate_proj")(h)
        up = QDense(cfg.intermediate_size, use_bias=False, quant=cfg.quant, quant_group=cfg.quant_group, name="up_proj")(h)
        act = jax.nn.silu(gate) * up
        self.sow("intermediates", "down_in_amax",
                 jnp.max(jnp.abs(act), axis=tuple(range(act.ndim - 1))))
        x = x + QDense(cfg.hidden_size, use_bias=False, quant=cfg.quant, quant_group=cfg.quant_group, name="down_proj")(act)
        return x, new_cache


class Qwen2Model(nn.Module):
    """Decoder-only body; call with embeddings (the TTS LM never uses input ids
    directly except through embed_tokens, exposed via `embed`)."""

    cfg: Qwen2Config

    def setup(self):
        self.embed_tokens = nn.Embed(self.cfg.vocab_size, self.cfg.hidden_size,
                                     name="embed_tokens")
        if not self.cfg.remat:
            layer_cls = Qwen2Layer
        elif self.cfg.remat_policy == "scores":
            layer_cls = nn.remat(
                Qwen2Layer,
                policy=jax.checkpoint_policies.save_anything_except_these_names(
                    "attn_scores", "attn_probs"))
        else:
            layer_cls = nn.remat(Qwen2Layer)
        self.layers = [layer_cls(self.cfg, name=f"layers_{i}")
                       for i in range(self.cfg.num_layers)]
        self.norm_w = self.param("norm", nn.initializers.ones, (self.cfg.hidden_size,))

    def embed(self, ids: jax.Array) -> jax.Array:
        return self.embed_tokens(ids)

    def __call__(self, embeds: jax.Array, positions: jax.Array,
                 attn_bias: jax.Array, cache: Optional[KVCache] = None):
        """embeds [B, T, D], positions [B, T], attn_bias [B, 1, T, Tk].

        With a cache: writes K/V at cache.pos and attends over the whole
        cache buffer (bias must mask unwritten tail).  cache.pos may be a
        [B] vector (per-row frontiers, continuous-batching decode) when
        T == 1.  INVARIANT (fused_cache_update only): multi-token calls
        (T > 1) must be the cache's FIRST write — cache.pos == 0 — because
        the packed-layout prefill attends only over the current tokens and
        slices the bias to [..., :T]; a chunked prefill at pos > 0 would
        silently ignore the earlier cached keys.  Returns
        (hidden [B, T, D] final-normed, new_cache).
        """
        cfg = self.cfg
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, embeds.dtype)
        x = embeds
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            lc = (cache.k[i], cache.v[i]) if cache is not None else None
            x, nc = layer(x, cos, sin, attn_bias, lc,
                          cache.pos if cache is not None else None)
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        x = rms_norm(x, self.norm_w, cfg.rms_norm_eps)
        if cache is not None:
            cache = KVCache(tuple(new_k), tuple(new_v),
                            cache.pos + embeds.shape[1])
        return x, cache


def causal_prefill_bias(T: int, max_len: int, lens: Optional[jax.Array] = None,
                        batch: int = 1, dtype=jnp.float32) -> jax.Array:
    """[B, 1, T, max_len] additive bias: causal over [0, T), -inf beyond."""
    q = jnp.arange(T)[:, None]
    k = jnp.arange(max_len)[None, :]
    ok = k <= q
    bias = jnp.where(ok, 0.0, NEG_INF).astype(dtype)
    bias = jnp.broadcast_to(bias[None, None], (batch, 1, T, max_len))
    if lens is not None:  # right-padded batch: also mask key positions >= len
        key_ok = k[None] < lens[:, None, None]
        bias = jnp.where(key_ok[:, None], bias, NEG_INF)
    return bias


def decode_step_bias(pos: jax.Array, max_len: int, batch: int = 1,
                     dtype=jnp.float32) -> jax.Array:
    """[B, 1, 1, max_len]: attend to cache[0..pos], mask the unwritten tail."""
    k = jnp.arange(max_len)[None, None, None, :]
    return jnp.where(k <= pos, 0.0, NEG_INF).astype(dtype) * jnp.ones((batch, 1, 1, 1), dtype)


# --------------------------------------------------------------------------
# HF checkpoint import
# --------------------------------------------------------------------------

def export_qwen2_torch(params, cfg: Qwen2Config) -> dict:
    """Inverse of import_qwen2_torch: flax params -> HF `model.*` numpy
    state dict (used by bin/export_serving_lm to re-head the speech LM for
    HF-compatible serving stacks, reference bin/vllm_save_newckpt.py:5-45)."""
    p = params["params"] if "params" in params else params
    out = {
        "model.embed_tokens.weight": np.asarray(p["embed_tokens"]["embedding"]),
        "model.norm.weight": np.asarray(p["norm"]),
    }

    def dense(dst, src, bias):
        out[f"{dst}.weight"] = np.asarray(src["kernel"]).T
        if bias:
            out[f"{dst}.bias"] = np.asarray(src["bias"])

    for i in range(cfg.num_layers):
        lp = p[f"layers_{i}"]
        d = f"model.layers.{i}"
        out[f"{d}.input_layernorm.weight"] = np.asarray(lp["input_layernorm"])
        out[f"{d}.post_attention_layernorm.weight"] = np.asarray(
            lp["post_attention_layernorm"])
        dense(f"{d}.self_attn.q_proj", lp["q_proj"], True)
        dense(f"{d}.self_attn.k_proj", lp["k_proj"], True)
        dense(f"{d}.self_attn.v_proj", lp["v_proj"], True)
        dense(f"{d}.self_attn.o_proj", lp["o_proj"], False)
        dense(f"{d}.mlp.gate_proj", lp["gate_proj"], False)
        dense(f"{d}.mlp.up_proj", lp["up_proj"], False)
        dense(f"{d}.mlp.down_proj", lp["down_proj"], False)
    return out


def import_qwen2_torch(state_dict, cfg: Qwen2Config) -> dict:
    """HF Qwen2ForCausalLM state_dict (model.* prefix) -> params pytree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(prefix, bias):
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if bias:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    params = {
        "embed_tokens": {"embedding": jnp.asarray(sd["model.embed_tokens.weight"])},
        "norm": jnp.asarray(sd["model.norm.weight"]),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        params[f"layers_{i}"] = {
            "input_layernorm": jnp.asarray(sd[f"{p}.input_layernorm.weight"]),
            "post_attention_layernorm": jnp.asarray(sd[f"{p}.post_attention_layernorm.weight"]),
            "q_proj": dense(f"{p}.self_attn.q_proj", True),
            "k_proj": dense(f"{p}.self_attn.k_proj", True),
            "v_proj": dense(f"{p}.self_attn.v_proj", True),
            "o_proj": dense(f"{p}.self_attn.o_proj", False),
            "gate_proj": dense(f"{p}.mlp.gate_proj", False),
            "up_proj": dense(f"{p}.mlp.up_proj", False),
            "down_proj": dense(f"{p}.mlp.down_proj", False),
        }
    return {"params": params}
