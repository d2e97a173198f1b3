"""Conditional flow matching: speech tokens -> mel (CosyVoice2 "flow" stage).

Behavioral spec:
  * estimator UNet: reference `cosyvoice/flow/decoder.py:88-334`
    (ConditionalDecoder; causal variant: CausalConv1d = left-pad k-1,
    CausalBlock1D uses LayerNorm instead of GroupNorm) built from Matcha-TTS
    blocks `flow/components/decoder.py` (SinusoidalPosEmb with scale 1000,
    Block1D/ResnetBlock1D, TimestepEmbedding) and diffusers-style transformer
    blocks `flow/components/transformer.py:137-316` (LN -> SDPA -> LN -> GELU
    FF, additive FLOAT attention mask — the reference passes a 0/1 float mask
    which SDPA treats as a +1 bias on valid positions, NOT a hard mask; we
    reproduce that semantics exactly).
  * OT-CFM solver: `flow/flow_matching.py` — ConditionalCFM.solve_euler:72-124
    (fixed-step Euler, batch-2 classifier-free-guidance trick,
    (1+r)*cond - r*uncond with r=0.7), cosine t-schedule 1-cos(pi t/2),
    compute_loss:167-206 (t~U cosine-warped, y=(1-(1-sigma)t)z + t x1,
    u = x1-(1-sigma)z, CFG dropout 0.2, masked MSE);
    CausalConditionalCFM:209-240 (fixed seeded noise buffer [1, 80, 15000]
    sliced per length -> reproducible chunk-consistent synthesis).
  * wrapper: `flow/flow.py:163-319` CausalMaskedDiffWithXvec (token embed ->
    UpsampleConformerEncoder 2x -> proj 80; spk vec L2-normalized -> Linear 80;
    conds = prompt-mel prefix; inference slices the prompt region off).

TPU-first: channels-last [B, T, C]; the Euler loop is a lax.scan over
(t, dt) pairs so the estimator compiles once; CFG rides a 2B batch through a
single estimator call (MXU-friendly); noise is a framework-seeded constant
(jax PRNG) with an injection hook for cross-framework parity.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.conformer import ConformerConfig, UpsampleConformerEncoder
from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.activations import mish
from cosyvoice_tpu.ops.masks import make_non_pad_mask


# --------------------------------------------------------------------------
# estimator building blocks
# --------------------------------------------------------------------------

def sinusoidal_time_emb(t: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """[B] -> [B, dim]; Matcha SinusoidalPosEmb (components/decoder.py:12-27)."""
    half = dim // 2
    # python float (weak type) so bf16 t stays bf16 — a numpy scalar here
    # silently upcasts the whole block stack to f32
    freqs = jnp.exp(jnp.arange(half, dtype=t.dtype) * -(float(np.log(10000.0)) / (half - 1)))
    ang = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    time_embed_dim: int

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        h = nn.Dense(self.time_embed_dim, name="linear_1")(t_emb)
        h = jax.nn.silu(h)
        return nn.Dense(self.time_embed_dim, name="linear_2")(h)


class ELayerNorm(nn.Module):
    """LayerNorm with nn.LayerNorm's param names ({scale, bias}) and numerics
    (fp32 fast-variance stats), plus a serving fast path: one fused Pallas
    pass (optionally folding in the following mish) instead of XLA's several
    whole-tensor VPU passes — ~3x at estimator serving shapes.

    setup-style so sibling modules (the fused whole-DiT-block kernel) can
    read the raw scale/bias without invoking the computation."""

    dim: int
    eps: float = 1e-5
    fused: bool = False
    act: str = "none"  # "none" | "mish"

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def __call__(self, x: jax.Array) -> jax.Array:
        from cosyvoice_tpu.ops.pallas import fused_norm as FN

        n_rows = int(np.prod(x.shape[:-1]))
        if (self.fused and jax.default_backend() == "tpu"
                and FN.supports(n_rows, self.dim)):
            return FN.fused_layer_norm(x, self.scale, self.bias, self.eps,
                                       self.act)
        return FN.layer_norm_xla(x, self.scale, self.bias, self.eps, self.act)


class Block1D(nn.Module):
    """conv3 -> GroupNorm(8) (or LayerNorm when causal) -> Mish, masked.

    setup-style so the incremental streaming path (flow_chunk.py) can drive
    the same conv/norm params chunk-by-chunk with a 2-row history."""

    dim_out: int
    causal: bool = False
    groups: int = 8
    fused_norm: bool = False

    def setup(self):
        pad = (2, 0) if self.causal else (1, 1)
        self.conv = Conv1d(self.dim_out, 3, padding=pad, name="conv")
        if self.causal:
            self.norm = ELayerNorm(self.dim_out, fused=self.fused_norm,
                                   act="mish", name="norm")
        else:
            self.norm = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                                     name="norm")

    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        h = self.conv(x * mask[..., None])
        if self.causal:
            h = self.norm(h)
        else:
            h = mish(self.norm(h))
        return h * mask[..., None]

    def chunk(self, x: jax.Array, mask: jax.Array, hist: jax.Array
              ) -> tuple[jax.Array, jax.Array]:
        """Causal chunk step: x [B, N, C] new rows, hist [B, 2, C] the last
        two valid PRE-conv rows (x*mask) of the stream.  The conv's built-in
        left pad is satisfied by prepending the history and dropping the
        first 2 output rows — identical math to the contiguous call.
        Returns (out [B, N, C], xin [B, 2+N, C] — the masked conv input, so
        the caller can roll its history cache)."""
        assert self.causal
        xin = jnp.concatenate([hist, x * mask[..., None]], axis=1)
        # conv pads (2,0) itself; with 2 history rows prepended the first 2
        # outputs are the history rows' (already-emitted) outputs — drop them
        h = self.conv(xin)[:, 2:]
        h = self.norm(h)
        return h * mask[..., None], xin


class ResnetBlock1D(nn.Module):
    dim_out: int
    causal: bool = False
    fused_norm: bool = False

    def setup(self):
        self.block1 = Block1D(self.dim_out, self.causal,
                              fused_norm=self.fused_norm, name="block1")
        self.block2 = Block1D(self.dim_out, self.causal,
                              fused_norm=self.fused_norm, name="block2")
        self.mlp = nn.Dense(self.dim_out, name="mlp")
        self.res_conv = Conv1d(self.dim_out, 1, name="res_conv")

    def __call__(self, x: jax.Array, mask: jax.Array, t: jax.Array) -> jax.Array:
        h = self.block1(x, mask)
        h = h + self.mlp(mish(t))[:, None, :]
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask[..., None])

    def chunk(self, x: jax.Array, mask: jax.Array, t: jax.Array,
              h1: jax.Array, h2: jax.Array
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Chunk step with per-conv 2-row histories h1/h2 (see Block1D.chunk).
        Returns (out, block1-input rows, block2-input rows) — callers roll
        the histories from the returned input rows."""
        h, x1 = self.block1.chunk(x, mask, h1)
        h = h + self.mlp(mish(t))[:, None, :]
        h, x2 = self.block2.chunk(h, mask, h2)
        return h + self.res_conv(x * mask[..., None]), x1, x2


def _flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          pad_mask: jax.Array) -> jax.Array:
    """Fused (flash) full self-attention for the estimator fast path.

    q/k/v [B, T, H, D], pad_mask [B, T] (float or bool, 1 = valid).
    The naive path materializes [B, H, T, T] fp32 scores — at serving shapes
    (B=64 CFG rows, T~1100) that is GBs of HBM traffic per DiT block and is
    the whole-pipeline bottleneck; the Pallas TPU flash kernel streams tiles
    through VMEM instead.  Pad positions are excluded exactly (segment ids)
    rather than via the reference's +1/+0 float-bias quirk — identical on
    unpadded rows (a constant bias shifts softmax by nothing), and strictly
    better-masked on padded rows.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (BlockSizes,
                                                                 SegmentIds,
                                                                 flash_attention)

    from cosyvoice_tpu.ops.pallas.dit_attention import dit_attention, supports

    B, T, H, D = q.shape
    if supports(T, H, D):
        # specialized whole-row kernel in the model's own [B, T, H, D]
        # layout — no transpose copies around the custom call
        lens = jnp.sum((pad_mask > 0).astype(jnp.int32), axis=1)
        return dit_attention(q, k, v, lens, 1.0 / float(np.sqrt(D)))
    Tp = ((T + 127) // 128) * 128
    pad = ((0, 0), (0, Tp - T), (0, 0), (0, 0))
    qt = jnp.pad(q, pad).transpose(0, 2, 1, 3)      # [B, H, Tp, D]
    kt = jnp.pad(k, pad).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, pad).transpose(0, 2, 1, 3)
    ids = jnp.pad((pad_mask > 0).astype(jnp.int32), ((0, 0), (0, Tp - T)))
    # Whole-sequence blocks when the fp32 score tile fits VMEM: at serving
    # length (~1.1k frames) this halves the kernel time vs 384-blocks
    # (fewer pipeline bubbles, no online-softmax rescale passes).
    if Tp * Tp * 4 <= 6 * 1024 * 1024:
        blk = Tp
    else:
        blk = next(b for b in (1024, 512, 384, 256, 128) if Tp % b == 0)
    sizes = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk,
                       block_b=1, block_q_major_dkv=blk, block_k_major_dkv=blk,
                       block_k_dkv=blk, block_q_dkv=blk,
                       block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk)
    o = flash_attention(qt, kt, vt, segment_ids=SegmentIds(q=ids, kv=ids),
                        causal=False, sm_scale=1.0 / float(np.sqrt(D)),
                        block_sizes=sizes)
    return o.transpose(0, 2, 1, 3)[:, :T]


class DenseP(nn.Module):
    """nn.Dense twin with setup-declared params (identical names/inits/
    dtype promotion), so sibling code — the fused whole-DiT-block kernel —
    can read the raw kernel/bias without invoking the layer."""

    features: int
    in_features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))

    def __call__(self, x: jax.Array) -> jax.Array:
        dt = jnp.result_type(x.dtype, self.kernel.dtype)
        return (jnp.dot(x.astype(dt), self.kernel.astype(dt))
                + self.bias.astype(dt))


class DiTBlock(nn.Module):
    """diffusers BasicTransformerBlock (self-attn only, gelu FF).

    attn_bias is ADDED to the scores verbatim — pass the reference's 0/1
    float mask to reproduce its (soft) masking semantics.  When `pad_mask`
    is given instead, the fused flash kernel is used (serving fast path),
    or — with `fused_block` — the ENTIRE block runs as one Pallas kernel
    (ops/pallas/dit_block.py): no qkv/attention-out/FFN-mid HBM round trips
    and weights stay VMEM-resident across the batch.
    """

    dim: int
    heads: int
    head_dim: int
    ff_mult: int = 4
    approx_gelu: bool = False
    fused_norm: bool = False
    fused_block: bool = False

    def setup(self):
        inner = self.heads * self.head_dim
        init = nn.initializers.lecun_normal()
        self.norm1 = ELayerNorm(self.dim, fused=self.fused_norm)
        # raw [in, inner] kernels (diffusers to_q/to_k/to_v, bias=False),
        # packed into ONE [in, 3*inner] matmul — per output column the dot
        # product is unchanged, and one MXU pass beats three half-deep ones
        self.wq = self.param("to_q", init, (self.dim, inner))
        self.wk = self.param("to_k", init, (self.dim, inner))
        self.wv = self.param("to_v", init, (self.dim, inner))
        self.to_out = DenseP(self.dim, inner)
        self.norm3 = ELayerNorm(self.dim, fused=self.fused_norm)
        self.ff_in = DenseP(self.dim * self.ff_mult, self.dim)
        self.ff_out = DenseP(self.dim, self.dim * self.ff_mult)

    def __call__(self, x: jax.Array, attn_bias: Optional[jax.Array],
                 pad_mask: Optional[jax.Array] = None) -> jax.Array:
        inner = self.heads * self.head_dim
        B, T, _ = x.shape
        if (pad_mask is not None and self.fused_block and self.approx_gelu
                and jax.default_backend() == "tpu"):
            from cosyvoice_tpu.ops.pallas import dit_block as DB

            if DB.supports(T, self.heads, self.head_dim, self.dim,
                           self.dim * self.ff_mult):
                # pad_mask MUST be prefix-contiguous (valid rows first): the
                # fused block reduces it to per-row lengths and masks keys by
                # j >= len only.  Every caller builds it from sequence
                # lengths (ops/masks.py), so this holds by construction;
                # test_dit_block_requires_prefix_mask guards the contract.
                lens = jnp.sum((pad_mask > 0).astype(jnp.int32), axis=1)
                wqkv = jnp.concatenate([self.wq, self.wk, self.wv], axis=1)
                return DB.dit_block_fused(
                    x, lens, self.norm1.scale, self.norm1.bias,
                    wqkv.astype(x.dtype),
                    self.to_out.kernel.astype(x.dtype), self.to_out.bias,
                    self.norm3.scale, self.norm3.bias,
                    self.ff_in.kernel.astype(x.dtype), self.ff_in.bias,
                    self.ff_out.kernel.astype(x.dtype), self.ff_out.bias,
                    sm_scale=1.0 / float(np.sqrt(self.head_dim)),
                    heads=self.heads, head_dim=self.head_dim)
        h = self.norm1(x)
        qkv = h @ jnp.concatenate([self.wq, self.wk, self.wv], axis=1
                                  ).astype(h.dtype)
        if pad_mask is not None:
            from cosyvoice_tpu.ops.pallas.dit_attention import (
                dit_attention_packed, supports)

            if supports(T, self.heads, self.head_dim):
                # read q/k/v straight from the packed projection — slicing
                # them out first costs three whole-tensor copies (custom
                # calls need dense operands)
                lens = jnp.sum((pad_mask > 0).astype(jnp.int32), axis=1)
                o = dit_attention_packed(qkv, lens,
                                         1.0 / float(np.sqrt(self.head_dim)),
                                         head_dim=self.head_dim)
            else:
                q = qkv[..., :inner].reshape(B, T, self.heads, self.head_dim)
                k = qkv[..., inner:2 * inner].reshape(B, T, self.heads, self.head_dim)
                v = qkv[..., 2 * inner:].reshape(B, T, self.heads, self.head_dim)
                o = _flash_self_attention(q, k, v, pad_mask).reshape(B, T, inner)
        else:
            q = qkv[..., :inner].reshape(B, T, self.heads, self.head_dim)
            k = qkv[..., inner:2 * inner].reshape(B, T, self.heads, self.head_dim)
            v = qkv[..., 2 * inner:].reshape(B, T, self.heads, self.head_dim)
            scores = jnp.einsum("bihd,bjhd->bhij", q, k) / float(np.sqrt(self.head_dim))
            if attn_bias is not None:
                scores = scores + attn_bias[:, None, :, :]
            attn = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, T, inner)
        x = x + self.to_out(o)
        h = self.norm3(x)
        h = self.ff_in(h)
        h = jax.nn.gelu(h, approximate=self.approx_gelu)
        x = x + self.ff_out(h)
        return x

    def chunk(self, x: jax.Array, kv_cache: jax.Array, bias: jax.Array):
        """Incremental step: x [B, N, dim] new rows; kv_cache [B, R, 2,
        inner] holds K/V of the retained left-context rows; bias
        [B, N, R+N] additive (cache keys first, then the new rows).  The
        DiT blocks carry no positional encoding, so cached K/V attend
        position-free — only the bias (anchored chunk mask + validity)
        encodes structure.  Returns (x_out, k_new, v_new [B, N, inner]);
        the caller rolls every block's cache with one shared shift."""
        inner = self.heads * self.head_dim
        B, N, _ = x.shape
        R = kv_cache.shape[1]
        h = self.norm1(x)
        qkv = h @ jnp.concatenate([self.wq, self.wk, self.wv], axis=1
                                  ).astype(h.dtype)
        q = qkv[..., :inner]
        k_new = qkv[..., inner:2 * inner]
        v_new = qkv[..., 2 * inner:]
        k_all = jnp.concatenate([kv_cache[:, :, 0].astype(h.dtype), k_new],
                                axis=1)
        v_all = jnp.concatenate([kv_cache[:, :, 1].astype(h.dtype), v_new],
                                axis=1)
        qh = q.reshape(B, N, self.heads, self.head_dim)
        kh = k_all.reshape(B, R + N, self.heads, self.head_dim)
        vh = v_all.reshape(B, R + N, self.heads, self.head_dim)
        scores = jnp.einsum("bihd,bjhd->bhij", qh, kh
                            ) / float(np.sqrt(self.head_dim))
        scores = scores + bias[:, None]
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", attn, vh).reshape(B, N, inner)
        x = x + self.to_out(o)
        h = self.norm3(x)
        h = self.ff_in(h)
        h = jax.nn.gelu(h, approximate=self.approx_gelu)
        x = x + self.ff_out(h)
        return x, k_new, v_new


@dataclass(frozen=True)
class EstimatorConfig:
    in_channels: int = 320  # x(80) + mu(80) + spks(80) + cond(80)
    out_channels: int = 80
    causal: bool = True
    channels: Sequence[int] = (256,)
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    attention_head_dim: int = 64
    static_chunk_size: int = 50  # mel frames per streaming chunk (2*fr*ratio)
    # StreamConditionalDecoder (decoder.py:337-537): when True AND the call
    # passes streaming=True, attention uses a chunk mask (chunk=
    # static_chunk_size, all left context) as a proper -inf bias instead of
    # the base class's float-pad-bias quirk.
    stream: bool = False
    # serving fast path: Pallas flash attention in the DiT blocks (TPU only;
    # exact on unpadded rows, proper -inf pad masking instead of the float
    # quirk on padded rows).  Not used while streaming chunk masks are active.
    fused_attention: bool = False
    # serving compute dtype ("float32" | "bfloat16").  With "bfloat16" the
    # caller should also cast params (utils.dtype.to_bf16); inputs, timestep
    # embedding and masks are cast here so no fp32 promotion leaks back in.
    # The reference serves the whole flow stack in fp16 (cli/model.py:43-45);
    # bf16 on TPU is strictly wider-ranged.  Output is always fp32.
    dtype: str = "float32"
    # serving: tanh-approximate gelu in the DiT FFN.  Exact gelu's erf is
    # VPU-bound at serving shapes (~1/6 of estimator time); the tanh form
    # differs by <2e-3 absolute on bf16 activations.
    approx_gelu: bool = False
    # serving: fused Pallas LayerNorm (+mish in Block1D) — one VPU pass
    # instead of XLA's several (ops/pallas/fused_norm.py).  Forward-only;
    # numerics match flax LayerNorm's fp32 fast-variance formula.
    fused_norm: bool = False
    # serving: run each whole DiT block as ONE Pallas kernel
    # (ops/pallas/dit_block.py — no qkv/attn-out/FFN-mid HBM round trips,
    # VMEM-resident weights).  Takes effect on the fused_attention fast path
    # with approx_gelu; forward-only.
    fused_block: bool = False
    # stream-family left context, in chunks (-1 = unbounded, the reference's
    # add_optional_chunk_mask(..., -1) at decoder.py:483).  A FINITE bound is
    # the TPU serving lever behind incremental streaming flow: each chunk's
    # attention then needs only the last left_chunks*static_chunk_size rows
    # of per-block K/V, so the per-stream cache is finite.  Affects the
    # stream=True streaming=True mask only.
    left_chunks: int = -1


class Downsample1D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return Conv1d(self.dim, 3, stride=2, padding=1, name="conv")(x)


class Upsample1DT(nn.Module):
    """Matcha Upsample1D(use_conv_transpose=True): convT k4 s2 p1."""

    dim: int

    @nn.compact
    def __call__(self, x):
        from cosyvoice_tpu.nn.conv import ConvTranspose1d

        return ConvTranspose1d(self.dim, 4, 2, padding=1, name="conv")(x)


class ConditionalDecoder(nn.Module):
    """The CFM estimator v(x, mu, t, spk, cond); channels-last [B, T, C].

    Full reference topology (decoder.py:88-334): len(channels) levels with
    stride-2 down/upsampling between them (v1 uses (256, 256)); the causal
    production config (channels=(256,)) degenerates to stride-1 causal convs.

    setup-style (r5): all blocks are attributes so the incremental streaming
    path (flow_chunk.forward_chunk) can drive the same params with per-block
    KV/conv caches.  Param names/paths are unchanged from the @nn.compact
    original (checkpoint + golden-test compatible).
    """

    cfg: EstimatorConfig

    def setup(self):
        cfg = self.cfg
        chans = tuple(cfg.channels)
        cpad = (2, 0) if cfg.causal else (1, 1)
        self.time_mlp = TimestepEmbedding(chans[0] * 4, name="time_mlp")

        def tb(name, ch):
            return DiTBlock(dim=ch, heads=cfg.num_heads,
                            head_dim=cfg.attention_head_dim,
                            approx_gelu=cfg.approx_gelu,
                            fused_norm=cfg.fused_norm,
                            fused_block=cfg.fused_block, name=name)

        down_res, down_tbs, downs = [], [], []
        for i, ch in enumerate(chans):
            down_res.append(ResnetBlock1D(ch, cfg.causal,
                                          fused_norm=cfg.fused_norm,
                                          name=f"down_{i}_resnet"))
            down_tbs.append(tuple(tb(f"down_{i}_tb_{j}", ch)
                                  for j in range(cfg.n_blocks)))
            if i == len(chans) - 1:
                downs.append(Conv1d(ch, 3, padding=cpad,
                                    name=f"down_{i}_downsample"))
            else:
                downs.append(Downsample1D(ch, name=f"down_{i}_downsample"))
        self.down_resnets = tuple(down_res)
        self.down_tbs = tuple(down_tbs)
        self.downsamples = tuple(downs)
        self.mid_resnets = tuple(
            ResnetBlock1D(chans[-1], cfg.causal, fused_norm=cfg.fused_norm,
                          name=f"mid_{i}_resnet")
            for i in range(cfg.num_mid_blocks))
        self.mid_tbs = tuple(
            tuple(tb(f"mid_{i}_tb_{j}", chans[-1])
                  for j in range(cfg.n_blocks))
            for i in range(cfg.num_mid_blocks))
        up_chans = chans[::-1] + (chans[0],)
        up_res, up_tbs, ups = [], [], []
        for i in range(len(up_chans) - 1):
            up_res.append(ResnetBlock1D(up_chans[i + 1], cfg.causal,
                                        fused_norm=cfg.fused_norm,
                                        name=f"up_{i}_resnet"))
            up_tbs.append(tuple(tb(f"up_{i}_tb_{j}", up_chans[i + 1])
                                for j in range(cfg.n_blocks)))
            if i == len(up_chans) - 2:
                ups.append(Conv1d(up_chans[i + 1], 3, padding=cpad,
                                  name=f"up_{i}_upsample"))
            else:
                ups.append(Upsample1DT(up_chans[i + 1],
                                       name=f"up_{i}_upsample"))
        self.up_resnets = tuple(up_res)
        self.up_tbs = tuple(up_tbs)
        self.upsamples = tuple(ups)
        self.final_block = Block1D(up_chans[-1], cfg.causal,
                                   fused_norm=cfg.fused_norm,
                                   name="final_block")
        self.final_proj = Conv1d(cfg.out_channels, 1, name="final_proj")

    def time_embed(self, t: jax.Array, cdt) -> jax.Array:
        """[B] t -> [B, time_dim] conditioning vector (fp32 angles)."""
        t_emb = sinusoidal_time_emb(t.astype(jnp.float32),
                                    self.cfg.in_channels)
        return self.time_mlp(t_emb.astype(cdt))

    def __call__(self, x: jax.Array, mask: jax.Array, mu: jax.Array,
                 t: jax.Array, spks: jax.Array, cond: jax.Array,
                 streaming: bool = False,
                 exact_pad_mask: bool = False,
                 chunk_anchor: Optional[jax.Array] = None) -> jax.Array:
        cfg = self.cfg
        chans = tuple(cfg.channels)
        cdt = jnp.dtype(cfg.dtype)
        # cast every input (incl. t and mask) so no fp32 promotion leaks back
        # into the block stack when serving in bf16
        x, mu, spks, cond, mask = (v.astype(cdt)
                                   for v in (x, mu, spks, cond, mask))
        # sin/cos of angles up to `scale` rad — MUST stay fp32 (bf16 loses
        # the angle to ~1 rad); cast only the bounded embedding afterwards
        t_emb = self.time_embed(t, cdt)

        T_in = x.shape[1]
        serving_fast = cfg.fused_attention and not (cfg.stream and streaming)
        if serving_fast and T_in % 128 != 0:
            # pad the time axis once to a lane-aligned length so every conv /
            # flash call below works on aligned tiles with no per-block pads;
            # the pad region carries mask 0 (exact under segment-id attention,
            # same as padded batch rows).  Exit slices back to T_in.
            Tp = ((T_in + 127) // 128) * 128
            grow = ((0, 0), (0, Tp - T_in), (0, 0))
            x, mu, cond = (jnp.pad(v, grow) for v in (x, mu, cond))
            mask = jnp.pad(mask, ((0, 0), (0, Tp - T_in)))

        T = x.shape[1]
        spks_b = jnp.broadcast_to(spks[:, None, :], (x.shape[0], T, spks.shape[-1]))
        h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)

        def block_bias(h, m):
            pm = None
            if cfg.fused_attention and not (cfg.stream and streaming):
                pm = m
                attn_bias = None
            elif cfg.stream:
                # StreamConditionalDecoder (decoder.py:479-492): both branches
                # run through mask_to_bias -> real -inf bias; streaming=True
                # additionally applies a static chunk mask with the SAME
                # chunk size at every resolution level.  left_chunks bounds
                # the left context (reference passes -1 = unbounded,
                # decoder.py:483; a bound is the TPU serving lever that makes
                # the incremental chunk caches finite).  chunk_anchor (per-
                # row prompt rows) anchors the chunk grid at the prompt/gen
                # boundary so incremental serving chunks align with it.
                from cosyvoice_tpu.ops.masks import (NEG_INF,
                                                     add_chunk_mask,
                                                     anchored_chunk_mask)

                if not streaming:
                    keep = add_chunk_mask(m > 0, 0)
                elif chunk_anchor is not None:
                    keep = anchored_chunk_mask(
                        m > 0, cfg.static_chunk_size, chunk_anchor,
                        cfg.left_chunks)
                else:
                    keep = add_chunk_mask(m > 0, cfg.static_chunk_size,
                                          num_left_chunks=cfg.left_chunks)
                attn_bias = jnp.where(keep, 0.0, NEG_INF).astype(h.dtype)
            elif exact_pad_mask:
                # serving: true -inf key masking.  On unpadded rows this is
                # bit-identical to the reference quirk below (a constant +1
                # on every key shifts softmax by nothing); on padded rows it
                # reproduces the reference's EXACT-LENGTH computation, so the
                # valid region is invariant to the pad bucket — the property
                # ragged batched serving and bucket-consistent streaming need
                # (the quirk leaks pad keys, so outputs drift with pad size).
                from cosyvoice_tpu.ops.masks import NEG_INF

                attn_bias = jnp.where(m[:, None, :] > 0, 0.0, NEG_INF
                                      ).astype(h.dtype)
            else:
                # base ConditionalDecoder quirk: float 0/1 pairwise mask used
                # as an ADDITIVE bias by the diffusers attention
                attn_bias = (m[:, :, None] * m[:, None, :]).astype(h.dtype)
            return attn_bias, pm

        def blocks(h, resnet, tbs, m):
            attn_bias, pm = block_bias(h, m)
            h = resnet(h, m, t_emb)
            for tb in tbs:
                h = tb(h, attn_bias, pm)
            return h

        masks = [mask]
        skips = []
        for i, ch in enumerate(chans):
            m = masks[-1]
            h = blocks(h, self.down_resnets[i], self.down_tbs[i], m)
            skips.append(h)  # skip saved BEFORE downsample (decoder.py:282)
            if i == len(chans) - 1:
                h = self.downsamples[i](h * m[..., None])
            else:
                h = self.downsamples[i](h * m[..., None])
                masks.append(m[:, ::2])
        mask_mid = masks[-1]
        for i in range(cfg.num_mid_blocks):
            h = blocks(h, self.mid_resnets[i], self.mid_tbs[i], mask_mid)
        up_chans = chans[::-1] + (chans[0],)
        for i in range(len(up_chans) - 1):
            m = masks.pop()
            skip = skips.pop()
            h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
            h = blocks(h, self.up_resnets[i], self.up_tbs[i], m)
            h = self.upsamples[i](h * m[..., None])
        h = self.final_block(h, m)
        out = self.final_proj(h * m[..., None])
        return (out * mask[..., None]).astype(jnp.float32)[:, :T_in]


# --------------------------------------------------------------------------
# CFM solver
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class CFMConfig:
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    training_cfg_rate: float = 0.2
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10
    noise_frames: int = 15000  # 50 fps * 300 s fixed-noise buffer


from functools import lru_cache


@lru_cache(maxsize=None)
def _fixed_noise(frames: int, channels: int = 80) -> np.ndarray:
    return np.random.default_rng(0).standard_normal((1, frames, channels)).astype(np.float32)


@lru_cache(maxsize=None)
def reference_rand_noise(frames: int = 15000, channels: int = 80) -> np.ndarray:
    """The reference's pinned CFM noise, exactly: `CausalConditionalCFM`
    seeds torch with 0 and draws `randn([1, 80, 50 * 300])` once
    (`cosyvoice/flow/flow_matching.py:212-213`), then slices `[:, :, :T]`
    per synthesis.  Returns the identical buffer in this repo's [1, T, 80]
    layout so wav output is allclose to the reference
    (BASELINE.md per-stage numerics target).  A committed asset guards the
    cross-torch-version stability of this draw (test_reference_noise.py)."""
    import torch

    g = torch.Generator().manual_seed(0)
    # set_all_random_seed(0) seeds the global generator; replicate without
    # touching global state (same Philox/MT stream as torch.manual_seed(0))
    torch_buf = torch.randn([1, channels, 15000], generator=g)
    return torch_buf[:, :, :frames].permute(0, 2, 1).numpy().copy()


def cosine_t_span(n_timesteps: int, dtype=jnp.float32) -> jax.Array:
    ts = jnp.linspace(0.0, 1.0, n_timesteps + 1, dtype=dtype)
    return 1.0 - jnp.cos(ts * 0.5 * jnp.pi)


class CausalConditionalCFM(nn.Module):
    """Euler OT-CFM sampler around a ConditionalDecoder estimator."""

    cfg: CFMConfig = field(default_factory=CFMConfig)
    est_cfg: EstimatorConfig = field(default_factory=EstimatorConfig)

    def setup(self):
        self.estimator = ConditionalDecoder(self.est_cfg)

    @property
    def rand_noise(self) -> jax.Array:
        # framework-seeded reproducible noise (reference pins torch seed 0;
        # inject its dump through `noise` for cross-framework parity)
        return jnp.asarray(_fixed_noise(self.cfg.noise_frames, self.est_cfg.out_channels))

    def __call__(self, mu: jax.Array, mask: jax.Array, spks: jax.Array,
                 cond: jax.Array, n_timesteps: int = 10, temperature: float = 1.0,
                 noise: Optional[jax.Array] = None, streaming: bool = False,
                 exact_pad_mask: bool = False,
                 chunk_anchor: Optional[jax.Array] = None) -> jax.Array:
        """mu [B,T,80], mask [B,T] float, spks [B,80], cond [B,T,80] -> mel [B,T,80]."""
        B, T, C = mu.shape
        z = (self.rand_noise[:, :T, :] if noise is None else noise) * temperature
        z = jnp.broadcast_to(z, (B, T, C)).astype(mu.dtype)
        t_span = cosine_t_span(n_timesteps, mu.dtype)
        return self.solve_euler(z, t_span, mu, mask, spks, cond, streaming,
                                exact_pad_mask=exact_pad_mask,
                                chunk_anchor=chunk_anchor)

    def solve_euler(self, x, t_span, mu, mask, spks, cond, streaming=False,
                    exact_pad_mask=False, chunk_anchor=None):
        B = x.shape[0]
        r = self.cfg.inference_cfg_rate
        mask2 = jnp.concatenate([mask, mask], axis=0)
        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        anchor2 = (None if chunk_anchor is None
                   else jnp.tile(jnp.asarray(chunk_anchor), 2))

        ts = t_span[:-1]
        dts = t_span[1:] - t_span[:-1]

        def step(mdl, x, t_dt):
            t, dt = t_dt
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.full((2 * B,), t, x.dtype)
            v = mdl.estimator(x2, mask2, mu2, t2, spks2, cond2, streaming,
                              exact_pad_mask=exact_pad_mask,
                              chunk_anchor=anchor2)
            v_cond, v_uncond = v[:B], v[B:]
            dphi = (1.0 + r) * v_cond - r * v_uncond
            return x + dt * dphi, None

        # lifted scan: estimator params broadcast across steps, compiled once
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        x, _ = scan(self, x, (ts, dts))
        return x

    def compute_loss(self, x1, mask, mu, spks, cond, rng, streaming=False):
        """Masked OT-CFM MSE loss (reference flow_matching.py:167-206)."""
        B, T, C = mu.shape
        k_t, k_z, k_cfg = jax.random.split(rng, 3)
        t = jax.random.uniform(k_t, (B, 1, 1), mu.dtype)
        if self.cfg.t_scheduler == "cosine":
            t = 1.0 - jnp.cos(t * 0.5 * jnp.pi)
        z = jax.random.normal(k_z, x1.shape, x1.dtype)
        y = (1.0 - (1.0 - self.cfg.sigma_min) * t) * z + t * x1
        u = x1 - (1.0 - self.cfg.sigma_min) * z
        if self.cfg.training_cfg_rate > 0:
            keep = (jax.random.uniform(k_cfg, (B,)) > self.cfg.training_cfg_rate)
            keep = keep.astype(mu.dtype)
            mu = mu * keep[:, None, None]
            spks = spks * keep[:, None]
            cond = cond * keep[:, None, None]
        pred = self.estimator(y, mask, mu, t[:, 0, 0], spks, cond, streaming)
        m = mask[..., None]
        loss = jnp.sum(((pred - u) * m) ** 2) / (jnp.sum(mask) * C)
        return loss, y


# --------------------------------------------------------------------------
# token -> mel wrapper
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class FlowConfig:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    input_frame_rate: int = 25
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    encoder: ConformerConfig = field(default_factory=lambda: ConformerConfig(
        dim=512, heads=8, linear_units=2048, num_blocks=6,
        dropout_rate=0.1, attention_dropout_rate=0.1, input_size=512,
        static_chunk_size=50))
    cfm: CFMConfig = field(default_factory=CFMConfig)
    estimator: EstimatorConfig = field(default_factory=EstimatorConfig)
    # serving compute dtype for the token->mu conformer encoder ("float32" |
    # "bfloat16").  The rel-pos attention materializes [B, H, T, 2T-1] score
    # tensors (espnet matrix_bd) — at serving shapes that is HBM-bound, so
    # bf16 halves the dominant traffic.  With "bfloat16" the caller should
    # also cast the `encoder` params subtree (utils.dtype.to_bf16); the
    # embedding and output projection stay fp32, and mu is returned fp32.
    # The reference serves the whole flow stack in fp16 (cli/model.py:43-45).
    encoder_dtype: str = "float32"


class CausalMaskedDiffWithXvec(nn.Module):
    """CosyVoice2 flow model (reference flow/flow.py:163-319)."""

    cfg: FlowConfig = field(default_factory=FlowConfig)

    def setup(self):
        cfg = self.cfg
        self.input_embedding = nn.Embed(cfg.vocab_size, cfg.input_size)
        self.spk_embed_affine_layer = nn.Dense(cfg.output_size)
        self.encoder = UpsampleConformerEncoder(
            cfg.encoder, up_blocks=4, pre_lookahead_len=cfg.pre_lookahead_len,
            up_stride=cfg.token_mel_ratio,
            # stream family (UpsampleConformerEncoder_v2) gates the chunk
            # mask on the runtime streaming flag; the base v2 encoder chunks
            # whenever static_chunk_size > 0 (see conformer.py chunk_always)
            chunk_always=not cfg.estimator.stream)
        self.encoder_proj = nn.Dense(cfg.output_size)
        self.decoder = CausalConditionalCFM(cfg.cfm, cfg.estimator)

    def _encode(self, token, token_len, streaming=False, deterministic=True,
                finalize=True, chunk_anchor=None):
        mask = make_non_pad_mask(token_len, token.shape[1])
        emb = self.input_embedding(jnp.maximum(token, 0)) * mask[..., None]
        emb = emb.astype(jnp.dtype(self.cfg.encoder_dtype))
        if not finalize:
            # stream chunks keep the last pre_lookahead tokens as real
            # lookahead context instead of the zero pad
            # (flow.py:430-433 StreamMaskedDiffWithXvec.inference)
            la = self.cfg.pre_lookahead_len
            emb, ctx = emb[:, :-la], emb[:, -la:]
            h, pad2 = self.encoder(emb, token_len, streaming=streaming,
                                   context=ctx, deterministic=deterministic,
                                   chunk_anchor=chunk_anchor)
        else:
            h, pad2 = self.encoder(emb, token_len, streaming=streaming,
                                   deterministic=deterministic,
                                   chunk_anchor=chunk_anchor)
        return self.encoder_proj(h.astype(jnp.float32)), pad2

    def inference(self, token, token_len, prompt_feat, embedding,
                  n_timesteps: int = 10, noise: Optional[jax.Array] = None,
                  streaming: bool = False, finalize: bool = True,
                  prompt_feat_len: Optional[jax.Array] = None,
                  chunk_anchor: Optional[jax.Array] = None) -> jax.Array:
        """token [B, Tp+Tg] (prompt tokens ++ generated tokens, already
        concatenated and trimmed to ratio-multiples by the caller),
        prompt_feat [B, P, 80] with P = ratio * prompt_token_len,
        embedding [B, spk_embed_dim] -> mel [B, ratio*T - P, 80].

        With `prompt_feat_len` [B] (ragged batched serving: every request has
        its own prompt length, right-padded to a shared P), prompt rows past
        each request's length are zeroed in the conditioning and the FULL
        mel [B, ratio*T, 80] is returned — the caller slices each row at
        [prompt_feat_len[b] : ratio*token_len[b]].
        """
        spks = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True).clip(1e-12)
        spks = self.spk_embed_affine_layer(spks)
        h, _ = self._encode(token, token_len, streaming=streaming,
                            finalize=finalize, chunk_anchor=chunk_anchor)
        P = prompt_feat.shape[1]
        T2 = h.shape[1]
        conds = jnp.zeros((h.shape[0], T2, self.cfg.output_size), h.dtype)
        conds = conds.at[:, :P].set(prompt_feat)
        if prompt_feat_len is not None:
            keep = jnp.arange(T2)[None, :] < prompt_feat_len[:, None]
            conds = jnp.where(keep[..., None], conds, 0.0)
        mask = make_non_pad_mask(token_len * self.cfg.token_mel_ratio, T2).astype(h.dtype)
        anchor2 = (None if chunk_anchor is None
                   else jnp.asarray(chunk_anchor) * self.cfg.token_mel_ratio)
        feat = self.decoder(h, mask, spks, conds, n_timesteps=n_timesteps,
                            noise=noise, streaming=streaming,
                            exact_pad_mask=True, chunk_anchor=anchor2)
        if prompt_feat_len is not None:
            return feat
        return feat[:, P:, :]

    def __call__(self, token, token_len, feat, feat_len, embedding, rng,
                 streaming: bool = False, deterministic: bool = False):
        """Training loss.  feat [B, Tf, 80] mel target, Tf == ratio * token T.

        The 0-30%% random prompt-prefix conditioning (flow.py:243-248) is
        sampled here with jax PRNG; 50%% of samples get no conditioning.
        """
        cfg = self.cfg
        k_cond_on, k_cond_len, k_cfm = jax.random.split(rng, 3)
        spks = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True).clip(1e-12)
        spks = self.spk_embed_affine_layer(spks)
        h, _ = self._encode(token, token_len, streaming=streaming,
                            deterministic=deterministic)
        B, T2, _ = h.shape
        feat = feat[:, :T2, :]
        feat_len = jnp.minimum(feat_len, T2)

        use_cond = jax.random.bernoulli(k_cond_on, 0.5, (B,))
        frac = jax.random.uniform(k_cond_len, (B,))
        idx = (frac * 0.3 * feat_len).astype(jnp.int32)
        pos = jnp.arange(T2)[None, :]
        cond_mask = (pos < idx[:, None]) & use_cond[:, None]
        conds = jnp.where(cond_mask[..., None], feat, 0.0)

        mask = make_non_pad_mask(feat_len, T2).astype(h.dtype)
        loss, _ = self.decoder.compute_loss(feat, mask, h, spks, conds, k_cfm,
                                            streaming=streaming)
        return {"loss": loss}


class StreamMaskedDiffWithXvec(CausalMaskedDiffWithXvec):
    """Unified stream/non-stream flow model (reference flow/flow.py:322-455).

    Same submodule layout as CausalMaskedDiffWithXvec; the differences are
    all runtime flags this base class already routes:
      * training picks streaming on/off per batch (flow.py:372; here the
        train loop passes `streaming` explicitly and alternates),
      * `streaming=True` applies static chunk masks in the encoder
        (chunk, then 2x chunk after upsample) and — with
        `estimator.stream=True` — chunked attention in the CFM estimator
        (StreamConditionalDecoder, decoder.py:337-537),
      * non-finalize chunks pass the last `pre_lookahead_len` tokens as
        real encoder lookahead context (flow.py:429-433).

    Use `FlowConfig(estimator=EstimatorConfig(stream=True), ...)` (the
    `flow_stream` registry kind) so the estimator honors the chunk masks.

    NOTE: in the reference fork this path is latent-broken —
    `PreLookaheadLayer.forward` (upsample_encoder.py:81) does not accept
    the `context` kwarg that `UpsampleConformerEncoder_v2.forward:502`
    passes — so behavior here follows the upstream CosyVoice semantics the
    code was lifted from (context fills the lookahead window).
    """


# --------------------------------------------------------------------------
# torch checkpoint import
# --------------------------------------------------------------------------

def import_estimator_torch(state_dict, cfg: EstimatorConfig) -> dict:
    """reference ConditionalDecoder state_dict -> params (channels-last)."""
    from cosyvoice_tpu.models.conformer import _dense, _ln
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": torch_conv_weight(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def block1d(prefix, causal):
        norm = ({"scale": jnp.asarray(sd[f"{prefix}.block.2.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.block.2.bias"])}
                if causal else
                {"scale": jnp.asarray(sd[f"{prefix}.block.1.weight"]),
                 "bias": jnp.asarray(sd[f"{prefix}.block.1.bias"])})
        return {"conv": conv(f"{prefix}.block.0"), "norm": norm}

    def resnet(prefix, causal):
        return {"block1": block1d(f"{prefix}.block1", causal),
                "block2": block1d(f"{prefix}.block2", causal),
                "mlp": _dense(sd, f"{prefix}.mlp.1"),
                "res_conv": conv(f"{prefix}.res_conv")}

    def tb(prefix):
        return {"norm1": _ln(sd, f"{prefix}.norm1"),
                "norm3": _ln(sd, f"{prefix}.norm3"),
                "to_q": _dense(sd, f"{prefix}.attn1.to_q", bias=False)["kernel"],
                "to_k": _dense(sd, f"{prefix}.attn1.to_k", bias=False)["kernel"],
                "to_v": _dense(sd, f"{prefix}.attn1.to_v", bias=False)["kernel"],
                "to_out": _dense(sd, f"{prefix}.attn1.to_out.0"),
                "ff_in": _dense(sd, f"{prefix}.ff.net.0.proj"),
                "ff_out": _dense(sd, f"{prefix}.ff.net.2")}

    causal = cfg.causal
    params = {
        "time_mlp": {"linear_1": _dense(sd, "time_mlp.linear_1"),
                     "linear_2": _dense(sd, "time_mlp.linear_2")},
        "final_block": block1d("final_block", causal),
        "final_proj": conv("final_proj"),
    }

    def resample(prefix, transpose=False):
        # Downsample1D / Upsample1D wrap their conv in `.conv`; the is_last
        # plain/causal conv sits directly at the index
        from cosyvoice_tpu.nn.conv import torch_convT_weight

        if f"{prefix}.conv.weight" in sd:
            if transpose:
                return {"conv": {"kernel": torch_convT_weight(sd[f"{prefix}.conv.weight"]),
                                 "bias": jnp.asarray(sd[f"{prefix}.conv.bias"])}}
            return {"conv": conv(f"{prefix}.conv")}
        return conv(prefix)

    n_levels = len(cfg.channels)
    for i in range(n_levels):
        params[f"down_{i}_resnet"] = resnet(f"down_blocks.{i}.0", causal)
        params[f"down_{i}_downsample"] = resample(f"down_blocks.{i}.2")
        for j in range(cfg.n_blocks):
            params[f"down_{i}_tb_{j}"] = tb(f"down_blocks.{i}.1.{j}")
    for i in range(n_levels):
        params[f"up_{i}_resnet"] = resnet(f"up_blocks.{i}.0", causal)
        params[f"up_{i}_upsample"] = resample(f"up_blocks.{i}.2", transpose=True)
        for j in range(cfg.n_blocks):
            params[f"up_{i}_tb_{j}"] = tb(f"up_blocks.{i}.1.{j}")
    for i in range(cfg.num_mid_blocks):
        params[f"mid_{i}_resnet"] = resnet(f"mid_blocks.{i}.0", causal)
        for j in range(cfg.n_blocks):
            params[f"mid_{i}_tb_{j}"] = tb(f"mid_blocks.{i}.1.{j}")
    return {"params": params}


def import_flow_torch(state_dict, cfg: FlowConfig) -> dict:
    """reference CausalMaskedDiffWithXvec state_dict -> params pytree."""
    from cosyvoice_tpu.models.conformer import _dense, import_upsample_encoder_torch

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    est_sd = {k[len("decoder.estimator."):]: v for k, v in sd.items()
              if k.startswith("decoder.estimator.")}
    params = {
        "input_embedding": {"embedding": jnp.asarray(sd["input_embedding.weight"])},
        "spk_embed_affine_layer": _dense(sd, "spk_embed_affine_layer"),
        "encoder_proj": _dense(sd, "encoder_proj"),
        "encoder": import_upsample_encoder_torch(enc_sd, cfg.encoder)["params"],
        "decoder": {"estimator": import_estimator_torch(est_sd, cfg.estimator)["params"]},
    }
    return {"params": params}


# --------------------------------------------------------------------------
# v1: MaskedDiffWithXvec (length-regulated, non-causal CFM with flow cache)
# --------------------------------------------------------------------------

def interp_linear(x: jax.Array, new_len: int) -> jax.Array:
    """F.interpolate(mode='linear', align_corners=False) on [B, T, C]."""
    T = x.shape[1]
    pos = (jnp.arange(new_len) + 0.5) * T / new_len - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)[None, :, None]
    return x[:, lo] * (1 - w) + x[:, hi] * w


class InterpolateRegulator(nn.Module):
    """Linear-interp upsampling + (conv/GN/Mish)xN + conv1 head
    (reference flow/length_regulator.py:21-70)."""

    channels: int
    n_stages: int = 4
    groups: int = 1

    @nn.compact
    def _model(self, x: jax.Array) -> jax.Array:
        for i in range(self.n_stages):
            x = Conv1d(self.channels, 3, padding=1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name=f"norm_{i}")(x)
            x = mish(x)
        return Conv1d(self.channels, 1, name="out_conv")(x)

    def __call__(self, x: jax.Array, ylens: jax.Array, out_len: int) -> jax.Array:
        mask = make_non_pad_mask(ylens, out_len).astype(x.dtype)[..., None]
        x = interp_linear(x, out_len)
        return self._model(x) * mask

    def inference(self, x1: jax.Array, x2: jax.Array, mel_len1: int,
                  mel_len2: int, input_frame_rate: int = 50,
                  sample_rate: int = 22050) -> jax.Array:
        """Prompt/gen interpolated separately; gen split head/mid/tail at
        20-token edges to keep boundaries clean (length_regulator.py:52-70)."""
        if x2.shape[1] > 40:
            edge = int(20 / input_frame_rate * sample_rate / 256)
            parts = [interp_linear(x2[:, :20], edge),
                     interp_linear(x2[:, 20:-20], mel_len2 - 2 * edge),
                     interp_linear(x2[:, -20:], edge)]
            x2 = jnp.concatenate(parts, axis=1)
        else:
            x2 = interp_linear(x2, mel_len2)
        if x1.shape[1] != 0:
            x = jnp.concatenate([interp_linear(x1, mel_len1), x2], axis=1)
        else:
            x = x2
        return self._model(x)


class ConditionalCFM(CausalConditionalCFM):
    """v1 CFM: fresh gaussian noise per call + flow_cache pinning the prompt
    and the last-34-frame overlap across streaming chunks
    (flow_matching.py:38-70)."""

    def __call__(self, mu, mask, spks, cond, n_timesteps: int = 10,
                 temperature: float = 1.0, rng=None, noise=None,
                 prompt_len: int = 0, flow_cache=None, streaming=False):
        """flow_cache: None or (z_cache, mu_cache) [B, Lc, 80]; returns
        (mel, new_flow_cache).  `noise` overrides the fresh gaussian draw
        (cross-framework parity hook)."""
        B, T, C = mu.shape
        if noise is None:
            assert rng is not None, "v1 CFM draws fresh noise: pass rng"
            noise = jax.random.normal(rng, mu.shape, mu.dtype)
        z = noise * temperature
        if flow_cache is not None:
            m = min(flow_cache[0].shape[1], T)
            z = z.at[:, :m].set(flow_cache[0][:, :m])
            mu = mu.at[:, :m].set(flow_cache[1][:, :m])
        z_cache = jnp.concatenate([z[:, :prompt_len], z[:, -34:]], axis=1)
        mu_cache = jnp.concatenate([mu[:, :prompt_len], mu[:, -34:]], axis=1)
        t_span = cosine_t_span(n_timesteps, mu.dtype)
        mel = self.solve_euler(z, t_span, mu, mask, spks, cond, streaming)
        return mel, (z_cache, mu_cache)


@dataclass(frozen=True)
class FlowV1Config:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 4096
    input_frame_rate: int = 25
    encoder: ConformerConfig = field(default_factory=lambda: ConformerConfig(
        dim=512, heads=8, linear_units=2048, num_blocks=6,
        dropout_rate=0.1, attention_dropout_rate=0.1, input_size=512))
    cfm: CFMConfig = field(default_factory=CFMConfig)
    estimator: EstimatorConfig = field(default_factory=lambda: EstimatorConfig(
        in_channels=320, out_channels=80, causal=False, channels=(256, 256),
        n_blocks=4, num_mid_blocks=12, num_heads=8, attention_head_dim=64))
    regulator_stages: int = 4


class MaskedDiffWithXvec(nn.Module):
    """CosyVoice-v1 flow model (reference flow/flow.py:25-160)."""

    cfg: FlowV1Config = field(default_factory=FlowV1Config)

    def setup(self):
        cfg = self.cfg
        from cosyvoice_tpu.models.conformer import ConformerEncoder

        self.input_embedding = nn.Embed(cfg.vocab_size, cfg.input_size)
        self.spk_embed_affine_layer = nn.Dense(cfg.output_size)
        self.encoder = ConformerEncoder(cfg.encoder)
        self.encoder_proj = nn.Dense(cfg.output_size)
        self.length_regulator = InterpolateRegulator(cfg.output_size,
                                                     cfg.regulator_stages)
        self.decoder = ConditionalCFM(cfg.cfm, cfg.estimator)

    def inference(self, token, token_len, prompt_feat, embedding, rng=None,
                  prompt_token_len: int = 0, mel_len2: int = 0,
                  n_timesteps: int = 10, noise=None,
                  flow_cache=None, sample_rate: int = 22050):
        """token = [prompt_token ++ gen_token] [1, T]; prompt_feat [1, P, 80];
        mel_len2 = gen-mel frames (token_len2/fr*sr/256, computed by caller).
        Returns (mel [1, mel_len2, 80], new_flow_cache)."""
        cfg = self.cfg
        spks = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True).clip(1e-12)
        spks = self.spk_embed_affine_layer(spks)
        mask = make_non_pad_mask(token_len, token.shape[1])
        emb = self.input_embedding(jnp.maximum(token, 0)) * mask[..., None]
        h, _ = self.encoder(emb, token_len)
        h = self.encoder_proj(h)
        P = prompt_feat.shape[1]
        h = self.length_regulator.inference(
            h[:, :prompt_token_len], h[:, prompt_token_len:], P, mel_len2,
            cfg.input_frame_rate, sample_rate)
        T2 = P + mel_len2
        conds = jnp.zeros((h.shape[0], T2, cfg.output_size), h.dtype)
        conds = conds.at[:, :P].set(prompt_feat)
        mel_mask = jnp.ones((h.shape[0], T2), h.dtype)
        mel, flow_cache = self.decoder(h, mel_mask, spks, conds,
                                       n_timesteps=n_timesteps, rng=rng,
                                       noise=noise, prompt_len=P,
                                       flow_cache=flow_cache)
        return mel[:, P:], flow_cache

    def __call__(self, token, token_len, feat, feat_len, embedding, rng,
                 deterministic: bool = False):
        """Training loss (flow/flow.py:64-106)."""
        cfg = self.cfg
        k_cond_on, k_cond_len, k_cfm = jax.random.split(rng, 3)
        spks = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True).clip(1e-12)
        spks = self.spk_embed_affine_layer(spks)
        mask = make_non_pad_mask(token_len, token.shape[1])
        emb = self.input_embedding(jnp.maximum(token, 0)) * mask[..., None]
        h, _ = self.encoder(emb, token_len, deterministic=deterministic)
        h = self.encoder_proj(h)
        T2 = feat.shape[1]
        h = self.length_regulator(h, feat_len, T2)

        B = h.shape[0]
        use_cond = jax.random.bernoulli(k_cond_on, 0.5, (B,))
        frac = jax.random.uniform(k_cond_len, (B,))
        idx = (frac * 0.3 * feat_len).astype(jnp.int32)
        pos = jnp.arange(T2)[None, :]
        cond_mask = (pos < idx[:, None]) & use_cond[:, None]
        conds = jnp.where(cond_mask[..., None], feat, 0.0)
        fmask = make_non_pad_mask(feat_len, T2).astype(h.dtype)
        loss, _ = self.decoder.compute_loss(feat, fmask, h, spks, conds, k_cfm)
        return {"loss": loss}


def import_flow_v1_torch(state_dict, cfg: FlowV1Config) -> dict:
    from cosyvoice_tpu.models.conformer import (_dense,
                                                import_conformer_encoder_torch)
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    est_sd = {k[len("decoder.estimator."):]: v for k, v in sd.items()
              if k.startswith("decoder.estimator.")}
    reg = {}
    for i in range(cfg.regulator_stages):
        reg[f"conv_{i}"] = {"kernel": torch_conv_weight(sd[f"length_regulator.model.{3 * i}.weight"]),
                            "bias": jnp.asarray(sd[f"length_regulator.model.{3 * i}.bias"])}
        reg[f"norm_{i}"] = {"scale": jnp.asarray(sd[f"length_regulator.model.{3 * i + 1}.weight"]),
                            "bias": jnp.asarray(sd[f"length_regulator.model.{3 * i + 1}.bias"])}
    reg["out_conv"] = {"kernel": torch_conv_weight(sd[f"length_regulator.model.{3 * cfg.regulator_stages}.weight"]),
                       "bias": jnp.asarray(sd[f"length_regulator.model.{3 * cfg.regulator_stages}.bias"])}
    return {"params": {
        "input_embedding": {"embedding": jnp.asarray(sd["input_embedding.weight"])},
        "spk_embed_affine_layer": _dense(sd, "spk_embed_affine_layer"),
        "encoder_proj": _dense(sd, "encoder_proj"),
        "encoder": import_conformer_encoder_torch(enc_sd, cfg.encoder)["params"],
        "length_regulator": reg,
        "decoder": {"estimator": import_estimator_torch(est_sd, cfg.estimator)["params"]},
    }}
