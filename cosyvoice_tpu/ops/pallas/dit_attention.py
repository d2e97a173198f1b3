"""Query-chunked full self-attention Pallas kernel for the CFM estimator.

Shape regime (flow/decoder.py DiT blocks at serving): T ~ 1.1k mel frames,
H=8 heads, D=64, full (non-causal) attention with a prefix-valid pad mask.
The stock TPU flash kernel wants [B, H, T, D], which costs three input
transposes plus one output transpose per block in XLA (they show up as
"data formatting" copies around the custom call).  This kernel reads the
model's natural [B, T, H*D] layout directly: each grid cell covers one batch
row, a 128-lane group of heads (two D=64 heads, satisfying Mosaic's (8,128)
block tiling), and a chunk of queries.  Keys/values stay whole-row, so the
softmax is single-pass and EXACT — no online rescaling; chunking queries
only bounds the fp32 score tile's VMEM footprint.

Per cell and head:  S = q_chunk k^T (fp32 accum) + pad-bias row -> softmax
-> (P@V)/l.  Forward-only: training uses the reference-faithful XLA path.

The softmax skips the max-subtraction pass: exp ratios are invariant to the
shift, so it only exists for overflow safety.  sm_scale*log2(e) is folded
into the query tile so the probability pass is a single exp2 (the VPU
computes exp as exp2(x*log2e) anyway), and a clamp at 108 in the exp2
domain (2^108 ~ 3.2e32; a whole-row fp32 sum over T<=4096 stays < ~1.3e36
<< fp32 max) provides the overflow safety in one VPU op instead of two
whole-tile passes (max-reduce + subtract).  The kernel is VPU-bound on
exactly these passes (D=64 makes the MXU work ~6x cheaper than the
softmax), so this is worth ~14% wall time.  Scores only reach the clamp if
|q.k|*sm_scale*log2e > 108, far outside LayerNorm'd activations; distortion
needs TWO+ keys past the clamp (one clamped winner saturates to weight ~1
exactly as true softmax would).  The divide is floored at 1e-30 so an
all-underflow row yields zeros, not NaN.  Pad-key bias stays -1e9 -> exp2
gives exactly 0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *,
            sm_scale: float, heads_per_blk: int, head_dim: int):
    b = pl.program_id(0)
    L = lens_ref[b]
    T = k_ref.shape[1]
    # pad-key mask as a [1, T] bias row (broadcasts over queries) — a full
    # [Tq, T] iota would burn VMEM for nothing
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    bias = jnp.where(jrow < L, 0.0, -1e9).astype(jnp.float32)
    for i in range(heads_per_blk):  # static unroll over the head group
        sl = slice(i * head_dim, (i + 1) * head_dim)
        # fold sm_scale AND log2(e) into the [Tq, D] query tile: one small
        # VPU pass there replaces a whole [Tq, T] score-tile multiply, and
        # exp2 replaces exp (which the VPU computes as exp2(x*log2e) anyway)
        # — the kernel is VPU-bound on these score passes, not on the MXU
        q = (q_ref[0, :, sl].astype(jnp.float32) * (sm_scale * _LOG2E))
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # clamp 108: 2^108 ~ 3.2e32; whole-row sum over T<=4096 < 1.3e36 (fp32
        # max 3.4e38) — same overflow-safety argument as the exp/75 clamp
        p = jnp.exp2(jnp.minimum(s + bias, 108.0))
        l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _q_chunk(T: int, itemsize: int) -> int:
    """Largest 128-multiple divisor of T whose fp32 score tile (~3 live
    [Tq, T] temps) stays within ~16 MB.  Bigger chunks win (fewer grid
    cells + K/V re-reads): whole-row at T=1152 measured 3.3% faster than
    Tq=384 (tools/probe_dit_kernel.py)."""
    budget = 16 * 1024 * 1024
    for tq in range(T, 127, -128):
        if T % tq == 0 and tq * T * 4 * 3 <= budget:
            return tq
    return 0


def dit_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  lengths: jax.Array, sm_scale: float,
                  interpret: bool = False) -> jax.Array:
    """q/k/v [B, T, H, D] -> o [B, T, H, D]; requires supports(T, H, D).

    lengths [B] int32: keys at j >= lengths[b] are excluded for every query
    (prefix-valid padding); pad-row queries produce garbage the caller masks.
    """
    B, T, H, D = q.shape
    HD = H * D
    heads_per_blk = max(128 // D, 1)
    GD = heads_per_blk * D
    Tq = _q_chunk(T, q.dtype.itemsize)
    assert Tq and HD % GD == 0, (T, H, D)
    lengths = lengths.astype(jnp.int32)
    qf, kf, vf = (x.reshape(B, T, HD) for x in (q, k, v))
    qspec = pl.BlockSpec((1, Tq, GD), lambda b, g, t, lens: (b, t, g))
    kvspec = pl.BlockSpec((1, T, GD), lambda b, g, t, lens: (b, 0, g))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, HD // GD, T // Tq),
        in_specs=[qspec, kvspec, kvspec], out_specs=qspec)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale,
                          heads_per_blk=heads_per_blk, head_dim=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        interpret=interpret,
    )(lengths, qf, kf, vf)
    return out.reshape(B, T, H, D)


def supports(T: int, H: int, D: int) -> bool:
    """Shape eligibility: lane-groupable heads and an aligned, chunkable T."""
    return (T % 128 == 0 and D <= 128 and 128 % D == 0
            and (H * D) % 128 == 0 and _q_chunk(T, 4) > 0
            and T * 128 * 2 * 3 <= 4 * 1024 * 1024)  # whole-row k/v resident


def dit_attention_packed(qkv: jax.Array, lengths: jax.Array, sm_scale: float,
                         head_dim: int = 64,
                         interpret: bool = False) -> jax.Array:
    """Same kernel, but reading q/k/v straight out of the packed [B, T, 3*H*D]
    projection (lane order q | k | v, heads minor).

    A custom call needs dense operands, so slicing q/k/v out of the packed
    qkv matmul output first costs three whole-tensor copies (~0.5 ms at
    serving shapes, ~15%% of the DiT block).  Passing the SAME array three
    times with lane-offset BlockSpecs gives the kernel three views of one
    HBM buffer — no copies.  Returns o [B, T, H*D].
    """
    B, T, HD3 = qkv.shape
    HD = HD3 // 3
    D = head_dim
    heads_per_blk = max(128 // D, 1)
    GD = heads_per_blk * D
    Tq = _q_chunk(T, qkv.dtype.itemsize)
    assert Tq and HD % GD == 0, (T, HD)
    G = HD // GD
    lengths = lengths.astype(jnp.int32)
    qspec = pl.BlockSpec((1, Tq, GD), lambda b, g, t, lens: (b, t, g))
    kspec = pl.BlockSpec((1, T, GD), lambda b, g, t, lens: (b, 0, G + g))
    vspec = pl.BlockSpec((1, T, GD), lambda b, g, t, lens: (b, 0, 2 * G + g))
    ospec = pl.BlockSpec((1, Tq, GD), lambda b, g, t, lens: (b, t, g))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, G, T // Tq),
        in_specs=[qspec, kspec, vspec], out_specs=ospec)
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale,
                          heads_per_blk=heads_per_blk, head_dim=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, HD), qkv.dtype),
        interpret=interpret,
    )(lengths, qkv, qkv, qkv)
