"""Whole-DiT-block fused Pallas kernel for the CFM estimator serving path.

One grid cell = one batch row's ENTIRE DiTBlock (flow.py DiTBlock: LN ->
packed qkv matmul -> 8-head self-attention -> out proj + residual -> LN ->
gelu FFN + residual).  Motivation (measured on the serving chip,
tools/probe_dit.py at 128 CFG rows, T=1152):

  * the unfused block materializes qkv [R,T,1536], attention out [R,T,512],
    and the FFN mid [R,T,1024] through HBM every block — ~3 GB of traffic
    per block vs ~150 MB (x in + y out) fused;
  * each XLA op boundary serializes MXU and VPU phases; in one kernel
    Mosaic overlaps the per-head exp2/softmax VPU passes with the
    next head's score matmul and the surrounding projections;
  * weights (~1.4 MB/block) use constant index maps, so they are fetched
    once and stay VMEM-resident across all rows.

Whole-row attention in the model's packed layout (same math as
ops/pallas/dit_attention.py: scale*log2e folded into q, single-pass exp2
softmax with the 108 clamp, -1e9 pad-key bias from per-row lengths, 1e-30
divide floor).  LayerNorms use flax's fp32 fast-variance formula (the
ops/pallas/fused_norm.py semantics).  FFN gelu is the tanh approximation —
the serving config (EstimatorConfig.approx_gelu) already runs it.
Forward-only: training uses the reference-faithful XLA path.

COMPILE HAZARD: at the full serving shape (T=1152, 8 unrolled heads) the
Mosaic compile of this kernel ran >1 h on the remote-compile backend and
wedged its compile queue (2026-08-20) — every later program queued behind
it.  Parity is proven in interpret mode (tests/test_pallas.py) and the
config flag (EstimatorConfig.fused_block) stays OFF until a compile-time
budget is demonstrated at scale: bring it up at T=256/2 heads first and
scale in steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


def _layer_norm(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean,
                      0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _gelu_tanh(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jnp.tanh(
        0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)))).astype(x.dtype)


def _kernel(lens_ref, x_ref, g1_ref, b1_ref, wqkv_ref, wo_ref, bo_ref,
            g3_ref, b3_ref, wi_ref, bi_ref, wo2_ref, bo2_ref, o_ref, *,
            sm_scale: float, heads: int, head_dim: int):
    b = pl.program_id(0)
    L = lens_ref[b]
    x = x_ref[0]                                   # [T, DIM]
    T = x.shape[0]
    inner = heads * head_dim

    h = _layer_norm(x, g1_ref[0], b1_ref[0])
    qkv = jax.lax.dot(h, wqkv_ref[...],
                      preferred_element_type=jnp.float32).astype(x.dtype)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    bias = jnp.where(jrow < L, 0.0, -1e9).astype(jnp.float32)
    o_parts = []
    for i in range(heads):                         # static unroll
        sl = slice(i * head_dim, (i + 1) * head_dim)
        q = (qkv[:, sl].astype(jnp.float32) * (sm_scale * _LOG2E)
             ).astype(x.dtype)
        k = qkv[:, inner + i * head_dim: inner + (i + 1) * head_dim]
        v = qkv[:, 2 * inner + i * head_dim: 2 * inner + (i + 1) * head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(jnp.minimum(s + bias, 108.0))
        l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        oh = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_parts.append((oh / l).astype(x.dtype))
    o = jnp.concatenate(o_parts, axis=1)           # [T, inner]

    a = jax.lax.dot(o, wo_ref[...], preferred_element_type=jnp.float32)
    x1 = x + (a + bo_ref[0].astype(jnp.float32)).astype(x.dtype)

    h2 = _layer_norm(x1, g3_ref[0], b3_ref[0])
    m = jax.lax.dot(h2, wi_ref[...], preferred_element_type=jnp.float32)
    m = _gelu_tanh(m + bi_ref[0].astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot(m, wo2_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = x1 + (y + bo2_ref[0].astype(jnp.float32)).astype(x.dtype)


def supports(T: int, heads: int, head_dim: int, dim: int, ff: int) -> bool:
    """VMEM-bounded whole-row fusion: aligned shapes, fp32 score tile +
    packed qkv + FFN mid resident per cell."""
    inner = heads * head_dim
    vmem = (T * T * 4                # fp32 scores (+ bf16 p, compiler temps)
            + T * 3 * inner * 2      # qkv
            + T * ff * 2             # FFN mid
            + 3 * T * dim * 2)       # x, x1, out
    return (T % 128 == 0 and dim % 128 == 0 and ff % 128 == 0
            and inner % 128 == 0 and head_dim <= 128
            and vmem <= 48 * 1024 * 1024)


def dit_block_fused(x: jax.Array, lengths: jax.Array, g1, b1, wqkv, wo, bo,
                    g3, b3, wi, bi, wo2, bo2, *, sm_scale: float, heads: int,
                    head_dim: int, interpret: bool = False) -> jax.Array:
    """x [B, T, dim] -> y [B, T, dim]; requires supports(...).

    lengths [B] int32 prefix-valid pad lengths (keys at j >= lengths[b] are
    masked for every query; pad-row outputs are garbage the caller masks,
    exactly like the unfused serving path).
    """
    B, T, DIM = x.shape
    FF = wi.shape[1]
    assert supports(T, heads, head_dim, DIM, FF), (T, heads, head_dim, DIM, FF)
    lengths = lengths.astype(jnp.int32)

    def row(v):  # 1-D params as [1, N] blocks
        return v.reshape(1, -1)

    full = lambda a: pl.BlockSpec(a.shape, lambda b, lens: (0,) * a.ndim)
    operands = [x, row(g1), row(b1), wqkv, wo, row(bo), row(g3), row(b3),
                wi, row(bi), wo2, row(bo2)]
    in_specs = [pl.BlockSpec((1, T, DIM), lambda b, lens: (b, 0, 0))]
    in_specs += [full(a) for a in operands[1:]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, DIM), lambda b, lens: (b, 0, 0)))
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, heads=heads,
                          head_dim=head_dim),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, DIM), x.dtype),
        interpret=interpret,
    )(lengths, *operands)
