"""Fused single-token GQA decode attention + in-place KV-cache append.

This is the LM serving hot loop's kernel (reference equivalent: the CUDA-graph
captured decode of `cosyvoice/llm/qwen2_5.py:97-179` + HF attention; here the
whole thing is one Pallas program per layer).

Why not XLA ops: the decode step must (a) write one token's K/V into a
preallocated cache and (b) attend over that cache.  Expressed as
dynamic_update_slice + einsum inside lax.while_loop, XLA materializes a fresh
copy of the whole cache every step (profiled at 37% of LM decode wall time at
B=32; an aliased pallas update alone doesn't help — XLA copy-insertion
reintroduces the copy around the alias).  The fused kernel sidesteps the
aliasing analysis entirely: the cache is READ chunk-by-chunk per batch cell,
the new token is folded into the softmax separately (so there is no
read-after-write hazard), and only the 8-sublane-aligned window containing
row `pos` is written back (aliased buffers, ~2 KB instead of ~11.5 MB).

Layout: the cache is packed [B, T_max, KH*D] — for CosyVoice2's Qwen2-0.5B
(KH=2, D=64) the minor dim is exactly 128 lanes, so cache reads move exactly
the payload bytes.  The model's head-major [B, KH, T, D] layout would be
lane-padded 64->128 by XLA's (8,128) tiling, doubling every read.

Decode is cache-bandwidth-bound, so the kernel avoids reading the unwritten
tail: the time axis is a grid dimension whose index_map CLAMPS at the chunk
containing `pos` — Pallas skips the DMA when consecutive grid cells map to
the same block, so chunks beyond the frontier are fetched zero times.  The
softmax runs WITHOUT the max-subtraction pass (exp ratios are shift
invariant; a clamp at 75 bounds overflow: exp(75)~2.7e32, a whole-row fp32
sum over T<=4096 keys stays <~1.1e36 << 3.4e38), which makes cross-chunk
accumulation purely additive: no online rescaling, just o_acc += p V and
l_acc += sum p in fp32 VMEM scratch.  The clamp only distorts when TWO OR
MORE keys' scaled logits exceed 75 (|q.k| > 600 at D=64 — far outside
RMSNorm'd activations; single-key saturation is exact because softmax of one
clamped winner is ~1 either way); the division is floored at 1e-30 so an
all-underflow row (every score < ~-87) degrades to zeros, not NaN.

Per (batch-cell, chunk) and kv head g (static unroll):
  s      = q_g kc_g^T * scale + bias   (fp32; bias masks pad rows, the kernel
                                        additionally masks j >= pos)
  p      = exp(min(s, 75));  o_acc += p vc_g;  l_acc += sum p
and at the last chunk:
  s_self = q_g . k_new_g * scale;  p_self = exp(min(s_self, 75))
  o_g    = (o_acc + p_self v_new_g) / max(l_acc + p_self, 1e-30)
then RMW the aligned 8-row window of ck/cv with the new K/V at row pos%8.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref, q_ref, kn_ref, vn_ref, ck_ref, cv_ref, bias_ref,
            o_ref, ckw_ref, cvw_ref, o_acc, l_acc, *, kv_heads: int,
            head_dim: int, sm_scale: float, chunk: int, n_chunks: int,
            per_row: bool):
    # per_row: pos is a [B] vector (continuous-batching engine — every slot
    # sits at its own sequence length; block batch BB is 1 so each grid cell
    # owns one row's frontier).  Scalar pos: all rows share the frontier.
    pos = pos_ref[pl.program_id(0)] if per_row else pos_ref[0]
    t = pl.program_id(1)
    BB = ck_ref.shape[0]
    KHD = ck_ref.shape[2]
    G = q_ref.shape[1]
    last_live = pos // chunk  # chunks beyond this are clamped (never DMA'd)

    @pl.when(t == 0)
    def _init():
        o_acc[...] = jnp.zeros_like(o_acc)
        l_acc[...] = jnp.zeros_like(l_acc)

    @pl.when(t <= last_live)
    def _accumulate():
        base = t * chunk
        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + base
        for bb in range(BB):
            # keys j < pos only; j == pos is the new token, handled at the
            # final chunk via s_self (its cache row is stale until the write)
            bias = jnp.where(jrow < pos, bias_ref[bb].astype(jnp.float32), -1e9)
            kc = ck_ref[bb]          # [chunk, KH*D]
            vc = cv_ref[bb]
            for g in range(kv_heads):
                sl = slice(g * head_dim, (g + 1) * head_dim)
                qg = q_ref[bb, :, sl]                      # [G, D]
                s = jax.lax.dot_general(qg, kc[:, sl], (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                p = jnp.exp(jnp.minimum(s * sm_scale + bias, 75.0))
                o = jax.lax.dot_general(p.astype(vc.dtype), vc[:, sl],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                o_acc[bb, :, sl] += o
                l_acc[bb, g] += jnp.broadcast_to(
                    jnp.sum(p, axis=1, keepdims=True), l_acc.shape[2:])

    @pl.when(t == n_chunks - 1)
    def _finalize():
        r = pos % 8
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, KHD), 0)
        al = pl.multiple_of(((pos % chunk) // 8) * 8, 8)
        for bb in range(BB):
            kn = kn_ref[bb]          # [1, KH*D]
            vn = vn_ref[bb]
            for g in range(kv_heads):
                sl = slice(g * head_dim, (g + 1) * head_dim)
                qg = q_ref[bb, :, sl]
                s_self = jnp.sum(qg.astype(jnp.float32)
                                 * kn[:, sl].astype(jnp.float32),
                                 axis=1, keepdims=True) * sm_scale
                p_self = jnp.exp(jnp.minimum(s_self, 75.0))
                l = jnp.maximum(l_acc[bb, g][:, :1] + p_self, 1e-30)
                o = o_acc[bb, :, sl] + p_self * vn[:, sl].astype(jnp.float32)
                o_ref[bb, :, sl] = (o / l).astype(o_ref.dtype)
            # in-place append: RMW the aligned 8-row window around pos.
            # ck_ref here is the clamped chunk pos // chunk, which contains
            # row pos, so the window offset is relative to the chunk base.
            ckw_ref[bb] = jnp.where(rows == r, kn, ck_ref[bb, pl.ds(al, 8), :])
            cvw_ref[bb] = jnp.where(rows == r, vn, cv_ref[bb, pl.ds(al, 8), :])


def lm_decode_attention(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                        ck: jax.Array, cv: jax.Array, bias_row: jax.Array,
                        pos: jax.Array, head_dim: int, sm_scale: float,
                        interpret: bool = False):
    """One GQA decode-attention step over a packed cache, appending in place.

    q        [B, G, KH*D]  query heads grouped kv-head-major (G = H // KH),
                           head g's block in lanes [g*D, (g+1)*D)
    k_new    [B, 1, KH*D]  this step's K/V (written to the cache at `pos`)
    v_new    [B, 1, KH*D]
    ck, cv   [B, T, KH*D]  cache buffers; DONATED (aliased into the outputs)
    bias_row [B, T]        additive key bias (0 valid / -1e9 pad); the kernel
                           itself masks j >= pos
    pos      int32, scalar or [B]: write index; keys j < pos plus the new
                           token attend.  A [B] vector gives every row its own
                           frontier (continuous-batching decode).
    returns (o [B, G, KH*D], ck, cv)
    """
    B, G, KHD = q.shape
    T = ck.shape[1]
    assert ck.shape == cv.shape == (B, T, KHD)
    assert KHD % head_dim == 0
    kv_heads = KHD // head_dim
    chunk = 128 if T % 128 == 0 else T
    assert T % chunk == 0 and chunk % 8 == 0
    n_chunks = T // chunk
    per_row = getattr(pos, "ndim", 0) == 1
    # rows per grid cell: amortize per-cell pipeline overhead while keeping
    # the k/v chunk blocks comfortably inside VMEM.  Per-row frontiers force
    # BB=1: each row reads/writes windows at its own pos.
    BB = 1
    if not per_row:
        for cand in (8, 4, 2):
            if B % cand == 0 and 2 * cand * chunk * KHD * ck.dtype.itemsize <= 4 * 1024 * 1024:
                BB = cand
                break
    if per_row:
        assert pos.shape == (B,)
        pos_arr = pos.astype(jnp.int32)

        def live(b, t, pos):
            return jnp.minimum(t, pos[b] // chunk)

        def wrow(b, t, pos):
            return pos[b] // 8
    else:
        pos_arr = jnp.reshape(pos.astype(jnp.int32), (1,))

        def live(b, t, pos):
            return jnp.minimum(t, pos[0] // chunk)

        def wrow(b, t, pos):
            return pos[0] // 8
    bias_row = bias_row.reshape(B, 1, T)
    kern = functools.partial(_kernel, kv_heads=kv_heads, head_dim=head_dim,
                             sm_scale=sm_scale, chunk=chunk, n_chunks=n_chunks,
                             per_row=per_row)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B // BB, n_chunks),
        in_specs=[
            pl.BlockSpec((BB, G, KHD), lambda b, t, pos: (b, 0, 0)),
            pl.BlockSpec((BB, 1, KHD), lambda b, t, pos: (b, 0, 0)),
            pl.BlockSpec((BB, 1, KHD), lambda b, t, pos: (b, 0, 0)),
            pl.BlockSpec((BB, chunk, KHD), lambda b, t, pos: (b, live(b, t, pos), 0)),
            pl.BlockSpec((BB, chunk, KHD), lambda b, t, pos: (b, live(b, t, pos), 0)),
            pl.BlockSpec((BB, 1, chunk), lambda b, t, pos: (b, 0, live(b, t, pos))),
        ],
        out_specs=[
            pl.BlockSpec((BB, G, KHD), lambda b, t, pos: (b, 0, 0)),
            pl.BlockSpec((BB, 8, KHD), lambda b, t, pos: (b, wrow(b, t, pos), 0)),
            pl.BlockSpec((BB, 8, KHD), lambda b, t, pos: (b, wrow(b, t, pos), 0)),
        ],
        scratch_shapes=[pltpu.VMEM((BB, G, KHD), jnp.float32),
                        pltpu.VMEM((BB, kv_heads, G, 128), jnp.float32)])
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, G, KHD), q.dtype),
                   jax.ShapeDtypeStruct(ck.shape, ck.dtype),
                   jax.ShapeDtypeStruct(cv.shape, cv.dtype)],
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(pos_arr, q, k_new, v_new, ck, cv, bias_row)
