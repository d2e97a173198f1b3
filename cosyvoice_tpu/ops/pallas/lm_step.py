"""Persistent whole-step B=1 LM decode kernel.

STATUS (measured 2026-08-20, axon v5e): OFF on this backend.  The staged
bring-up prescribed by round-3 VERDICT #2 was done and the premise probe
(tools/probe_lm_step.py + tools/probe_pallas_dma*.py) found the limiting
factor is not kernel structure but the backend's Pallas custom-call DMA
rate: ~60 GB/s for auto-pipelined weight blocks, ~30 GB/s for manual
async_copy (independent of 1-8 way parallelism), vs ~657 GB/s that XLA's
unrolled per-layer decode reads the same int8 weights at.  At 60 GB/s a
358 MB whole-step read is ~6 ms vs XLA's 545 us — a 10x LOSS, so the
kernel stays opt-in (lm_generate_fused_step) for backends whose Pallas
DMA runs at HBM rate, and the B=1 production path stays on XLA.  The same
~60 GB/s ceiling back-computes from every round-3 kernel null result
(dit-attention "per-M-row feed", int4 per-call loss).

Design (sound where DMA is full-rate): one pallas_call per decode step
executes ALL transformer layers with a VMEM-carried hidden state: grid
(layers, 4 phases) with revolving-prefetch index maps, so each layer's
int8 weights stream through VMEM exactly once per step and the next
block's DMA overlaps the current phase's compute.  This replaces ~170 XLA
ops per step.  The reference attacks the same per-step overhead with CUDA
graphs (cosyvoice/llm/qwen2_5.py:72-124); the fused step *also* removes
the HBM round trips between ops, which CUDA graphs do not.

Phases per layer (operand blocks <= ~4.4 MB so double-buffering fits small
VMEM backends):
  p0  rms1 -> qkv proj (+bias) -> rope -> GQA attention over the layer's
      [C, kvH*D] cache row + the current k/v -> o proj -> residual;
      emits new_k/new_v [1, kvH*D] (the caller scatters them into the
      cache at `pos` — cheaper than writing the whole cache block back)
  p1  rms2 -> gate proj
  p2  rms2 -> up proj, m = silu(gate) * up
  p3  down proj -> residual

Numerics mirror the XLA decode path op for op (QDense int8: bf16 dot,
output cast to bf16, THEN scale/bias in bf16; rms_norm fp32; attention
scores fp32 with probabilities cast to bf16 for the value dot), so greedy
decode is token-identical at the tiny-model scale (tests/test_pallas.py)
and argmax-agreement-gated at 0.5B (bench.py).

B=1 only by design: the batched paths amortize weight reads across rows
already; single-stream latency is what per-step overhead dominates.  The
hidden-state rows are padded to 8 (sublane tile) — rows 1..7 are garbage
and only row 0's attention/new_kv are computed.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = 1.4426950408889634


class StepWeights(NamedTuple):
    """Per-projection stacked arrays [L, ...] (int8 kernels + f32 scales +
    f32 biases/norms), built once from the flax int8 param tree."""

    wqkv: jax.Array   # [L, H, (nq+2*nkv)*hd] int8
    sqkv: jax.Array   # [L, (nq+2*nkv)*hd] f32
    bqkv: jax.Array   # [L, (nq+2*nkv)*hd] f32
    wo: jax.Array     # [L, nq*hd, H] int8
    so: jax.Array     # [L, H] f32
    wg: jax.Array     # [L, H, I] int8
    sg: jax.Array     # [L, I] f32
    wu: jax.Array     # [L, H, I] int8
    su: jax.Array     # [L, I] f32
    wd: jax.Array     # [L, I, H] int8
    sd: jax.Array     # [L, H] f32
    n1: jax.Array     # [L, H] f32 input_layernorm
    n2: jax.Array     # [L, H] f32 post_attention_layernorm


def pack_step_weights(params: dict, num_layers: int) -> StepWeights:
    """Stack the Qwen2 int8 layer params into StepWeights (load-time)."""
    layers = params["params"]["llm"]
    get = lambda i, name: layers[f"layers_{i}"][name]

    def stk(name, key, dtype=None):
        a = jnp.stack([jnp.asarray(get(i, name)[key]) for i in range(num_layers)])
        return a if dtype is None else a.astype(dtype)

    wq, wk, wv = (stk(p, "kernel") for p in ("q_proj", "k_proj", "v_proj"))
    sq, sk, sv = (stk(p, "scale", jnp.float32) for p in ("q_proj", "k_proj", "v_proj"))
    bq, bk, bv = (stk(p, "bias", jnp.float32) for p in ("q_proj", "k_proj", "v_proj"))
    return StepWeights(
        wqkv=jnp.concatenate([wq, wk, wv], axis=2),
        sqkv=jnp.concatenate([sq, sk, sv], axis=1),
        bqkv=jnp.concatenate([bq, bk, bv], axis=1),
        wo=stk("o_proj", "kernel"), so=stk("o_proj", "scale", jnp.float32),
        wg=stk("gate_proj", "kernel"), sg=stk("gate_proj", "scale", jnp.float32),
        wu=stk("up_proj", "kernel"), su=stk("up_proj", "scale", jnp.float32),
        wd=stk("down_proj", "kernel"), sd=stk("down_proj", "scale", jnp.float32),
        n1=jnp.stack([jnp.asarray(layers[f"layers_{i}"]["input_layernorm"])
                      for i in range(num_layers)]).astype(jnp.float32),
        n2=jnp.stack([jnp.asarray(layers[f"layers_{i}"]["post_attention_layernorm"])
                      for i in range(num_layers)]).astype(jnp.float32))


def cache_to_step_layout(k_tuple, v_tuple, cache_len: int) -> tuple:
    """Head-major per-layer caches ([1, kvH, T, D] tuples) -> stacked
    [L, cache_len, kvH*D] arrays (heads packed on lanes)."""
    def one(c):
        B, KH, T, D = c.shape
        r = c[0].transpose(1, 0, 2).reshape(T, KH * D)
        if T < cache_len:
            r = jnp.pad(r, ((0, cache_len - T), (0, 0)))
        return r[:cache_len]

    return (jnp.stack([one(c) for c in k_tuple]),
            jnp.stack([one(c) for c in v_tuple]))


def _rms(x, g, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * g.astype(jnp.float32)).astype(x.dtype)


def _dq(h, w_ref, s_ref, b_ref=None):
    """QDense int8 semantics: bf16 dot -> cast bf16 -> *scale(bf16) [+bias]."""
    y = jax.lax.dot(h, w_ref[0].astype(h.dtype),
                    preferred_element_type=jnp.float32).astype(h.dtype)
    y = y * s_ref[0].astype(h.dtype)
    if b_ref is not None:
        y = y + b_ref[0].astype(h.dtype)
    return y


def _rope(x, cos_ref, sin_ref):
    """x [rows, hd] heads-as-rows; HF rotate_half convention (fp32 out,
    matching apply_rope's bf16*f32 promotion in the XLA path)."""
    hd = x.shape[-1]
    half = hd // 2
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[:, half:], xf[:, :half]], axis=1)
    return xf * cos_ref[0].astype(jnp.float32) + rot * sin_ref[0].astype(jnp.float32)


def _kernel(pos_ref, x_ref, cos_ref, sin_ref, kc_ref, vc_ref,
            wqkv, sqkv, bqkv, wo, so, wg, sg, wu, su, wd, sd, n1, n2,
            y_ref, nk_ref, nv_ref, xs, gs, ms, *,
            L: int, nq: int, nkv: int, hd: int, eps: float, sm: float):
    l, p = pl.program_id(0), pl.program_id(1)
    H = x_ref.shape[-1]
    grp = nq // nkv

    @pl.when((l == 0) & (p == 0))
    def _():
        xs[...] = x_ref[...]

    @pl.when(p == 0)
    def _():
        pos = pos_ref[0]
        x = xs[...]
        h = _rms(x, n1[0], eps)
        qkv = _dq(h, wqkv, sqkv, bqkv)                  # [8, (nq+2nkv)*hd]
        qh = _rope(qkv[0:1, :nq * hd].reshape(nq, hd), cos_ref, sin_ref)
        kh = _rope(qkv[0:1, nq * hd:(nq + nkv) * hd].reshape(nkv, hd),
                   cos_ref, sin_ref)
        vh = qkv[0:1, (nq + nkv) * hd:].reshape(nkv, hd).astype(jnp.float32)
        nk_ref[...] = kh.reshape(1, nkv * hd).astype(nk_ref.dtype)
        nv_ref[...] = vh.reshape(1, nkv * hd).astype(nv_ref.dtype)
        C = kc_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        bias = jnp.where(col < pos, 0.0, -1e30)
        o_parts = []
        for hh in range(nkv):
            sl = slice(hh * hd, (hh + 1) * hd)
            q7 = (qh[hh * grp:(hh + 1) * grp] * (sm * _LOG2E)).astype(x.dtype)
            Kh = kc_ref[0][:, sl]                       # [C, hd]
            Vh = vc_ref[0][:, sl]
            s = jax.lax.dot_general(q7, Kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s_new = jax.lax.dot_general(
                q7, kh[hh:hh + 1, :].astype(x.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [grp, 1]
            # per-row running-max subtraction (ADVICE r4): without it,
            # large score magnitudes saturate a fixed clamp and flatten the
            # distribution — safe now for arbitrary checkpoints
            sc = s + bias
            m = jnp.maximum(jnp.max(sc, axis=1, keepdims=True), s_new)
            pc = jnp.exp2(sc - m)
            pn = jnp.exp2(s_new - m)
            denom = jnp.sum(pc, axis=1, keepdims=True) + pn
            oh = jax.lax.dot_general(pc.astype(Vh.dtype), Vh,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            oh = (oh + pn * vh[hh:hh + 1, :]) / denom
            o_parts.append(oh.astype(x.dtype))
        o = jnp.concatenate(o_parts, axis=0).reshape(1, nq * hd)
        o8 = jnp.pad(o, ((0, x.shape[0] - 1), (0, 0)))
        xs[...] = x + _dq(o8, wo, so)

    @pl.when(p == 1)
    def _():
        gs[...] = _dq(_rms(xs[...], n2[0], eps), wg, sg)

    @pl.when(p == 2)
    def _():
        u = _dq(_rms(xs[...], n2[0], eps), wu, su)
        g = gs[...]
        gf = g.astype(jnp.float32)
        ms[...] = ((gf * jax.nn.sigmoid(gf)).astype(g.dtype) * u)

    @pl.when(p == 3)
    def _():
        xs[...] = xs[...] + _dq(ms[...], wd, sd)

    @pl.when((l == L - 1) & (p == 3))
    def _():
        y_ref[...] = xs[...]


@functools.partial(jax.jit, static_argnames=("nq", "nkv", "hd", "eps", "interpret"))
def lm_step_fused(w: StepWeights, x: jax.Array, k_cache: jax.Array,
                  v_cache: jax.Array, pos: jax.Array, cos: jax.Array,
                  sin: jax.Array, *, nq: int, nkv: int, hd: int,
                  eps: float = 1e-6, interpret: bool = False):
    """One whole decode step.  x [8, H] bf16 (row 0 real); k/v_cache
    [L, C, nkv*hd]; pos scalar int32 (valid cache rows); cos/sin [1, hd].
    Returns (y [8, H] post-final-layer hidden (pre final-norm), new_k
    [L, nkv*hd], new_v [L, nkv*hd])."""
    L, H, QKVW = w.wqkv.shape
    C = k_cache.shape[1]
    I = w.wg.shape[2]
    B = x.shape[0]
    sm = 1.0 / float(np.sqrt(hd))

    # index maps get (l, p, scalar_prefetch_ref)
    nx = lambda l: jnp.minimum(l + 1, L - 1)
    after = lambda pth: (lambda l, p, *_: (jnp.where(p >= pth, nx(l), l), 0, 0))
    after2 = lambda pth: (lambda l, p, *_: (jnp.where(p >= pth, nx(l), l), 0))
    row = lambda l, p, *_: (0, 0)
    l3 = lambda l, p, *_: (l, 0, 0)
    l2 = lambda l, p, *_: (l, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(L, 4),
        in_specs=[
            pl.BlockSpec((B, H), row),                       # x
            pl.BlockSpec((1, hd), row),                      # cos
            pl.BlockSpec((1, hd), row),                      # sin
            pl.BlockSpec((1, C, nkv * hd), after(1)),        # k cache
            pl.BlockSpec((1, C, nkv * hd), after(1)),        # v cache
            pl.BlockSpec((1, H, QKVW), after(1)),            # wqkv
            pl.BlockSpec((1, QKVW), after2(1)),
            pl.BlockSpec((1, QKVW), after2(1)),
            pl.BlockSpec((1, nq * hd, H), after(1)),         # wo
            pl.BlockSpec((1, H), after2(1)),
            pl.BlockSpec((1, H, I), after(2)),               # wg
            pl.BlockSpec((1, I), after2(2)),
            pl.BlockSpec((1, H, I), after(3)),               # wu
            pl.BlockSpec((1, I), after2(3)),
            pl.BlockSpec((1, I, H), l3),                     # wd
            pl.BlockSpec((1, H), l2),
            pl.BlockSpec((1, H), after2(1)),                 # n1
            pl.BlockSpec((1, H), after2(3)),                 # n2
        ],
        out_specs=[pl.BlockSpec((B, H), row),
                   pl.BlockSpec((1, nkv * hd), l2),
                   pl.BlockSpec((1, nkv * hd), l2)],
        scratch_shapes=[pltpu.VMEM((B, H), x.dtype),
                        pltpu.VMEM((B, I), x.dtype),
                        pltpu.VMEM((B, I), x.dtype)])
    return pl.pallas_call(
        functools.partial(_kernel, L=L, nq=nq, nkv=nkv, hd=hd, eps=eps, sm=sm),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H), x.dtype),
                   jax.ShapeDtypeStruct((L, nkv * hd), k_cache.dtype),
                   jax.ShapeDtypeStruct((L, nkv * hd), v_cache.dtype)],
        interpret=interpret,
    )(pos.reshape(1), x, cos, sin, k_cache, v_cache,
      w.wqkv, w.sqkv, w.bqkv, w.wo, w.so, w.wg, w.sg, w.wu, w.su,
      w.wd, w.sd, w.n1, w.n2)


def lm_step_xla(w: StepWeights, x, k_cache, v_cache, pos, cos, sin, *,
                nq: int, nkv: int, hd: int, eps: float = 1e-6):
    """Exact twin of the fused step in plain XLA (CPU tests / fallback)."""
    L, H, _ = w.wqkv.shape
    C = k_cache.shape[1]
    grp = nq // nkv
    sm = 1.0 / float(np.sqrt(hd))
    new_k, new_v = [], []
    xr = x
    col = jnp.arange(C)[None, :]
    bias = jnp.where(col < pos, 0.0, -1e30)

    def dq(h, wg, sg, bg=None):
        y = jax.lax.dot(h, wg.astype(h.dtype),
                        preferred_element_type=jnp.float32).astype(h.dtype)
        y = y * sg.astype(h.dtype)
        return y if bg is None else y + bg.astype(h.dtype)

    def rope(t, half_cos, half_sin):
        tf = t.astype(jnp.float32)
        half = hd // 2
        rot = jnp.concatenate([-tf[:, half:], tf[:, :half]], axis=1)
        return tf * half_cos + rot * half_sin

    for l in range(L):
        h = _rms(xr, w.n1[l], eps)
        qkv = dq(h, w.wqkv[l], w.sqkv[l], w.bqkv[l])
        qh = rope(qkv[0:1, :nq * hd].reshape(nq, hd), cos, sin)
        kh = rope(qkv[0:1, nq * hd:(nq + nkv) * hd].reshape(nkv, hd), cos, sin)
        vh = qkv[0:1, (nq + nkv) * hd:].reshape(nkv, hd).astype(jnp.float32)
        new_k.append(kh.reshape(nkv * hd).astype(k_cache.dtype))
        new_v.append(vh.reshape(nkv * hd).astype(v_cache.dtype))
        o_parts = []
        for hh in range(nkv):
            sl = slice(hh * hd, (hh + 1) * hd)
            q7 = (qh[hh * grp:(hh + 1) * grp] * (sm * _LOG2E)).astype(xr.dtype)
            s = jnp.dot(q7, k_cache[l][:, sl].T,
                        preferred_element_type=jnp.float32)
            s_new = jnp.dot(q7, kh[hh:hh + 1, :].astype(xr.dtype).T,
                            preferred_element_type=jnp.float32)
            # per-row running-max subtraction (ADVICE r4): without it,
            # large score magnitudes saturate a fixed clamp and flatten the
            # distribution — safe now for arbitrary checkpoints
            sc = s + bias
            m = jnp.maximum(jnp.max(sc, axis=1, keepdims=True), s_new)
            pc = jnp.exp2(sc - m)
            pn = jnp.exp2(s_new - m)
            denom = jnp.sum(pc, axis=1, keepdims=True) + pn
            oh = jnp.dot(pc.astype(v_cache.dtype), v_cache[l][:, sl],
                         preferred_element_type=jnp.float32)
            oh = (oh + pn * vh[hh:hh + 1, :]) / denom
            o_parts.append(oh.astype(xr.dtype))
        o = jnp.concatenate(o_parts, axis=0).reshape(1, nq * hd)
        o8 = jnp.pad(o, ((0, xr.shape[0] - 1), (0, 0)))
        xr = xr + dq(o8, w.wo[l], w.so[l])
        h2 = _rms(xr, w.n2[l], eps)
        g = dq(h2, w.wg[l], w.sg[l])
        u = dq(h2, w.wu[l], w.su[l])
        gf = g.astype(jnp.float32)
        m = (gf * jax.nn.sigmoid(gf)).astype(g.dtype) * u
        xr = xr + dq(m, w.wd[l], w.sd[l])
    return xr, jnp.stack(new_k), jnp.stack(new_v)
