"""TPU probe: block-diagonal head packing for the D=64 attention dots.

MEASURED VERDICT (2026-08-20, 128 rows x T=1152): NULL RESULT — P=2 packing
times identical to the production kernel (6.90 vs 6.92 ms), P=4 worse
(9.88 ms, block-diag build overhead).  Together with probe_dit_attn_parts
(dots-only == full kernel) and the head-group sweep (HPB 2/4/8 x query
chunkings all ~6.6-7.2 ms), the conclusion is that this backend executes
these dot patterns at a fixed ~51 TF/s-equivalent regardless of lane
packing, contraction depth, or grouping: per-M-row operand feed is the
bound (measured ~11 ns/row/dot; an isolated [1152,64]x[64,1152] dot costs
the same as [1152,128]x[128,1152]).  The production dit_attention kernel is
already at this ceiling — attention-side estimator gains are exhausted
without a different hardware/compiler generation.

probe_dit_attn_parts showed the dit_attention kernel is DOT-bound (51 TF/s
with or without softmax): per-head [T,64] operands occupy half of the 128
lanes and a quarter of the 256-deep MXU.  Pack P heads per dot instead:

  Q_P [T, P*64]  (heads side by side — full lanes)
  Kbd [P*T, P*64] block-diag rows: rows i*T..(i+1)*T hold k_i in cols i*64..
  S_cat = dot(Q_P, Kbd^T-contraction) -> [T, P*T] = [S_1 | ... | S_P]
  Vbd [P*T, P*64] same layout; O = P_cat @ Vbd -> [T, P*64] = [o_1|...|o_P]

The zero blocks waste MACs (useful fraction 1/P of a dense P*64-deep dot ==
the inherent D=64 ceiling) but every MXU pass runs with FULL lane occupancy
and P*64 contraction depth.  No transposes anywhere: Kbd/Vbd are built with
plain VMEM block copies from the packed qkv slices.

Usage: PROBE_T=384 PROBE_B=16 python tools/probe_dit_attn_packmxu.py [N]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from cosyvoice_tpu.ops.pallas.dit_attention import dit_attention_packed

B = int(os.environ.get("PROBE_B", "128"))
T = int(os.environ.get("PROBE_T", "1152"))
H, D = 8, 64
INNER = H * D
N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
dt = jnp.bfloat16
_LOG2E = 1.4426950408889634

rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((B, T, 3 * INNER)) * 0.3, dt)
lens = jnp.full((B,), T - 52, jnp.int32)


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, P: int, sm_scale: float,
            q_chunks: int):
    b = pl.program_id(0)
    L = lens_ref[b]
    Tk = k_ref.shape[1]
    GD = P * D
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, Tk), 1)
    bias1 = jnp.where(jrow < L, 0.0, -1e9).astype(jnp.float32)
    bias = jnp.concatenate([bias1] * P, axis=1)          # [1, P*Tk]

    # block-diag K/V: [P*Tk, P*D]; row-block i carries head i's slice at
    # col-block i (static concats — Mosaic has no dynamic_update_slice)
    def bd(ref):
        rows = []
        for i in range(P):
            blk = ref[0, :, i * D:(i + 1) * D]
            parts = []
            if i:
                parts.append(jnp.zeros((Tk, i * D), dt))
            parts.append(blk)
            if P - 1 - i:
                parts.append(jnp.zeros((Tk, (P - 1 - i) * D), dt))
            rows.append(jnp.concatenate(parts, axis=1))
        return jnp.concatenate(rows, axis=0)

    kbd = bd(k_ref)
    vbd = bd(v_ref)

    # query chunks keep the fp32 score tile inside the 16 MB scoped-vmem cap
    Tq = Tk // q_chunks
    for c in range(q_chunks):
        rows = slice(c * Tq, (c + 1) * Tq)
        q = (q_ref[0, rows, :].astype(jnp.float32) * (sm_scale * _LOG2E)
             ).astype(dt)
        s = jax.lax.dot_general(q, kbd, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(jnp.minimum(s + bias, 108.0))
        o = jax.lax.dot_general(p.astype(dt), vbd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        parts = []
        for i in range(P):
            l = jnp.sum(p[:, i * Tk:(i + 1) * Tk], axis=1, keepdims=True)
            parts.append(o[:, i * D:(i + 1) * D] / jnp.maximum(l, 1e-30))
        o_ref[0, rows, :] = jnp.concatenate(parts, axis=1).astype(o_ref.dtype)


def attention_packed_mxu(qkv, lengths, sm_scale, P, q_chunks=None):
    GD = P * D
    G = INNER // GD
    if q_chunks is None:
        # score tile [T/q_chunks, P*T] fp32 + kbd/vbd under ~12 MB
        budget = 12 * 1024 * 1024 - 2 * P * T * GD * 2
        q_chunks = 1
        while (T // q_chunks) * P * T * 4 > budget:
            q_chunks *= 2
    qspec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, g))
    kspec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, (INNER // GD) + g))
    vspec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, 2 * (INNER // GD) + g))
    ospec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, g))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, G),
        in_specs=[qspec, kspec, vspec], out_specs=ospec)
    return pl.pallas_call(
        functools.partial(_kernel, P=P, sm_scale=sm_scale, q_chunks=q_chunks),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((B, T, INNER), qkv.dtype),
    )(lengths, qkv, qkv, qkv)


def timed(name, fn):
    @jax.jit
    def loop(x):
        def body(h, _):
            o = fn(h)
            return jnp.concatenate([o, h[..., INNER:]], axis=-1), None
        return jax.lax.scan(body, x, None, length=N)[0]

    out = loop(qkv)
    float(jnp.sum(jnp.abs(out[0, 0, :8]).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = loop(qkv)
        float(jnp.sum(jnp.abs(out[0, 0, :8]).astype(jnp.float32)))
        ts.append(time.time() - t0)
    ms = min(ts) * 1e3 / N
    fl = 4 * B * H * T * T * D
    print(f"{name:30s} {ms:7.3f} ms/iter ({fl/ms/1e9:.0f} TF/s-equivalent)",
          flush=True)


timed("prod dit_attention_packed", lambda h: dit_attention_packed(h, lens, 0.125))
for P in (2, 4):
    timed(f"packed-mxu P={P}",
          lambda h, P=P: attention_packed_mxu(h, lens, 0.125, P))
# parity
pa = dit_attention_packed(qkv, lens, 0.125)
for P in (2, 4):
    pb = attention_packed_mxu(qkv, lens, 0.125, P)
    err = float(jnp.max(jnp.abs((pa.astype(jnp.float32)
                                 - pb.astype(jnp.float32))[:, :T - 52])))
    print(f"P={P} max|prod-packed| on valid rows: {err:.2e}", flush=True)
