"""TPU probe: decompose the dit_attention kernel's cost — MXU dots vs exp2.

Three kernels at the exact serving shapes (grid (B, G), whole-row, 2 heads
per cell, [T,64]x[64,T] + [T,T]x[T,64] dots):
  A: full production math (scores -> exp2 -> normalize -> av)
  B: dots only (av consumes raw scores; no exp2/sum/divide)
  C: exp2 only (returns exp2(q-slice broadcast) — VPU throughput probe)

If B ~= A, the kernel is dot-limited (attack Mosaic dot shapes); if
A - B ~= C, exp2 is the gap (attack the softmax pass).
Usage: PROBE_B=128 python tools/probe_dit_attn_parts.py [N]
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
T, H, D = 1152, 8, 64
INNER = H * D
N = int(sys.argv[1]) if len(sys.argv) > 1 else 50
dt = jnp.bfloat16
_LOG2E = 1.4426950408889634

rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((B, T, 3 * INNER)) * 0.3, dt)
lens = jnp.full((B,), 1100, jnp.int32)


def _mk(kind):
    def kernel(lens_ref, q_ref, k_ref, v_ref, o_ref):
        b = pl.program_id(0)
        L = lens_ref[b]
        Tk = k_ref.shape[1]
        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, Tk), 1)
        bias = jnp.where(jrow < L, 0.0, -1e9).astype(jnp.float32)
        for i in range(2):  # heads per 128-lane group
            sl = slice(i * D, (i + 1) * D)
            q = (q_ref[0, :, sl].astype(jnp.float32) * (0.125 * _LOG2E)
                 ).astype(dt)
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            if kind == "exp_only":
                s = jnp.broadcast_to(q[:, :1].astype(jnp.float32), (Tk, Tk))
                p = jnp.exp2(jnp.minimum(s + bias, 108.0))
                o_ref[0, :, sl] = jnp.broadcast_to(
                    jnp.sum(p, axis=1, keepdims=True), (Tk, D)).astype(o_ref.dtype)
                continue
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if kind == "full":
                p = jnp.exp2(jnp.minimum(s + bias, 108.0))
                l = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
            else:  # dots_only
                p, l = s, 1.0
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)
    return kernel


def attention(qkv, kind):
    GD = 128
    G = INNER // GD
    qspec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, g))
    kspec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, G + g))
    vspec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, 2 * G + g))
    ospec = pl.BlockSpec((1, T, GD), lambda b, g, l: (b, 0, g))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, G),
        in_specs=[qspec, kspec, vspec], out_specs=ospec)
    return pl.pallas_call(_mk(kind), grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((B, T, INNER), dt),
                          )(lens, qkv, qkv, qkv)


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
    print(f"{name:26s} {ms:7.3f} ms/iter ({fl/ms/1e9:.0f} TF/s-equivalent)")


timed("prod dit_attention_packed", lambda h: dit_attention_packed(h, lens, 0.125))
timed("A full (this harness)", lambda h: attention(h, "full"))
timed("B dots only", lambda h: attention(h, "dots_only"))
timed("C exp2 only", lambda h: attention(h, "exp_only"))
