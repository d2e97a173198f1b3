"""TPU probe: can a grid-over-layers Pallas kernel stream the whole 0.5B
int8 weight set at near-HBM-peak for one decode step?

Premise (round-3 VERDICT #2): B=1 decode through XLA runs ~545 us/step at
~657 GB/s of int8 weight traffic; the weight-read floor at the measured
1.54 TB/s streaming peak is ~233 us — a 2.3x single-stream lever.  Before
building the full fused step (attention/rope/cache/sampling), this probe
measures the load-bearing part alone: a kernel with grid=(layers,) whose
cells fetch the layer's stacked int8 weights (qkv+o+gate+up+down ~14.9 MB)
and run the 5 dequant dots with a VMEM-carried hidden state, chained over
N steps.  If this cannot beat ~1.2 TB/s, the full kernel is not worth
building and the null result gets recorded (like the dit-attention pack
probes).

Variant `phase4` splits each layer into 4 grid phases (qkv+o / gate / up /
down) so per-operand blocks stay <= ~4.4 MB for VMEM-limited backends.

Usage: python tools/probe_lm_step.py [N_steps]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import os
L = int(os.environ.get("PROBE_L", "24"))
H = int(os.environ.get("PROBE_H", "896"))
KV = 256
INTER = int(os.environ.get("PROBE_I", "4864"))
QKV = H + KV                            # 1152
B = 8                                   # padded decode rows (sublane tile)
N = int(sys.argv[1]) if len(sys.argv) > 1 else 64

rng = np.random.default_rng(0)


def qw(shape):
    return jnp.asarray(rng.integers(-127, 127, shape), jnp.int8)


def sc(shape):
    # [L, 1, N]: Mosaic block shapes need the last two dims (8,128)-divisible
    # or equal to the array dims; a [L, N] vector block (1, N) violates that
    v = (rng.random(shape) * 0.02 + 0.01).astype(np.float32)
    return jnp.asarray(v).reshape(shape[0], 1, shape[1])


Wqkv, Sqkv = qw((L, H, QKV)), sc((L, QKV))
Wo, So = qw((L, H, H)), sc((L, H))
Wg, Sg = qw((L, H, INTER)), sc((L, INTER))
Wu, Su = qw((L, H, INTER)), sc((L, INTER))
Wd, Sd = qw((L, INTER, H)), sc((L, H))
norms1 = jnp.ones((L, 1, H), jnp.float32)
norms2 = jnp.ones((L, 1, H), jnp.float32)

BYTES = (Wqkv.nbytes + Wo.nbytes + Wg.nbytes + Wu.nbytes + Wd.nbytes)
print(f"weights: {BYTES/1e6:.1f} MB int8 per step", flush=True)


def _rms(x, g):
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + 1e-6) * g


def _dq_dot(x, w_ref, s_ref):
    y = jax.lax.dot(x.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    return y * s_ref[0].astype(jnp.float32)


def _kernel1(x_ref, wqkv, sqkv, wo, so, wg, sg, wu, su, wd, sd, n1, n2,
             y_ref, xs):
    l = pl.program_id(0)

    @pl.when(l == 0)
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)

    x = xs[...]
    h = _rms(x, n1[0])
    qkv = _dq_dot(h, wqkv, sqkv)
    o = qkv[:, :H]                       # stand-in for attention output
    x1 = x + _dq_dot(o.astype(jnp.bfloat16), wo, so)
    h2 = _rms(x1, n2[0])
    g = _dq_dot(h2, wg, sg)
    u = _dq_dot(h2, wu, su)
    m = (g * jax.nn.sigmoid(g)) * u
    x2 = x1 + _dq_dot(m.astype(jnp.bfloat16), wd, sd)
    xs[...] = x2

    @pl.when(l == L - 1)
    def _():
        y_ref[...] = x2.astype(y_ref.dtype)


def step1(x, ws):
    lmap = lambda l: (l, 0, 0)
    smap = lambda l: (l, 0, 0)
    return pl.pallas_call(
        _kernel1,
        grid=(L,),
        in_specs=[pl.BlockSpec((B, H), lambda l: (0, 0)),
                  pl.BlockSpec((1, H, QKV), lmap), pl.BlockSpec((1, 1, QKV), smap),
                  pl.BlockSpec((1, H, H), lmap), pl.BlockSpec((1, 1, H), smap),
                  pl.BlockSpec((1, H, INTER), lmap), pl.BlockSpec((1, 1, INTER), smap),
                  pl.BlockSpec((1, H, INTER), lmap), pl.BlockSpec((1, 1, INTER), smap),
                  pl.BlockSpec((1, INTER, H), lmap), pl.BlockSpec((1, 1, H), smap),
                  pl.BlockSpec((1, 1, H), smap), pl.BlockSpec((1, 1, H), smap)],
        out_specs=pl.BlockSpec((B, H), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
    )(x, *ws)


def _kernel4(x_ref, wqkv, sqkv, wo, so, wg, sg, wu, su, wd, sd, n1, n2,
             y_ref, xs, gs, us):
    l, p = pl.program_id(0), pl.program_id(1)

    @pl.when((l == 0) & (p == 0))
    def _():
        xs[...] = x_ref[...].astype(jnp.float32)

    @pl.when(p == 0)
    def _():
        x = xs[...]
        h = _rms(x, n1[0])
        qkv = _dq_dot(h, wqkv, sqkv)
        o = qkv[:, :H]
        x1 = x + _dq_dot(o.astype(jnp.bfloat16), wo, so)
        xs[...] = x1

    @pl.when(p == 1)
    def _():
        gs[...] = _dq_dot(_rms(xs[...], n2[0]), wg, sg)

    @pl.when(p == 2)
    def _():
        us[...] = _dq_dot(_rms(xs[...], n2[0]), wu, su)

    @pl.when(p == 3)
    def _():
        g = gs[...]
        m = (g * jax.nn.sigmoid(g)) * us[...]
        x2 = xs[...] + _dq_dot(m.astype(jnp.bfloat16), wd, sd)
        xs[...] = x2

    @pl.when((l == L - 1) & (p == 3))
    def _():
        y_ref[...] = xs[...].astype(y_ref.dtype)


def step4(x, ws):
    # revolving prefetch: each operand's index advances to the next layer
    # right after its consuming phase, so every block is fetched once per
    # layer and the fetch overlaps the other phases' compute
    nx = lambda l: jnp.minimum(l + 1, L - 1)
    qkv_m = lambda l, p: (jnp.where(p >= 1, nx(l), l), 0, 0)
    qkv_s = lambda l, p: (jnp.where(p >= 1, nx(l), l), 0, 0)
    g_m = lambda l, p: (jnp.where(p >= 2, nx(l), l), 0, 0)
    g_s = lambda l, p: (jnp.where(p >= 2, nx(l), l), 0, 0)
    u_m = lambda l, p: (jnp.where(p >= 3, nx(l), l), 0, 0)
    u_s = lambda l, p: (jnp.where(p >= 3, nx(l), l), 0, 0)
    d_m = lambda l, p: (l, 0, 0)
    d_s = lambda l, p: (l, 0, 0)
    return pl.pallas_call(
        _kernel4,
        grid=(L, 4),
        in_specs=[pl.BlockSpec((B, H), lambda l, p: (0, 0)),
                  pl.BlockSpec((1, H, QKV), qkv_m), pl.BlockSpec((1, 1, QKV), qkv_s),
                  pl.BlockSpec((1, H, H), qkv_m), pl.BlockSpec((1, 1, H), qkv_s),
                  pl.BlockSpec((1, H, INTER), g_m), pl.BlockSpec((1, 1, INTER), g_s),
                  pl.BlockSpec((1, H, INTER), u_m), pl.BlockSpec((1, 1, INTER), u_s),
                  pl.BlockSpec((1, INTER, H), d_m), pl.BlockSpec((1, 1, H), d_s),
                  pl.BlockSpec((1, 1, H), lambda l, p: (l, 0, 0)),
                  pl.BlockSpec((1, 1, H), lambda l, p: (l, 0, 0))],
        out_specs=pl.BlockSpec((B, H), lambda l, p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, INTER), jnp.float32),
                        pltpu.VMEM((B, INTER), jnp.float32)],
    )(x, *ws)


WS = (Wqkv, Sqkv, Wo, So, Wg, Sg, Wu, Su, Wd, Sd, norms1, norms2)


def timed(name, step):
    # weights as jit ARGUMENTS — closure-captured they bake into the HLO as
    # 358 MB of literals and the remote compiler rejects the upload (413)
    @jax.jit
    def loop(x, ws):
        def body(h, _):
            return step(h, ws), None
        return jax.lax.scan(body, x, None, length=N)[0]

    x0 = jnp.asarray(rng.standard_normal((B, H)) * 0.05, jnp.bfloat16)
    try:
        out = loop(x0, WS)
        float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = loop(x0, WS)
        float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
        ts.append(time.time() - t0)
    us = min(ts) / N * 1e6
    print(f"{name:14s} {us:7.1f} us/step  {BYTES/ (min(ts)/N) / 1e9:7.0f} GB/s",
          flush=True)


if __name__ == "__main__":
    timed("whole-layer", step1)
    timed("phase4", step4)
