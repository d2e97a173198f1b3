"""TPU probe: can a fused Pallas decode step beat XLA's per-op int8 path?

MEASURED VERDICT (2026-08-20, N=2000): NO — isolated XLA convert+dot
streams 171 GB/s and the fused 7-projection Pallas chain reaches 406 GB/s,
but the REAL decode while_loop already achieves ~657 GB/s effective
(545 us/step over 358 MB int8) through XLA's own cross-op pipelining.  A
per-layer fused kernel would SLOW the step down; only a whole-step
persistent kernel could try to close the remaining 2.3x to the 1.54 TB/s
HBM peak, and that shape of kernel is exactly what wedged the remote
compiler (see ops/pallas/dit_block.py).  B=1 decode stays on XLA.

The B=1 LM decode step measures ~545 us (24 layers, int8 weight-only);
the TRUE weight-read floor at the measured ~1.54 TB/s HBM is ~233 us
(358 MB int8).  Before building a full persistent decode kernel, measure
the primitive that bounds it: one [1, IN] x int8 [IN, OUT] dequant matmul
as (A) plain XLA convert+dot, (B) a Pallas kernel with the convert inside,
(C) a Pallas kernel chaining the 7 projection dots of one layer (models the
per-layer fusion, amortizing the call overhead).

Usage: python tools/probe_decode_layer.py [N]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

H, I = 896, 4864
N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, H)), jnp.bfloat16)
w = jnp.asarray(rng.integers(-127, 128, (H, I)), jnp.int8)
s = jnp.asarray(np.abs(rng.standard_normal((I,))) * 0.01, jnp.float32)
# one layer's 7 projections: q,k,v,o ~ [H,H]/[H,128]; gate,up [H,I]; down [I,H]
W7 = [jnp.asarray(rng.integers(-127, 128, sh), jnp.int8)
      for sh in ((H, 1024), (H, 128), (H, 128), (896, H),
                 (H, I), (H, I), (I, H))]
S7 = [jnp.asarray(np.abs(rng.standard_normal((wi.shape[1],))) * 0.01,
                  jnp.float32) for wi in W7]
BYTES7 = sum(int(np.prod(wi.shape)) for wi in W7)


def timed(name, fn, nbytes):
    @jax.jit
    def loop(x):
        def body(h, _):
            return fn(h), None
        return jax.lax.scan(body, x, None, length=N)[0]

    out = loop(x)
    float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = loop(x)
        float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
        ts.append(time.time() - t0)
    us = min(ts) * 1e6 / N
    print(f"{name:34s} {us:8.2f} us/iter ({nbytes/ (us*1e-6) / 1e9:.0f} GB/s)")


def xla_one(h):
    y = jnp.dot(h, w.astype(h.dtype)) * s.astype(h.dtype)
    return y[:, :H] * 0.01 + h


def _k_one(x_ref, w_ref, s_ref, o_ref):
    wv = w_ref[...].astype(jnp.bfloat16)
    y = jax.lax.dot(x_ref[...], wv, preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def pallas_one(h):
    y = pl.pallas_call(
        _k_one,
        in_specs=[pl.BlockSpec((1, H), lambda: (0, 0)),
                  pl.BlockSpec((H, I), lambda: (0, 0)),
                  pl.BlockSpec((1, I), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1, I), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, I), h.dtype),
    )(h, w, s.reshape(1, I))
    return y[:, :H] * 0.01 + h


def _k_seven(x_ref, *refs):
    o_ref = refs[-1]
    ws, ss = refs[:7], refs[7:14]
    h = x_ref[...]
    acc = None
    for wr, sr in zip(ws, ss):
        wv = wr[...].astype(jnp.bfloat16)
        xin = h if wv.shape[0] == H else \
            jnp.concatenate([h] * ((wv.shape[0] + H - 1) // H), axis=1)
        y = jax.lax.dot(xin[:, :wv.shape[0]], wv,
                        preferred_element_type=jnp.float32)
        y = y * sr[...].astype(jnp.float32)
        part = y[:, :H] if y.shape[1] >= H else jnp.pad(y, ((0, 0), (0, H - y.shape[1])))
        acc = part if acc is None else acc + part
    o_ref[...] = (acc * 0.001).astype(o_ref.dtype)


def pallas_seven(h):
    specs = [pl.BlockSpec((1, H), lambda: (0, 0))]
    specs += [pl.BlockSpec(wi.shape, lambda: (0, 0)) for wi in W7]
    specs += [pl.BlockSpec((1, si.shape[0]), lambda: (0, 0)) for si in S7]
    y = pl.pallas_call(
        _k_seven,
        in_specs=specs,
        out_specs=pl.BlockSpec((1, H), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, H), h.dtype),
    )(h, *W7, *[si.reshape(1, -1) for si in S7])
    return y + h


timed("A: XLA convert+dot [896x4864]", xla_one, H * I)
timed("B: pallas dequant dot", pallas_one, H * I)
timed("C: pallas 7-proj layer chain", pallas_seven, BYTES7)
