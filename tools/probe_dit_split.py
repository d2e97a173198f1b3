"""TPU probe: row-tiled split-fusion of the DiT block's projection stack.

The whole-block fused kernel (ops/pallas/dit_block.py) is compile-hazardous
at serving shape (T=1152 whole-row cells, 8 unrolled heads).  This probe
measures the LOW-RISK alternative: keep the production attention kernel
(dit_attention_packed, already at the measured per-M-row feed ceiling) and
fuse only the per-row projection stack around it into two tiny row-tiled
kernels whose cells are a few [TQ, <=1024] dots (compile cost bounded by TQ,
not T):

  A. ln_qkv:  y = LayerNorm(x) @ Wqkv            (1 dot; kills the LN<->dot
     boundary and the separate qkv write of the XLA path)
  B. out_ffn: x1 = x + o @ Wo + bo; h = LayerNorm(x1);
              y  = x1 + gelu_tanh(h @ Wi + bi) @ Wo2 + bo2   (3 dots; the
     FFN mid [R, 1024] never touches HBM)

vs the unfused serving DiTBlock (XLA projections + packed attention kernel).
If XLA op boundaries (operand re-feeds from HBM) carry real cost, B wins by
fusing 3 dots into one feed; if the ~11 ns/M-row/dot feed bound is per-DOT
regardless of fusion, this is a null result like the attention packing
probes — either way the verdict gets recorded.

Usage: PROBE_B=128 PROBE_T=1152 python tools/probe_dit_split.py [N]
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

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from cosyvoice_tpu.models.flow import DiTBlock
from cosyvoice_tpu.ops.pallas.dit_attention import dit_attention_packed

B = int(os.environ.get("PROBE_B", "128"))
T = int(os.environ.get("PROBE_T", "1152"))
H, D = 8, 64
DIM, INNER, FF = 256, H * D, 1024
TQ = int(os.environ.get("PROBE_TQ", "512"))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
dt = jnp.bfloat16


def _ln(x, g, b, eps=1e-5):
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


def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, o_ref):
    h = _ln(x_ref[...], g_ref[0], b_ref[0])
    o_ref[...] = jax.lax.dot(h, w_ref[...],
                             preferred_element_type=jnp.float32
                             ).astype(o_ref.dtype)


def ln_qkv(x2, g, b, w):
    R = x2.shape[0]
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        _ln_qkv_kernel,
        grid=(R // TQ,),
        in_specs=[pl.BlockSpec((TQ, DIM), lambda r: (r, 0)),
                  pl.BlockSpec((1, DIM), lambda r: (0, 0)),
                  pl.BlockSpec((1, DIM), lambda r: (0, 0)),
                  pl.BlockSpec((DIM, 3 * INNER), lambda r: (0, 0))],
        out_specs=pl.BlockSpec((TQ, 3 * INNER), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 3 * INNER), x2.dtype),
    )(x2, row(g), row(b), w)


def _out_ffn_kernel(o_ref, x_ref, wo_ref, bo_ref, g_ref, b_ref, wi_ref,
                    bi_ref, wo2_ref, bo2_ref, y_ref):
    a = jax.lax.dot(o_ref[...], wo_ref[...],
                    preferred_element_type=jnp.float32)
    x1 = x_ref[...] + (a + bo_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    h = _ln(x1, g_ref[0], b_ref[0])
    m = jax.lax.dot(h, wi_ref[...], preferred_element_type=jnp.float32)
    m = _gelu_tanh(m + bi_ref[0].astype(jnp.float32)).astype(x1.dtype)
    y = jax.lax.dot(m, wo2_ref[...], preferred_element_type=jnp.float32)
    y_ref[...] = x1 + (y + bo2_ref[0].astype(jnp.float32)).astype(x1.dtype)


def out_ffn(o2, x2, wo, bo, g, b, wi, bi, wo2, bo2):
    R = x2.shape[0]
    row = lambda v: v.reshape(1, -1)
    full = lambda a: pl.BlockSpec(a.shape, lambda r: (0,) * a.ndim)
    ops = [row(bo), row(g), row(b), wi, row(bi), wo2, row(bo2)]
    return pl.pallas_call(
        _out_ffn_kernel,
        grid=(R // TQ,),
        in_specs=[pl.BlockSpec((TQ, INNER), lambda r: (r, 0)),
                  pl.BlockSpec((TQ, DIM), lambda r: (r, 0)),
                  pl.BlockSpec((DIM, DIM), lambda r: (0, 0))]
        + [full(a) for a in ops],
        out_specs=pl.BlockSpec((TQ, DIM), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((R, DIM), x2.dtype),
    )(o2, x2, wo, *ops)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, DIM)) * 0.5, dt)
lens = jnp.full((B,), T - 52, jnp.int32)
pm = jnp.asarray(jnp.arange(T)[None, :] < T - 52, dt).repeat(B, 0)

blk = DiTBlock(DIM, H, D, approx_gelu=True, fused_norm=True)
params = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x[:1], None,
                                  jnp.ones((1, T), dt)))()
params = jax.tree.map(lambda v: jnp.asarray(v, dt), params)
p = params["params"]
wqkv = jnp.concatenate([p["to_q"], p["to_k"], p["to_v"]], axis=1)


def split_block(h):
    h2 = h.reshape(B * T, DIM)
    qkv = ln_qkv(h2, p["norm1"]["scale"], p["norm1"]["bias"], wqkv)
    o = dit_attention_packed(qkv.reshape(B, T, 3 * INNER), lens, 1.0 / 8.0)
    y = out_ffn(o.reshape(B * T, INNER), h2, p["to_out"]["kernel"],
                p["to_out"]["bias"], p["norm3"]["scale"], p["norm3"]["bias"],
                p["ff_in"]["kernel"], p["ff_in"]["bias"],
                p["ff_out"]["kernel"], p["ff_out"]["bias"])
    return y.reshape(B, T, DIM)


def timed(name, fn):
    @jax.jit
    def loop(x):
        def body(h, _):
            return fn(h), None
        return jax.lax.scan(body, x, None, length=N)[0]

    out = loop(x)
    float(jnp.sum(jnp.abs(out[0, 0, :8]).astype(jnp.float32)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = loop(x)
        float(jnp.sum(jnp.abs(out[0, 0, :8]).astype(jnp.float32)))
        ts.append(time.time() - t0)
    print(f"{name:30s} {min(ts)*1e3/N:7.3f} ms/iter", flush=True)
    return out


a = timed("unfused DiTBlock (serving)", lambda h: blk.apply(params, h, None, pm))
b = timed("split ln_qkv/attn/out_ffn", split_block)
want = blk.apply(params, x, None, pm)
got = split_block(x)
err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                            - got.astype(jnp.float32))[:, :T - 52]))
scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
print(f"max |unfused - split| on valid rows: {err:.3e} (out scale {scale:.2f})")
