"""TPU probe: Pallas packed-int4 dequant matmul vs XLA int8 for LM decode.

Decode matmuls read every weight byte per step (HBM-bound).  XLA's int8
convert-on-read path works; S4 storage does not transfer through the axon
client and XLA's int4 convert showed no win (tools/probe_int4.py).  This
kernel stores two int4 rows per int8 byte ([in/2, out] packed) and unpacks
in VMEM: y = x_even @ lo + x_odd @ hi, halving HBM weight traffic.

Usage: python tools/probe_int4_kernel.py [B]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
D, FF = 896, 4864
L = 24
N = 20
rng = np.random.default_rng(0)


def pack_int4(w):  # [in, out] int values in [-8, 7] -> [in//2, out] int8
    lo = w[0::2].astype(np.int32) & 0xF
    hi = w[1::2].astype(np.int32) & 0xF
    return (lo | (hi << 4)).astype(np.uint8).view(np.int8)


def _kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref):
    p = w_ref[...].astype(jnp.int32) & 0xFF       # [in/2, out_t]
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)
    hi = ((p << 24) >> 28).astype(jnp.bfloat16)
    acc = jax.lax.dot(xe_ref[...], lo, preferred_element_type=jnp.float32)
    acc += jax.lax.dot(xo_ref[...], hi, preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def int4_matmul(x, w_packed, scale, out_tile=None):
    Bx, IN = x.shape
    IN2, OUT = w_packed.shape
    if out_tile is None:  # largest multiple-of-128 divisor of OUT <= 2432
        out_tile = max(t for t in range(128, min(OUT, 2432) + 1, 128)
                       if OUT % t == 0)
    assert IN2 * 2 == IN and OUT % out_tile == 0
    xe = x[:, 0::2]   # tiny [B, in/2] strided views, split by XLA outside
    xo = x[:, 1::2]
    return pl.pallas_call(
        _kernel,
        grid=(OUT // out_tile,),
        in_specs=[pl.BlockSpec((Bx, IN2), lambda o: (0, 0)),
                  pl.BlockSpec((Bx, IN2), lambda o: (0, 0)),
                  pl.BlockSpec((IN2, out_tile), lambda o: (0, o)),
                  pl.BlockSpec((1, out_tile), lambda o: (0, o))],
        out_specs=pl.BlockSpec((Bx, out_tile), lambda o: (0, o)),
        out_shape=jax.ShapeDtypeStruct((Bx, OUT), x.dtype),
    )(xe, xo, w_packed, scale)


def main():
    x = jnp.asarray(rng.standard_normal((max(B, 8), D)), jnp.bfloat16)
    w_int = rng.integers(-8, 8, (L, 3, D, FF)).astype(np.int8)
    w8 = jnp.asarray(w_int.reshape(L * 3, D, FF))
    w4 = jnp.asarray(np.stack([pack_int4(w_int[l, i])
                               for l in range(L) for i in range(3)]
                              ).reshape(L * 3, D // 2, FF))
    scale = jnp.asarray(rng.standard_normal((L * 3, 1, FF)).astype(np.float32) * 0.01)

    @jax.jit
    def run_int8(x, w8, scale):
        def lyr(h, i):
            g = jnp.dot(h, w8[3 * i].astype(h.dtype)) * scale[3 * i, 0].astype(h.dtype)
            u = jnp.dot(h, w8[3 * i + 1].astype(h.dtype)) * scale[3 * i + 1, 0].astype(h.dtype)
            return (h + (g[:, :D] + u[:, :D]) * 1e-4).astype(h.dtype)

        def step(h, _):
            for i in range(L):
                h = lyr(h, i)
            return h, None
        return jax.lax.scan(step, x, None, length=N)[0]

    @jax.jit
    def run_int4(x, w4, scale):
        def lyr(h, i):
            g = int4_matmul(h, w4[3 * i], scale[3 * i])
            u = int4_matmul(h, w4[3 * i + 1], scale[3 * i + 1])
            return (h + (g[:, :D] + u[:, :D]) * 1e-4).astype(h.dtype)

        def step(h, _):
            for i in range(L):
                h = lyr(h, i)
            return h, None
        return jax.lax.scan(step, x, None, length=N)[0]

    # correctness of one matmul vs dense
    y4 = int4_matmul(x, w4[0], scale[0])
    yref = jnp.dot(x, w8[0].astype(x.dtype)) * scale[0, 0]
    err = float(jnp.max(jnp.abs(y4.astype(jnp.float32) - yref.astype(jnp.float32))))
    print(f"int4 kernel vs dense int8 maxdiff: {err:.4f} (bf16 rounding)")

    for name, fn, w, bytes_per_step in (
            ("int8-xla(2mm)", run_int8, w8, 2 * D * FF * L),
            ("int4-pallas(2mm)", run_int4, w4, D * FF * L)):
        out = fn(x, w, scale); float(jnp.sum(jnp.abs(out[:1, :8])))
        ts = []
        for _ in range(3):
            t0 = time.time(); out = fn(x, w, scale); float(jnp.sum(jnp.abs(out[:1, :8])))
            ts.append(time.time() - t0)
        per = min(ts) / N
        print(f"{name:18s} {per * 1e3:8.3f} ms/step  eff-BW "
              f"{bytes_per_step / per / 1e9:6.0f} GB/s")


if __name__ == "__main__":
    main()
