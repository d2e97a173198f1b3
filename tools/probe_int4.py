"""TPU probe: decode-step weight-read traffic for bf16/int8/int4 kernels.

One decode step = scan over L layers, each with its OWN gate/up/down weights
(scanned as xs, so every step truly reads L*3*D*FF weights from HBM, like AR
decode).  N steps per jit to amortize the ~27 ms tunnel dispatch.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys
B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
D, FF = 896, 4864
L = 24
N = 20
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)


def mk(shape, dtype):
    if dtype == jnp.int4:
        # the axon client can't transfer/re-layout S4 arrays across jit
        # boundaries (RecursionError); ship int8 and convert inside the jit
        # behind an optimization_barrier so the S4 buffer is materialized
        return jnp.asarray(rng.integers(-8, 8, shape).astype(np.int8))
    if dtype == jnp.int8:
        return jnp.asarray(rng.integers(-127, 128, shape).astype(np.int8))
    return jnp.asarray((rng.standard_normal(shape) * 0.02), dtype)


def run(name, dtype):
    wg = mk((L, D, FF), dtype)       # gate
    wu = mk((L, D, FF), dtype)       # up
    wd = mk((L, FF, D), dtype)       # down
    sg = jnp.asarray(rng.standard_normal((L, FF)) * 0.01, jnp.bfloat16)
    sd = jnp.asarray(rng.standard_normal((L, D)) * 0.01, jnp.bfloat16)
    q = dtype in (jnp.int8, jnp.int4)

    @jax.jit
    def step(x, wg, wu, wd, sg, sd):
        if dtype == jnp.int4:
            wg, wu, wd = jax.lax.optimization_barrier(
                (wg.astype(jnp.int4), wu.astype(jnp.int4),
                 wd.astype(jnp.int4)))

        def dec(h, _):
            # python-unrolled layers (separate buffers), like the real model
            for i in range(L):
                g = jnp.dot(h, wg[i].astype(h.dtype))
                u = jnp.dot(h, wu[i].astype(h.dtype))
                if q:
                    g, u = g * sg[i], u * sg[i]
                d = jnp.dot(jax.nn.silu(g) * u, wd[i].astype(h.dtype))
                if q:
                    d = d * sd[i]
                h = (h + d * 1e-3).astype(h.dtype)
            return h, None
        return jax.lax.scan(dec, x, None, length=N)[0]

    def go():
        out = step(x, wg, wu, wd, sg, sd)
        # tunnel: block_until_ready does not observably wait; force a read
        return float(jnp.sum(jnp.abs(out[:1, :8])))

    go()
    ts = []
    for _ in range(3):
        t0 = time.time()
        go()
        ts.append(time.time() - t0)
    per_step = min(ts) / N
    gb = 3 * D * FF * L * (0.5 if dtype == jnp.int4 else
                           (1 if dtype == jnp.int8 else 2)) / 1e9
    print(f"{name:8s} {per_step*1e3:8.3f} ms/step   eff-BW {gb/per_step:6.0f} GB/s")


run("bf16", jnp.bfloat16)
run("int8", jnp.int8)
run("int4", jnp.int4)
