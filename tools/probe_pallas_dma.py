"""MEASURED VERDICT (2026-08-20, axon v5e): Pallas block DMA on this
backend streams int8 weight blocks at ~60 GB/s (grid auto-pipelining) and
~30 GB/s via manual async_copy regardless of parallelism (1/2/4/8 streams
all ~30 GB/s, tools/probe_pallas_dma_manual.py), while XLA's own unrolled
per-layer decode reads the same int8 weights at ~657 GB/s
(tools/probe_decode_layer.py).  A scan-chained XLA matvec over a stacked
[L, H, I] weight array ALSO drops to ~63 GB/s — the fast path is XLA's
unrolled per-layer constants structure only.

Consequence: the persistent whole-step decode kernel (ops/pallas/lm_step.py,
round-3 VERDICT #2's prescribed bring-up) is a NET LOSS here — 358 MB of
weights at 60 GB/s is ~6 ms/step vs XLA's 545 us.  The kernel is kept,
interpret-parity-tested, and gated OFF; it is the right design for backends
whose Pallas DMA runs at HBM rate.  This measurement also explains the
round-3 null results: the dit-attention "per-M-row feed bound" (~51 TF/s
equivalent) back-computes to exactly this ~65 GB/s custom-call DMA rate,
and the int4 kernel's per-call loss is the same ceiling.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cosyvoice_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

L, H, I = 24, 896, 4864
rng = np.random.default_rng(0)
W2 = jnp.asarray(rng.integers(-127, 127, (L * H, I)), jnp.int8)
NB = W2.nbytes

def k2(w_ref, o_ref, acc):
    l = pl.program_id(0)
    @pl.when(l == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
    acc[...] += jnp.sum(w_ref[0:8, :].astype(jnp.float32), axis=0, keepdims=True)
    @pl.when(l == L - 1)
    def _():
        o_ref[...] = acc[...]

def s2(W):
    return pl.pallas_call(
        k2, grid=(L,),
        in_specs=[pl.BlockSpec((H, I), lambda l: (l, 0))],
        out_specs=pl.BlockSpec((1, I), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, I), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, I), jnp.float32)])(W)

def timed(name, fn, W, n=16):
    try:
        f = jax.jit(fn)
        out = f(W); float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                out = f(W)
            float(jnp.sum(out))
            ts.append(time.time() - t0)
        dt = min(ts) / n
        print(f"{name:28s} {dt*1e6:9.1f} us  {NB/dt/1e9:8.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)

# XLA reference reductions (launch-overhead + bandwidth calibration)
timed("xla int8 sum", jax.jit(lambda W: jnp.sum(W, dtype=jnp.int32)), W2)
timed("xla int8->bf16 matvec", jax.jit(
    lambda W: jnp.sum(W.reshape(L, H, I).astype(jnp.bfloat16), axis=(0, 1))), W2)
timed("pallas 2d stream", s2, W2)

# in-ONE-program scan: launch overhead amortized over 8 inner steps
def scanned(fn, k):
    def g(W):
        def body(c, _):
            return c + jnp.sum(fn(W)), None
        return jax.lax.scan(body, jnp.zeros(()), None, length=k)[0]
    return g
for name, fn in [("pallas scan8 (per-iter)", s2),
                 ("xla scan8 sum (per-iter)",
                  lambda W: jnp.sum(W, dtype=jnp.int32).astype(jnp.float32)[None, None])]:
    try:
        f = jax.jit(scanned(fn, 8))
        out = f(W2); float(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = f(W2); float(out)
            ts.append(time.time() - t0)
        dt = min(ts) / 8
        print(f"{name:28s} {dt*1e6:9.1f} us  {NB/dt/1e9:8.1f} GB/s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)
