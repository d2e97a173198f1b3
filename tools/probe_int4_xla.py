"""XLA-native int4 decode probe (round-5 VERDICT #5).

Round 4 established that this backend's Pallas custom-call DMA (~60 GB/s)
kills the packed-int4 Pallas matmul, while XLA's unrolled per-layer decode
reads int8 weights at ~657 GB/s.  Open question: does XLA stream *native
int4* (jnp.int4, two values per byte) at the same byte rate?  If yes, an
int4-stored, XLA-dequantized decode halves the B=1 LM stage's weight
traffic — the last structural single-stream lever.

Measures a decode-shaped dependent chain (B=1 row through L layers x the 7
Qwen projections at full 0.5B shapes) for int8 / int4 / bf16 weights, 500
steps, reporting ms/step and effective GB/s.

MEASURED (v5e via tunnel, 2026-08-21):
  bf16   507 ms / 500 steps   358 GB -> 706 GB/s
  int8   273 ms / 500 steps   179 GB -> 655 GB/s
  int4   211 ms / 500 steps    89 GB -> 424 GB/s   (packed int4 buffers
                                                    created INSIDE the
                                                    program; int4 arrays
                                                    cannot cross this
                                                    backend's program
                                                    boundary)
int4 streams at 424 GB/s on the packed bytes (65% of the int8 byte rate)
but still nets a 1.29x decode speedup (273 -> 211 ms / 500 steps).  The
lever is REAL on this backend: XLA-internal jnp.int4 avoids the Pallas
custom-call DMA penalty entirely.  Production path: quant="int4xla"
(models/qwen2.QDense) + utils.quant.{quantize_qwen_int4xla, awq_equalize,
int4_device_cast}; bench.py gates the B=1 serving config on >= 0.9
teacher-forced agreement at full scale.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    H, KV, I, L = 896, 128, 4864, 24
    rng = np.random.default_rng(0)

    to_i4 = jax.jit(lambda a: a.astype(jnp.int4))

    def layer_weights(dtype):
        ws = []
        for _ in range(L):
            shapes = [(H, H), (H, KV), (H, KV), (H, H), (H, I), (H, I),
                      (I, H)]
            row = []
            for s in shapes:
                if dtype == jnp.bfloat16:
                    row.append(jnp.asarray(
                        rng.standard_normal(s).astype(np.float32),
                        jnp.bfloat16))
                else:
                    w8 = jnp.asarray(np.clip(rng.standard_normal(s) * 3,
                                             -7, 7).astype(np.int8))
                    row.append(w8)
            ws.append(row)
        return ws

    def bytes_of(ws):
        tot = 0
        for lw in ws:
            for w in lw:
                n = int(np.prod(w.shape))
                tot += {jnp.int8: n, jnp.bfloat16: 2 * n}.get(w.dtype, None) \
                    if w.dtype in (jnp.int8, jnp.bfloat16) else n // 2
        return tot

    def step_fn(internal_int4=False):
        def one_step_w(ws, x, _):
            h = x
            for lw in ws:
                q = h @ lw[0].astype(jnp.bfloat16)
                k = h @ lw[1].astype(jnp.bfloat16)
                v = h @ lw[2].astype(jnp.bfloat16)
                o = (q + jnp.pad(k + v, ((0, 0), (0, H - KV)))) \
                    @ lw[3].astype(jnp.bfloat16)
                g = h @ lw[4].astype(jnp.bfloat16)
                u = h @ lw[5].astype(jnp.bfloat16)
                h = h + (jax.nn.silu(g) * u) @ lw[6].astype(jnp.bfloat16) \
                    + o * 1e-3
            return h * 0.5, ()

        @jax.jit
        def run(ws, x):
            if internal_int4:
                # int4 arrays cannot cross the program boundary on this
                # backend ("device: nullptr"); convert ONCE inside the
                # program, before the scan — the decode loop then reads
                # packed int4 HBM buffers (if XLA keeps them packed)
                ws = jax.tree.map(lambda w: w.astype(jnp.int4), ws)
            y, _ = jax.lax.scan(lambda c, s: one_step_w(ws, c, s), x,
                                length=500)
            return y

        return run

    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32),
                    jnp.bfloat16)
    for name, dtype in [("bf16", jnp.bfloat16), ("int8", jnp.int8),
                        ("int4", jnp.int8)]:
        ws = layer_weights(dtype)
        nb = 0
        for lw in ws:
            for w in lw:
                n = int(np.prod(w.shape))
                nb += {"bf16": 2 * n, "int8": n, "int4": n // 2}[name]
        run = step_fn(internal_int4=name == "int4")
        run(ws, x).block_until_ready()
        float(jnp.sum(run(ws, x)))  # cache-warm + forced read
        t0 = time.time()
        float(jnp.sum(run(ws, x)))
        dt = time.time() - t0
        gb = nb * 500 / 1e9
        print(f"{name}: {dt*1e3:.0f} ms / 500 steps, {gb:.0f} GB "
              f"-> {gb/dt:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
