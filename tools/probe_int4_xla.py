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
  bf16   530 ms / 500 steps   368 GB bytes -> 695 GB/s
  int8   268 ms / 500 steps   184 GB bytes -> 687 GB/s
  int4   170 ms / 500 steps    92 GB bytes -> 542 GB/s
int4 streams at 542 GB/s (79% of the int8 byte rate) -> the B=1 LM decode
stage drops ~1.6x vs int8 (268 -> 170 ms per 500 tokens).  The lever is
REAL on this backend: XLA dequantizes jnp.int4 inline without the Pallas
DMA penalty.  Serving impact: B=1 total 0.41 s would drop to ~0.31 s
(~64x) IF int4 quality is acceptable — argmax agreement remains the gate
(see bench.py's teacher-forced agreement and utils/quant.py AWQ scaling).
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

    def layer_weights(dtype):
        ws = []
        for _ in range(L):
            shapes = [(H, H), (H, KV), (H, KV), (H, H), (H, I), (H, I),
                      (I, H)]
            ws.append([jnp.asarray(
                np.clip(rng.standard_normal(s) * 3, -7, 7).astype(np.int8),
                dtype=dtype) if dtype != jnp.bfloat16 else
                jnp.asarray(rng.standard_normal(s).astype(np.float32),
                            jnp.bfloat16) for s in shapes])
        return ws

    def bytes_of(ws):
        tot = 0
        for lw in ws:
            for w in lw:
                n = int(np.prod(w.shape))
                tot += {jnp.int8: n, jnp.bfloat16: 2 * n}.get(w.dtype, None) \
                    if w.dtype in (jnp.int8, jnp.bfloat16) else n // 2
        return tot

    def step_fn():
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
            y, _ = jax.lax.scan(lambda c, s: one_step_w(ws, c, s), x,
                                length=500)
            return y

        return run

    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32),
                    jnp.bfloat16)
    for name, dtype in [("bf16", jnp.bfloat16), ("int8", jnp.int8),
                        ("int4", jnp.int4)]:
        ws = layer_weights(dtype)
        nb = 0
        for lw in ws:
            for w in lw:
                n = int(np.prod(w.shape))
                nb += {"bf16": 2 * n, "int8": n, "int4": n // 2}[name]
        run = step_fn()
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
