"""TPU probe: dit_attention_packed kernel alone at serving shapes.

Scans the kernel N times inside one jit with a data dependence, forces a
device->host read for sync.  Usage: python tools/probe_dit_kernel.py [N]

Tq sweep at [64, 1152, 8x64] (amortized, 20 chained calls/jit):
  Tq=128: 4.93 ms   Tq=384: 4.34 ms   Tq=576: 4.28 ms   Tq=1152: 4.20 ms
-> whole-row query chunks win (fewer grid cells + K/V re-reads); _q_chunk
   picks the largest divisor whose fp32 score tile fits a 16 MB budget.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cosyvoice_tpu.ops.pallas.dit_attention import dit_attention_packed

import os

B = int(os.environ.get("PROBE_B", "64"))  # serving reality: 2*B CFG rows
T, H, D = 1152, 8, 64
INNER = H * D
N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
dt = jnp.bfloat16

rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((B, T, 3 * INNER)) * 0.3, dt)
lens = jnp.full((B,), 1100, jnp.int32)


@jax.jit
def loop(qkv):
    def body(h, _):
        o = dit_attention_packed(h, lens, 0.125)          # [B, T, INNER]
        # cheap dependence: write o back into the q lanes
        h = jnp.concatenate([o, h[..., INNER:]], axis=-1)
        return h, None
    return jax.lax.scan(body, qkv, None, length=N)[0]


out = loop(qkv)
float(jnp.sum(jnp.abs(out[0, 0, :8])))
ts = []
for _ in range(3):
    t0 = time.time()
    out = loop(qkv)
    float(jnp.sum(jnp.abs(out[0, 0, :8])))
    ts.append(time.time() - t0)
# concat adds ~read+write of [B,T,3I] (~0.55 ms) — constant across variants
print(f"kernel+concat: {min(ts)*1e3/N:7.3f} ms/iter  (N={N})")
