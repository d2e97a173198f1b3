"""TPU probe: inside one DiT block at serving shapes (B=64 CFG rows, T=1152).

Per-dispatch latency through the axon tunnel is ~27 ms, so each op is looped
N times inside ONE jit (scan with data dependence) and the loop time divided.
Usage: python tools/probe_dit.py [N]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from cosyvoice_tpu.ops.pallas.dit_attention import dit_attention_packed

import os

B = int(os.environ.get("PROBE_B", "64"))  # serving reality: 2*B CFG rows
T, H, D = 1152, 8, 64
DIM, INNER, FF = 256, H * D, 1024
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
dt = jnp.bfloat16

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, DIM)), dt)
qkv = jnp.asarray(rng.standard_normal((B, T, 3 * INNER)) * 0.1, dt)
lens = jnp.full((B,), 1100, jnp.int32)
w_qkv = jnp.asarray(rng.standard_normal((DIM, 3 * INNER)) * 0.05, dt)
w_out = jnp.asarray(rng.standard_normal((INNER, DIM)) * 0.05, dt)
w_in = jnp.asarray(rng.standard_normal((DIM, FF)) * 0.05, dt)
w_ff = jnp.asarray(rng.standard_normal((FF, DIM)) * 0.05, dt)


def timed(name, fn, x0):
    """fn: x -> y with y.shape == x0.shape; scanned N times."""

    @jax.jit
    def loop(x):
        def body(h, _):
            return fn(h), None
        return jax.lax.scan(body, x, None, length=N)[0]

    jax.block_until_ready(loop(x0))
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(loop(x0))
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1e3/N:8.3f} ms/iter")


timed("attn kernel (packed, ->pad3x)",
      lambda q: jnp.tile(dit_attention_packed(q, lens, 0.125), (1, 1, 3)) * 0.1,
      qkv)
timed("qkv matmul [256->1536] (+back)",
      lambda x: (x @ w_qkv)[..., :DIM] * 0.1 + x, x)
timed("out matmul [512->256]",
      lambda x: jnp.tile((x[..., :INNER] @ w_out) * 0.01, (1, 1, 6)), qkv)
timed("ffn matmuls + gelu",
      lambda x: jax.nn.gelu(x @ w_in, approximate=True) @ w_ff, x)
from cosyvoice_tpu.ops.pallas.fused_norm import fused_layer_norm
g = jnp.ones((DIM,), dt)
bb = jnp.zeros((DIM,), dt)
timed("fused layernorm x2",
      lambda x: fused_layer_norm(fused_layer_norm(x, g, bb), g, bb), x)

from cosyvoice_tpu.models.flow import DiTBlock
blk = DiTBlock(DIM, H, D, approx_gelu=True, fused_norm=True)
params = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x[:1], None,
                                  jnp.ones((1, T), dt)))()
params = jax.tree.map(lambda v: jnp.asarray(v, dt), params)
pm = jnp.asarray(jnp.arange(T)[None, :] < 1100, dt).repeat(B, 0)
timed("whole DiTBlock", lambda x: blk.apply(params, x, None, pm), x)

timed("calib: x*1.01 elementwise", lambda x: x * 1.01, x)
timed("calib: big x*1.01 [B,T,1536]", lambda q: q * 1.01, qkv)
