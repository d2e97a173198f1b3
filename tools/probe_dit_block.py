"""TPU probe: fused whole-DiT-block kernel vs the unfused serving block.

Usage: PROBE_B=128 python tools/probe_dit_block.py [N]
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from cosyvoice_tpu.models.flow import DiTBlock
from cosyvoice_tpu.ops.pallas.dit_block import dit_block_fused

B = int(os.environ.get("PROBE_B", "128"))
T, H, D = 1152, 8, 64
DIM, INNER, FF = 256, H * D, 1024
N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
dt = jnp.bfloat16

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, DIM)) * 0.5, dt)
lens = jnp.full((B,), 1100, jnp.int32)
pm = jnp.asarray(jnp.arange(T)[None, :] < 1100, dt).repeat(B, 0)

blk = DiTBlock(DIM, H, D, approx_gelu=True, fused_norm=True)
params = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x[:1], None,
                                  jnp.ones((1, T), dt)))()
params = jax.tree.map(lambda v: jnp.asarray(v, dt), params)
p = params["params"]
wqkv = jnp.concatenate([p["to_q"], p["to_k"], p["to_v"]], axis=1)
fused_args = (p["norm1"]["scale"], p["norm1"]["bias"], wqkv,
              p["to_out"]["kernel"], p["to_out"]["bias"],
              p["norm3"]["scale"], p["norm3"]["bias"],
              p["ff_in"]["kernel"], p["ff_in"]["bias"],
              p["ff_out"]["kernel"], p["ff_out"]["bias"])


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
    print(f"{name:30s} {min(ts)*1e3/N:7.3f} ms/iter")
    return out


a = timed("unfused DiTBlock (serving)",
          lambda h: blk.apply(params, h, None, pm))
b = timed("fused dit_block kernel",
          lambda h: dit_block_fused(h, lens, *fused_args, sm_scale=1.0 / 8.0,
                                    heads=H, head_dim=D))
want = blk.apply(params, x, None, pm)
got = dit_block_fused(x, lens, *fused_args, sm_scale=1.0 / 8.0, heads=H,
                      head_dim=D)
err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                            - got.astype(jnp.float32))[:, :1100]))
scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
print(f"max |unfused - fused| on valid rows: {err:.3e} (out scale {scale:.2f})")
