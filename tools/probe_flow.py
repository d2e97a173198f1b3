"""TPU probe: where does the serving flow stage spend its time at B=32?

Times (a) full flow.inference, (b) encoder-only, (c) one estimator call at
the CFG batch (2B), (d) the 10-step euler loop, at bench.py's serving
shapes/dtypes.  Usage: python tools/probe_flow.py [B]
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.flow import (CausalMaskedDiffWithXvec,
                                       ConditionalDecoder, FlowConfig)
from cosyvoice_tpu.utils.dtype import to_bf16

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_TOKENS, P_TOK, P_FEAT = 500, 50, 100

cfg = FlowConfig(encoder_dtype="bfloat16")
cfg = dataclasses.replace(cfg, estimator=dataclasses.replace(
    cfg.estimator, fused_attention=True, dtype="bfloat16", approx_gelu=True,
    fused_norm=True))
flow = CausalMaskedDiffWithXvec(cfg)

rng = np.random.default_rng(0)
tok = jnp.asarray(rng.integers(0, 6561, (B, P_TOK + N_TOKENS)))
tok_len = jnp.full((B,), P_TOK + N_TOKENS)
pf = jnp.asarray((rng.standard_normal((B, P_FEAT, 80)) * 0.3).astype(np.float32))
emb = jnp.asarray(rng.standard_normal((B, 192)).astype(np.float32))

k = jax.random.PRNGKey(0)
params = jax.jit(lambda: flow.init(k, tok[:1], tok_len[:1], pf[:1], emb[:1],
                                   method=CausalMaskedDiffWithXvec.inference))()
params = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), params)
params = dict(params); params["params"] = dict(params["params"])
params["params"]["decoder"] = dict(params["params"]["decoder"])
params["params"]["decoder"]["estimator"] = to_bf16(params["params"]["decoder"]["estimator"])
params["params"]["encoder"] = to_bf16(params["params"]["encoder"])


def timed(name, fn, *a):
    out = fn(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.1f} ms")
    return out


@jax.jit
def full(params, tok, tok_len, pf, emb):
    return flow.apply(params, tok, tok_len, pf, emb,
                      method=CausalMaskedDiffWithXvec.inference)


@jax.jit
def encode(params, tok, tok_len):
    return flow.apply(params, tok, tok_len,
                      method=CausalMaskedDiffWithXvec._encode)


T = 2 * (P_TOK + N_TOKENS)
est = ConditionalDecoder(cfg.estimator)
est_params = {"params": params["params"]["decoder"]["estimator"]}
x2 = jnp.zeros((2 * B, T, 80), jnp.bfloat16)
mask2 = jnp.ones((2 * B, T), jnp.bfloat16)
spk2 = jnp.zeros((2 * B, 80), jnp.bfloat16)
t2 = jnp.zeros((2 * B,), jnp.bfloat16)


@jax.jit
def est_once(p, x, mask, mu, t, spks, cond):
    return est.apply(p, x, mask, mu, t, spks, cond, exact_pad_mask=True)


print(f"B={B}, T={T} (tokens {P_TOK + N_TOKENS})")
timed("flow.inference (full)", full, params, tok, tok_len, pf, emb)
timed("encoder only", encode, params, tok, tok_len)
timed("estimator x1 (batch 2B)", est_once, est_params, x2, mask2, x2, t2, spk2, x2)


# ---- ablations: where inside the estimator? ----
def est_variant(name, **kw):
    c = dataclasses.replace(cfg.estimator, **kw)
    m = ConditionalDecoder(c)
    p = jax.jit(lambda: m.init(k, x2[:1], mask2[:1], x2[:1], t2[:1], spk2[:1],
                               x2[:1]))()
    p = to_bf16(jax.tree.map(lambda v: jnp.zeros(v.shape, v.dtype), p))
    f = jax.jit(lambda p, x, mask, mu, t, spks, cond: m.apply(
        p, x, mask, mu, t, spks, cond, exact_pad_mask=True))
    timed(name, f, p, x2, mask2, x2, t2, spk2, x2)


if len(sys.argv) > 2 and sys.argv[2] == "ablate":
    est_variant("  naive attention", fused_attention=False)
    est_variant("  no DiT (n_blocks=0)", n_blocks=0)
    est_variant("  1 DiT/level (n_blocks=1)", n_blocks=1)
    est_variant("  exact gelu", approx_gelu=False)
    import cosyvoice_tpu.models.flow as F
    import cosyvoice_tpu.ops.pallas.dit_attention as DA
    orig = DA.supports
    DA.supports = lambda *a, **kw: False
    est_variant("  stock flash kernel", fused_attention=True)
    DA.supports = orig
