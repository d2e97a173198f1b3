"""Blockwise (flash-structure) attention for TRAINING forwards, in pure XLA.

The naive training attention materializes per-layer [B, H, T, T] score and
probability tensors — at packed-row shapes (8 rows x 2048 tokens) the saved
residuals alone are tens of GB, which forced full-layer rematerialization
(~2x step cost) or capped the batch at 8 (round-4 train-config sweep,
tools/probe_train_cfg.py).  This op runs attention as a lax.scan over
key/value blocks with a running max / normalizer (the flash-attention
recurrence) and a custom_vjp whose backward re-derives each block's
probabilities from the saved logsumexp — so NOTHING quadratic in T is ever
saved: residuals are q, k, v, bias, out, lse (all O(T)).

Pure-XLA by design: this backend's Pallas custom-call DMA streams operand
blocks at ~60 GB/s vs XLA's ~657 GB/s (round-4 probes, BASELINE.md), so a
Pallas flash kernel would LOSE here; XLA fuses the scan body's exp/mul into
the block matmuls on its own.  GQA-aware: k/v stay [B, KH, S, D]
(un-repeated) and the einsums broadcast over the query-group axis, so the
saved residuals are the small kv tensors, not the repeated ones.

Numerics: accumulation in fp32 regardless of input dtype; the additive bias
must be FINITE (ops.masks.NEG_INF = -1e9, not -inf) — fully-masked rows then
degrade to a uniform distribution exactly like `jax.nn.softmax` on the naive
path.  Forward/grad equivalence vs the naive einsum+softmax attention:
tests/test_train.py::test_block_attention_{forward,grads}_match.

Replaces (training-side): the reference's HF Qwen2 attention
(cosyvoice/llm/llm.py:743-766 drives transformers' materialized-softmax
path; the reference never trained past micro-batch 1 under DeepSpeed,
utils/train_utils.py:86-101).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_blocks(k, v, bias, block: int):
    """Pad the key axis to a block multiple (keys with NEG_INF bias)."""
    S = k.shape[2]
    Sp = _round_up(S, block)
    if Sp != S:
        from cosyvoice_tpu.ops.masks import NEG_INF

        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, Sp - S)),
                       constant_values=NEG_INF)
    return k, v, bias, Sp


def _split(x, nb: int, block: int):
    """[B, h, S, d] -> [nb, B, h, block, d] scan inputs."""
    B, h, _, d = x.shape
    return x.reshape(B, h, nb, block, d).transpose(2, 0, 1, 3, 4)


def _bias_blocks(bias, KH: int, g: int, nb: int, block: int):
    """bias [B, 1|H, T, Sp] -> [nb, B, kh, gh, T, block] with kh/gh in
    {1, KH}/{1, g} (broadcast dims when the bias is head-shared)."""
    B, hb, T, _ = bias.shape
    if hb == 1:
        bb = bias.reshape(B, 1, 1, T, nb, block)
    else:
        assert hb == KH * g, (hb, KH, g)
        bb = bias.reshape(B, KH, g, T, nb, block)
    return jnp.moveaxis(bb, 4, 0).astype(jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def block_attention(q, k, v, bias, sm_scale: float, block_size: int = 256):
    """q [B, H, T, D]; k, v [B, KH, S, D] (H = KH * groups); bias
    [B, 1 or H, T, S] additive, finite.  Returns [B, H, T, D] in q.dtype."""
    out, _ = _ba_fwd(q, k, v, bias, sm_scale, block_size)
    return out


def _ba_fwd(q, k, v, bias, sm_scale: float, block_size: int):
    B, H, T, D = q.shape
    KH = k.shape[1]
    g = H // KH
    k, v, bias, Sp = _pad_blocks(k, v, bias, block_size)
    nb = Sp // block_size
    qg = q.reshape(B, KH, g, T, D).astype(jnp.float32)
    kb = _split(k.astype(jnp.float32), nb, block_size)
    vb = _split(v.astype(jnp.float32), nb, block_size)
    bb = _bias_blocks(bias, KH, g, nb, block_size)

    def step(carry, inp):
        m, l, acc = carry
        kj, vj, bj = inp
        s = jnp.einsum("bkgtd,bkcd->bkgtc", qg, kj,
                       preferred_element_type=jnp.float32) * sm_scale + bj
        m_new = jnp.maximum(m, s.max(-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l = l * corr + p.sum(-1)
        acc = acc * corr[..., None] + jnp.einsum("bkgtc,bkcd->bkgtd", p, vj)
        return (m_new, l, acc), None

    init = (jnp.full((B, KH, g, T), -1e30, jnp.float32),
            jnp.zeros((B, KH, g, T), jnp.float32),
            jnp.zeros((B, KH, g, T, D), jnp.float32))
    (m, l, acc), _ = jax.lax.scan(step, init, (kb, vb, bb))
    out = (acc / l[..., None]).reshape(B, H, T, D).astype(q.dtype)
    lse = m + jnp.log(l)
    return out, (q, k, v, bias, out, lse)


def _ba_bwd(sm_scale: float, block_size: int, res, dout):
    q, k, v, bias, out, lse = res            # k/v/bias already block-padded
    B, H, T, D = q.shape
    KH = k.shape[1]
    g = H // KH
    Sp = k.shape[2]
    nb = Sp // block_size
    S_bias = bias.shape[-1]                   # == Sp (padded in fwd)
    hb = bias.shape[1]
    qg = q.reshape(B, KH, g, T, D).astype(jnp.float32)
    df = dout.reshape(B, KH, g, T, D).astype(jnp.float32)
    of = out.reshape(B, KH, g, T, D).astype(jnp.float32)
    delta = (df * of).sum(-1)                 # [B, KH, g, T]
    kb = _split(k.astype(jnp.float32), nb, block_size)
    vb = _split(v.astype(jnp.float32), nb, block_size)
    bb = _bias_blocks(bias, KH, g, nb, block_size)
    lse_e = lse[..., None]

    def step(dq, inp):
        kj, vj, bj = inp
        s = jnp.einsum("bkgtd,bkcd->bkgtc", qg, kj,
                       preferred_element_type=jnp.float32) * sm_scale + bj
        p = jnp.exp(s - lse_e)                # [B, KH, g, T, C]
        dvj = jnp.einsum("bkgtc,bkgtd->bkcd", p, df)
        dp = jnp.einsum("bkgtd,bkcd->bkgtc", df, vj)
        ds = p * (dp - delta[..., None])      # dL/ds (pre-scale)
        dq = dq + jnp.einsum("bkgtc,bkcd->bkgtd", ds, kj) * sm_scale
        dkj = jnp.einsum("bkgtc,bkgtd->bkcd", ds, qg) * sm_scale
        if hb == 1:
            dbj = ds.sum(axis=(1, 2))[:, None]            # [B, 1, T, C]
        else:
            dbj = ds.reshape(B, KH * g, T, -1)
        return dq, (dkj, dvj, dbj)

    dq0 = jnp.zeros((B, KH, g, T, D), jnp.float32)
    dq, (dk, dv, db) = jax.lax.scan(step, dq0, (kb, vb, bb))
    dq = dq.reshape(B, H, T, D).astype(q.dtype)
    dk = jnp.moveaxis(dk, 0, 2).reshape(B, KH, Sp, -1).astype(k.dtype)
    dv = jnp.moveaxis(dv, 0, 2).reshape(B, KH, Sp, -1).astype(v.dtype)
    db = jnp.moveaxis(db, 0, 3).reshape(B, hb, T, S_bias).astype(bias.dtype)
    # un-pad to the caller's original key length (custom_vjp grads must match
    # primal shapes; the caller's S is what _pad_blocks saw before padding)
    return dq, dk, dv, db


def _ba_fwd_rule(q, k, v, bias, sm_scale, block_size):
    out, res = _ba_fwd(q, k, v, bias, sm_scale, block_size)
    return out, (res, k.shape[2], bias.shape[-1])


def _ba_bwd_rule(sm_scale, block_size, packed, dout):
    res, S, Sb = packed
    dq, dk, dv, db = _ba_bwd(sm_scale, block_size, res, dout)
    return dq, dk[:, :, :S], dv[:, :, :S], db[..., :Sb]


block_attention.defvjp(_ba_fwd_rule, _ba_bwd_rule)
