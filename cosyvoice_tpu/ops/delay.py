"""Delay-pattern codec utilities + focal loss for multi-codebook LMs.

Behavioral spec: reference `cosyvoice/utils/common.py:177-217`
(get/revert_delay_pattern_codec: codebook i shifted right by i with BOS fill
at the head and EOS fill at the tail) and `cosyvoice/utils/losses.py:41-57`
(FocalLoss with gamma).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_delay_pattern(codec: jax.Array, bos_id: int, eos_id: int) -> jax.Array:
    """[B, T, N] -> [B, T+N-1, N]: codebook i delayed by i steps."""
    B, T, N = codec.shape
    out = jnp.full((B, T + N - 1, N), eos_id, codec.dtype)
    for i in range(N):
        out = out.at[:, i: i + T, i].set(codec[:, :, i])
        out = out.at[:, :i, i].set(bos_id)
    return out


def revert_delay_pattern(codec: jax.Array) -> jax.Array:
    """[B, T, N] delayed -> [B, T-(N-1), N] aligned."""
    B, T, N = codec.shape
    real = T - (N - 1)
    out = jnp.zeros((B, real, N), codec.dtype)
    for i in range(N):
        out = out.at[:, :, i].set(codec[:, i: i + real, i])
    return out


def focal_loss(logits: jax.Array, target: jax.Array, gamma: float = 1.0,
               mask: jax.Array | None = None) -> jax.Array:
    """(1-p)^gamma * CE, mean over (masked) elements; logits [..., V]."""
    logp_all = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    logp = jnp.take_along_axis(logp_all, target[..., None], axis=-1)[..., 0]
    p = jnp.exp(logp)
    loss = -((1.0 - p) ** gamma) * logp
    if mask is not None:
        return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(loss)


def vicreg_loss(x: jax.Array, y: jax.Array, sim_coeff: float = 0.5,
                std_coeff: float = 0.4, cov_coeff: float = 0.1) -> jax.Array:
    """VICReg self-supervised loss (reference llm_with_spk.py:24-66):
    invariance MSE + variance hinge + off-diagonal covariance penalty; used
    when co-training the speaker embedding with the LM."""
    B, D = x.shape
    repr_loss = jnp.mean((x - y) ** 2)
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    std_x = jnp.sqrt(xc.var(axis=0, ddof=1) + 1e-4)
    std_y = jnp.sqrt(yc.var(axis=0, ddof=1) + 1e-4)
    std_loss = (jnp.mean(jax.nn.relu(1 - std_x)) / 2
                + jnp.mean(jax.nn.relu(1 - std_y)) / 2)
    cov_x = (xc.T @ xc) / (B - 1)
    cov_y = (yc.T @ yc) / (B - 1)
    off = 1.0 - jnp.eye(D)
    cov_loss = (jnp.sum((cov_x * off) ** 2) / D
                + jnp.sum((cov_y * off) ** 2) / D)
    return sim_coeff * repr_loss + std_coeff * std_loss + cov_coeff * cov_loss
