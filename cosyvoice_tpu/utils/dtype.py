"""Mixed-precision helpers: the perf path runs params/activations in bf16
(the reference's fp16-halving lever, `cli/model.py:43-45`), with fp32 kept
for softmax/RMSNorm/logits inside the models."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_bf16(tree):
    """Cast float32 leaves to bfloat16 (params for the bandwidth-bound path)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree)


def to_f32(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x, tree)
