"""Activations: Snake/SnakeBeta (periodic, for vocoders), Swish, Mish.

Behavioral spec: reference `cosyvoice/transformer/activation.py:34-84` (Snake
with optional log-scale alpha) and `cosyvoice/BigVGAN/nnet/activations.py:122`
(SnakeBeta: separate alpha for frequency and beta for magnitude, log-scale in
the BigVGAN config).  All pure elementwise fns — XLA fuses them into the
surrounding convs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def snake(x: jax.Array, alpha: jax.Array, alpha_logscale: bool = False,
          eps: float = 1e-9) -> jax.Array:
    """x + (1/alpha) * sin^2(alpha * x); alpha broadcast over channel axis."""
    if alpha_logscale:
        alpha = jnp.exp(alpha)
    s = jnp.sin(alpha * x)
    return x + (1.0 / (alpha + eps)) * s * s


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
               alpha_logscale: bool = True, eps: float = 1e-9) -> jax.Array:
    """x + (1/beta) * sin^2(alpha * x) — BigVGAN's SnakeBeta."""
    if alpha_logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    s = jnp.sin(alpha * x)
    return x + (1.0 / (beta + eps)) * s * s


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))
