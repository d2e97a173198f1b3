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


def fast_sin(x: jax.Array) -> jax.Array:
    """Polynomial sine for serving-dtype activations.

    XLA's exact `sin` costs ~80 VPU ops/element on TPU and dominates the
    vocoder conv stack at audio rate (the snake activations are the single
    hottest HiFT/BigVGAN op at serving shapes).  This range-reduces to turns
    (t = x/2pi - round(x/2pi)) and evaluates a degree-9 odd least-squares
    polynomial for sin(2*pi*t): max abs error 6e-6 over the whole real line —
    two orders below bf16 resolution — at ~12 VPU ops/element."""
    t = x * 0.15915494309189535          # 1/(2 pi)
    t = t - jnp.round(t)                 # [-0.5, 0.5] turns
    t2 = t * t
    p = -74.4709398448 + t2 * 32.7688270164
    p = 81.3654923803 + t2 * p
    p = -41.3311225804 + t2 * p
    return t * (6.2830540822 + t2 * p)


def snake(x: jax.Array, alpha: jax.Array, alpha_logscale: bool = False,
          eps: float = 1e-9, approx_sin: bool = False) -> jax.Array:
    """x + (1/alpha) * sin^2(alpha * x); alpha broadcast over channel axis."""
    if alpha_logscale:
        alpha = jnp.exp(alpha)
    s = (fast_sin if approx_sin else jnp.sin)(alpha * x)
    return x + (1.0 / (alpha + eps)) * s * s


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
               alpha_logscale: bool = True, eps: float = 1e-9,
               approx_sin: bool = False) -> jax.Array:
    """x + (1/beta) * sin^2(alpha * x) — BigVGAN's SnakeBeta."""
    if alpha_logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    s = (fast_sin if approx_sin else jnp.sin)(alpha * x)
    return x + (1.0 / (beta + eps)) * s * s


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))
