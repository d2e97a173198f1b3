"""Fused LayerNorm (+ optional mish) Pallas kernel for the CFM estimator.

Shape regime: serving estimator activations [B, T, C] with C=256 lanes,
B*T ~ 74k rows.  XLA lowers each nn.LayerNorm here to ~0.34 ms of VPU time
at bench shapes (multiple whole-tensor passes for stats / normalize /
affine); one fused pass is ~3x faster, and the DiT stack runs 112 of them
per estimator call (2 per block x 4 blocks x 14 levels) plus 28 causal
Block1D norms whose mish activation fuses in for free.

Numerics match flax.linen.LayerNorm exactly in structure: fp32 stats with
the fast-variance form Var = E[x^2] - E[x]^2 clipped at 0
(flax/linen/normalization.py::_compute_stats), y = (x - mean) * rsqrt(var +
eps) * scale + bias, output cast to promote(x, params).  Forward-only:
training keeps the XLA twin below.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float, act: str):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    if act == "mish":
        y = _mish(y)
    o_ref[:] = y.astype(o_ref.dtype)


def _row_chunk(N: int) -> int:
    for r in (1024, 512, 256, 128, 64, 32, 16, 8):
        if N % r == 0:
            return r
    return 0


def supports(n_rows: int, channels: int) -> bool:
    return (channels % 128 == 0 and channels <= 1024
            and _row_chunk(n_rows) > 0)


def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-5, act: str = "none",
                     interpret: bool = False) -> jax.Array:
    """LayerNorm over the last axis of x [..., C] (+ optional fused mish).

    Requires supports(prod(leading dims), C); callers fall back to
    layer_norm_xla otherwise.
    """
    shape = x.shape
    C = shape[-1]
    N = int(np.prod(shape[:-1]))
    R = _row_chunk(N)
    assert R and supports(N, C), (shape,)
    out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
    xf = x.reshape(N, C)
    gb_spec = pl.BlockSpec((1, C), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        grid=(N // R,),
        in_specs=[pl.BlockSpec((R, C), lambda i: (i, 0)), gb_spec, gb_spec],
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, C), out_dtype),
        interpret=interpret,
    )(xf, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(*shape[:-1], C)


def layer_norm_xla(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   eps: float = 1e-5, act: str = "none") -> jax.Array:
    """XLA twin — the exact flax.linen.LayerNorm fast-variance formula."""
    out_dtype = jnp.result_type(x.dtype, scale.dtype, bias.dtype)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "mish":
        y = _mish(y)
    return y.astype(out_dtype)
