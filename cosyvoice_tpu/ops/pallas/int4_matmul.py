"""Packed-int4 weight-only dequant matmul for the AR decode path.

Decode is weight-HBM-bandwidth-bound: every step reads every projection
matrix once (the reference attacks the same bound with fp16 + CUDA graphs +
vLLM/sglang, cosyvoice/llm/qwen2_5.py:72-124, llm/llm.py:2094-2716).  int8
weight-only (utils/quant.quantize_qwen_int8) halves the bf16 traffic; this
kernel halves it AGAIN by storing two int4 rows per int8 byte.

Layout: w_packed [in/2, out] int8, byte b = (row 2i) | (row 2i+1 << 4), both
nibbles two's-complement.  Scales are GROUP-WISE along the input dim
(scale [in/group, out] f32 — per-output-channel alone is too lossy at 4
bits; group-wise sub-channel scaling is the standard int4 recipe).  The
kernel unpacks in VMEM with arithmetic shifts and accumulates one fp32 MXU
dot pair per group:  y = sum_g (x_g[0::2] @ lo_g + x_g[1::2] @ hi_g) * s_g.

Why Pallas: XLA's S4 storage does not transfer through the axon client and
its int4 convert-on-read showed no bandwidth win (tools/probe_int4.py); the
packed kernel measures ~2x int8's effective bandwidth at decode shapes
(tools/probe_int4_kernel.py).  `int4_matmul_xla` is the exact XLA twin for
CPU tests / interpret mode and for large-row prefill calls, where the MXU is
compute-bound anyway and the packed operand would blow the VMEM x-block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _kernel(xe_ref, xo_ref, w_ref, s_ref, o_ref):
    # Unpack AND dequantize in VMEM (cheap VPU work on an HBM-bound kernel),
    # then ONE full-depth MXU dot per nibble half.  A per-group loop of
    # shallow [B, g/2] dots measures 61 GB/s effective bandwidth (latency-
    # bound); weight-side scaling keeps the contraction at in/2 and restores
    # the streaming rate.  bf16 scaling adds <=0.4% relative weight error —
    # 20x below the int4 quantization step itself.
    p = w_ref[...].astype(jnp.int32) & 0xFF        # [in/2, out_t]
    lo = ((p << 28) >> 28).astype(jnp.bfloat16)    # two's-complement nibbles
    hi = ((p << 24) >> 28).astype(jnp.bfloat16)
    n_g = s_ref.shape[0]
    in2, out_t = lo.shape
    g2 = in2 // n_g                                # packed rows per group
    s = s_ref[...].astype(jnp.bfloat16)            # [n_g, out_t]
    sfull = jnp.broadcast_to(s[:, None, :], (n_g, g2, out_t)).reshape(in2, out_t)
    acc = jax.lax.dot(xe_ref[...], lo * sfull,
                      preferred_element_type=jnp.float32)
    acc += jax.lax.dot(xo_ref[...], hi * sfull,
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _unpack_nibbles(w_packed: jax.Array, dtype) -> tuple[jax.Array, jax.Array]:
    p = w_packed.astype(jnp.int32) & 0xFF
    lo = ((p << 28) >> 28).astype(dtype)
    hi = ((p << 24) >> 28).astype(dtype)
    return lo, hi


def int4_matmul_xla(x: jax.Array, w_packed: jax.Array,
                    scale: jax.Array) -> jax.Array:
    """Twin of the Pallas kernel in plain XLA (materializes the unpacked
    halves — correct everywhere, no bandwidth win).  x [..., in],
    scale [n_groups, out].

    Matches the kernel's math exactly: group scales applied WEIGHT-SIDE in
    x.dtype (bf16 on TPU) before one full-depth f32-accumulated dot per
    nibble half — so a QDense layer that routes prefill here and decode
    through the kernel (models/qwen2.py) sees the same dequantized weights
    on both paths (up to MXU accumulation order)."""
    lo, hi = _unpack_nibbles(w_packed, x.dtype)
    n_g = scale.shape[0]
    g2 = w_packed.shape[0] // n_g
    sfull = jnp.repeat(scale.astype(x.dtype), g2, axis=0)  # [in/2, out]
    xe, xo = x[..., 0::2], x[..., 1::2]
    acc = jnp.dot(xe, lo * sfull, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(xo, hi * sfull, preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def int4_matmul(x: jax.Array, w_packed: jax.Array, scale: jax.Array,
                out_tile: int | None = None,
                interpret: bool = False) -> jax.Array:
    """y = dequant(w_packed, scale) applied as x @ W; x [B, in] (2-D),
    scale [n_groups, out] with n_groups dividing in/2.

    Grid over output tiles only — each program reads the full (strided-even/
    odd) activations plus one [in/2, out_tile] packed block, so weight bytes
    stream through VMEM exactly once per call.
    """
    B, IN = x.shape
    IN2, OUT = w_packed.shape
    n_g = scale.shape[0]
    assert IN2 * 2 == IN, (IN2, IN)
    assert IN2 % n_g == 0, (IN2, n_g)
    if interpret or jax.default_backend() != "tpu" or OUT % 128:
        # interpret/CPU, or OUT too small/unaligned for a lane-tiled block
        # (tiny test models) — the XLA twin is exact
        return int4_matmul_xla(x, w_packed, scale)
    if out_tile is None:  # largest multiple-of-128 divisor of OUT <= 2432
        out_tile = max(t for t in range(128, min(OUT, 2432) + 1, 128)
                       if OUT % t == 0)
    assert OUT % out_tile == 0
    xe = x[:, 0::2]   # tiny strided views; XLA splits them outside the kernel
    xo = x[:, 1::2]
    return pl.pallas_call(
        _kernel,
        grid=(OUT // out_tile,),
        in_specs=[pl.BlockSpec((B, IN2), lambda o: (0, 0)),
                  pl.BlockSpec((B, IN2), lambda o: (0, 0)),
                  pl.BlockSpec((IN2, out_tile), lambda o: (0, o)),
                  pl.BlockSpec((n_g, out_tile), lambda o: (0, o))],
        out_specs=pl.BlockSpec((B, out_tile), lambda o: (0, o)),
        out_shape=jax.ShapeDtypeStruct((B, OUT), x.dtype),
    )(xe, xo, w_packed, scale)


def pack_int4(w: np.ndarray) -> np.ndarray:
    """[in, out] int values in [-8, 7] -> [in/2, out] int8 packed bytes."""
    w = np.asarray(w)
    assert w.shape[0] % 2 == 0, "packed-int4 needs an even input dim"
    lo = w[0::2].astype(np.int32) & 0xF
    hi = w[1::2].astype(np.int32) & 0xF
    return (lo | (hi << 4)).astype(np.uint8).view(np.int8)
