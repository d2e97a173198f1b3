"""Fused anti-aliased Snake activation as a Pallas TPU kernel.

The TPU-native replacement for the reference's only CUDA kernel
(`cosyvoice/BigVGAN/alias_free_activation/cuda/anti_alias_activation_cuda.cu`,
~255 LoC fused 2x-upsample -> snake/snakebeta -> 2x-downsample with hardcoded
12-tap kaiser filters).  `models/bigvgan.anti_alias_activation` is the XLA
reference twin used for parity tests and as the fallback.

Math (derived from alias_free_activation/torch/{filter,resample}.py):
  * upsample: u[n] = 2 * sum_k x_pad[k] * h[n + 15 - 2k], x edge-padded by 5;
    polyphase split n = 2i+p gives 6 taps per phase.
  * activation: s = snake(-beta)(u)
  * downsample: y[i] = sum_{j<12} h[j] * s[clamp(2i + j - 5)] (edge clamp).

Kernel layout: grid over (batch*channel-tiles, T-tiles); input lives in
HBM/ANY and each step DMAs its [T_blk + 2*HALO, C_TILE] haloed slice into
VMEM scratch; all tap-shifted multiply-adds run on the VPU over [T_blk, 128]
lanes.  The composite keeps everything in one VMEM round-trip — the same
fusion the CUDA kernel exists for.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosyvoice_tpu.models.bigvgan import kaiser_sinc_filter1d

KS = 12          # filter taps (FILTER_SIZE in the CUDA kernel)
HALO = 12        # input halo (>= 10 needed; 12 keeps DMA slices 8-aligned)
C_TILE = 128
T_BLK = 512


def _filters():
    h = kaiser_sinc_filter1d(0.25, 0.3, KS)  # cutoff 0.5/2, half_width 0.6/2
    return h.astype(np.float32)


def _kernel(x_hbm, alpha_ref, beta_ref, out_ref, scratch, sem, *, T: int,
            n_ctiles: int, logscale: bool, has_beta: bool, h: tuple):
    bc = pl.program_id(0)
    ti = pl.program_id(1)
    b = bc // n_ctiles
    c0 = (bc % n_ctiles) * C_TILE
    t0 = ti * T_BLK

    # DMA the haloed input slice [T_BLK + 2*HALO, C_TILE] (edges covered by
    # the wrapper's replicate pre-pad, so indices are always in range).
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t0, T_BLK + 2 * HALO), pl.ds(c0, C_TILE)],
        scratch, sem)
    cp.start()
    cp.wait()

    alpha = alpha_ref[0, :]
    if logscale:
        alpha = jnp.exp(alpha)
    if has_beta:
        beta = beta_ref[0, :]
        if logscale:
            beta = jnp.exp(beta)
    else:
        beta = alpha

    def snake(u):
        s = jnp.sin(alpha[None, :] * u)
        return u + (1.0 / (beta[None, :] + 1e-9)) * s * s

    # upsampled-and-activated samples s[2i+p] for the downsample taps;
    # tap offsets are Python constants per unrolled tap, so the shifted
    # reads are STATIC ref slices (Mosaic-friendly, no dynamic_slice).
    def u_at(n_off):
        """u[2(i + t0) + n_off] for i in [0, T_BLK): [T_BLK, C] via 6 taps."""
        acc = jnp.zeros((T_BLK, C_TILE), jnp.float32)
        # taps: u[n] = 2*sum_k x_pad[k] h[n+15-2k]; n = 2i + n_off (global).
        # x_pad[k] = x_global[k - 5]; scratch idx = k - 5 - t0 + HALO.
        # h index j = n + 15 - 2k in [0, 12) -> k = (n + 15 - j)/2, parity.
        for j in range(KS):
            num = n_off + 15 - j
            if num % 2 != 0:
                continue
            dk = num // 2  # x_global index offset: i + dk - 5 (+ HALO in scratch)
            start = HALO - 5 + dk
            acc = acc + h[j] * scratch[start: start + T_BLK, :]
        return 2.0 * acc

    out = jnp.zeros((T_BLK, C_TILE), jnp.float32)
    for j in range(KS):
        # y[i] = sum_j h[j] * s(u[2i + j - 5])
        out = out + h[j] * snake(u_at(j - 5))
    out_ref[0, :, :] = out


def snake_aa_pallas(x: jax.Array, alpha: jax.Array,
                    beta: jax.Array | None = None,
                    logscale: bool = True) -> jax.Array:
    """Fused anti-alias snake: x [B, T, C] -> [B, T, C].

    Matches `models.bigvgan.anti_alias_activation` (the XLA twin) to ~1e-5
    in the interior; the first/last ~6 samples differ slightly because the
    composite replicates x (not the activated u) at sequence edges.
    Pads T to T_BLK multiples and C to 128 lanes internally.
    """
    B, T, C = x.shape
    h = tuple(float(v) for v in _filters())
    Tp = ((T + T_BLK - 1) // T_BLK) * T_BLK
    Cp = ((C + C_TILE - 1) // C_TILE) * C_TILE
    # edge-replicate by HALO (up pad 5 + down reach), zero-pad T/C to tiles
    xe = jnp.pad(x, ((0, 0), (HALO, HALO + (Tp - T)), (0, Cp - C)), mode="edge")
    a = jnp.pad(alpha, (0, Cp - C))[None, :]
    b = jnp.pad(beta if beta is not None else alpha, (0, Cp - C))[None, :]

    n_ctiles = Cp // C_TILE
    grid = (B * n_ctiles, Tp // T_BLK)

    out = pl.pallas_call(
        partial(_kernel, T=Tp, n_ctiles=n_ctiles, logscale=logscale,
                has_beta=beta is not None, h=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full array; kernel DMAs slices
            pl.BlockSpec((1, C_TILE), lambda bc, ti: (0, bc % n_ctiles),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_TILE), lambda bc, ti: (0, bc % n_ctiles),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T_BLK, C_TILE),
            lambda bc, ti: (bc // n_ctiles, ti, bc % n_ctiles),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T_BLK + 2 * HALO, C_TILE), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(xe, a, b)
    return out[:, :T, :C]
