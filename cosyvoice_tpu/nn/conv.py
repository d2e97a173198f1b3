"""1-D conv primitives with torch-exact shape/padding semantics, channels-last.

All activations flow as [B, T, C] (lane dim = channels) — the layout XLA tiles
best onto the MXU for 1-D convs.  Torch reference layouts ([B, C, T] with
weight [out, in, k] / [in, out, k]) exist only in the checkpoint importers.

Weight norm (used throughout the reference vocoders, e.g.
`cosyvoice/hifigan/generator.py:56-80`) is kept as an explicit (g, v)
parameterization fused at apply time, so training dynamics match torch's
`nn.utils.weight_norm` (dim=0: one norm per output channel).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _norm_v(v: jax.Array, eps: float = 0.0) -> jax.Array:
    # v: [k, in, out]; norm over (k, in) per output channel (torch dim=0)
    return jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))


def _l2n(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    # torch F.normalize(dim=0, eps=1e-12) on a vector
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def pack_conv_weights(kernel: jax.Array, dilation: int, pack: int
                      ) -> tuple[jax.Array, int, int]:
    """Rearrange a [k, Ci, Co] symmetric-pad conv kernel for lane-packed
    input [B, T/P, P*Ci] (space-to-depth along time, factor P).

    For y[P s + r] = sum_j x[P s + r + d(j - (k-1)/2)] w[j], writing the
    input index as P (s + m) + q gives one packed tap W'[m] in
    R^{(P Ci) x (P Co)} per relative block offset m.  Returns
    (W' [k', P*Ci, P*Co], pad_left, pad_right) with exact numerics: the
    same multiply-accumulates, grouped differently.

    Why: at C=64 every elementwise<->conv edge pays a whole-tensor layout
    copy on TPU (XLA lays elementwise fusions out T-minor to fill 128 lanes,
    convs need C-minor); at P*C >= 128 lanes both agree and the copies
    vanish.  Zero extra params — built from the same kernel at apply time.
    """
    k, Ci, Co = kernel.shape
    P = pack
    p = dilation * (k - 1) // 2
    taps: dict[int, list[tuple[int, int, int]]] = {}
    for r in range(P):
        for j in range(k):
            idx = r + dilation * j - p
            m, q = idx // P, idx % P
            taps.setdefault(m, []).append((j, q, r))
    m_min, m_max = min(taps), max(taps)
    kp = m_max - m_min + 1
    W = jnp.zeros((kp, P * Ci, P * Co), kernel.dtype)
    for m, entries in taps.items():
        for j, q, r in entries:
            W = W.at[m - m_min, q * Ci:(q + 1) * Ci, r * Co:(r + 1) * Co].set(
                kernel[j])
    return W, -m_min, m_max


class Conv1d(nn.Module):
    """torch.nn.Conv1d-compatible conv on [B, T, C] tensors.

    pack > 1: lane-packed mode — input/output are space-to-depth views
    [B, T/pack, pack*C]; params keep the ORIGINAL [k, Ci, Co] shape (exact
    checkpoint compatibility), rearranged at apply time via
    pack_conv_weights.  Requires stride 1, groups 1, symmetric padding
    dilation*(k-1)/2 (the HiFi-style 'same' resblock convs).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    # torch nn.utils.spectral_norm semantics: weight = W / sigma with
    # sigma = u^T W_mat v.  u/v are imported from the torch buffers (exact
    # eval parity) or initialized random.  sn_iters > 0 refreshes them with
    # that many stop-gradient power iterations per forward — the functional
    # stand-in for torch's persisted single-iteration warm start during
    # training (converged sigma is identical; no mutable state in the step).
    spectral_norm: bool = False
    sn_iters: int = 0
    dtype: jnp.dtype | None = None
    pack: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1] // self.pack
        k_shape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.weight_norm:
            v = self.param("v", nn.initializers.lecun_normal(), k_shape)
            g = self.param("g", lambda key, shape: jnp.ones(shape), (1, 1, self.features))
            kernel = g * v / _norm_v(v)
        elif self.spectral_norm:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), k_shape)
            # torch weight_mat = weight_orig.reshape(out, -1) on [out, in, k]
            w_mat = jnp.transpose(kernel, (2, 1, 0)).reshape(self.features, -1)
            norm01 = nn.initializers.normal(1.0)
            u = self.param("sn_u", lambda key, shape:
                           _l2n(norm01(key, shape)), (self.features,))
            v_sn = self.param("sn_v", lambda key, shape:
                              _l2n(norm01(key, shape)), (w_mat.shape[1],))
            # u/v act as torch's non-trainable power-iteration buffers: stop
            # gradients through them so sigma's gradient flows only via W and
            # a from-scratch discriminator can't learn to shrink sigma through
            # its u/v "parameters" (they stay flax params for checkpoint
            # import parity, but receive zero grads)
            u = jax.lax.stop_gradient(u)
            v_sn = jax.lax.stop_gradient(v_sn)
            if self.sn_iters:
                wm = jax.lax.stop_gradient(w_mat)
                uu = u
                for _ in range(self.sn_iters):
                    v_sn = _l2n(wm.T @ uu)
                    uu = _l2n(wm @ v_sn)
                u = uu
            sigma = u @ w_mat @ v_sn
            kernel = kernel / sigma
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), k_shape)
        if self.pack > 1:
            assert self.stride == 1 and self.groups == 1
            assert self.padding == (self.kernel_size - 1) * self.dilation // 2
            kernel, pl, pr = pack_conv_weights(kernel, self.dilation, self.pack)
            pad, dil = (pl, pr), 1
        else:
            pad = self.padding if isinstance(self.padding, tuple) else (self.padding, self.padding)
            dil = self.dilation
        y = lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            window_strides=(self.stride,),
            padding=[pad],
            rhs_dilation=(dil,),
            feature_group_count=self.groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.pack > 1:
                b = jnp.tile(b, self.pack)
            y = y + b
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d-compatible (output_padding 0) on [B, T, C].

    Implemented as lhs-dilated correlation with the k-flipped kernel and
    padding (k-1-p) both sides: out_len = (in-1)*stride - 2*padding + kernel.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        # stored in forward-correlation form [k, in, out], already k-flipped
        # relative to torch's convT weight at import time
        k_shape = (self.kernel_size, in_ch, self.features)
        if self.weight_norm:
            # torch weight_norm(dim=0) on convT weight [in, out, k] normalizes
            # over (out, k) per INPUT channel
            v = self.param("v", nn.initializers.lecun_normal(), k_shape)
            g = self.param("g", lambda key, shape: jnp.ones(shape), (1, in_ch, 1))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True))
            kernel = g * v / norm
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), k_shape)
        p = self.kernel_size - 1 - self.padding
        y = lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            window_strides=(1,),
            padding=[(p, p)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class CausalConv1d(nn.Module):
    """Left-padded conv: output at t sees inputs <= t (reference
    `cosyvoice/flow/decoder.py:59-86` pads k-1 on the left)."""

    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        left = (self.kernel_size - 1) * self.dilation
        return Conv1d(self.features, self.kernel_size, padding=(left, 0),
                      dilation=self.dilation, use_bias=self.use_bias,
                      weight_norm=self.weight_norm, name="conv")(x)


class Conv2d(nn.Module):
    """torch.nn.Conv2d-compatible conv on [B, H, W, C] tensors."""

    features: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k_shape = (*self.kernel_size, in_ch, self.features)
        if self.weight_norm:
            v = self.param("v", nn.initializers.lecun_normal(), k_shape)
            g = self.param("g", lambda key, shape: jnp.ones(shape),
                           (1, 1, 1, self.features))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
            kernel = g * v / norm
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), k_shape)
        y = lax.conv_general_dilated(
            x, kernel, window_strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def torch_conv2d_weight(w) -> jnp.ndarray:
    """torch Conv2d weight [out, in, kh, kw] -> ours [kh, kw, in, out]."""
    import numpy as np

    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def torch_conv_weight(w) -> jnp.ndarray:
    """torch Conv1d weight [out, in, k] -> ours [k, in, out]."""
    import numpy as np

    return jnp.asarray(np.transpose(np.asarray(w), (2, 1, 0)))


def torch_convT_weight(w) -> jnp.ndarray:
    """torch ConvTranspose1d weight [in, out, k] -> ours [k, in, out], k-flipped."""
    import numpy as np

    w = np.asarray(w)[:, :, ::-1]  # flip k
    return jnp.asarray(np.transpose(w, (2, 0, 1)))  # [k, in, out]
