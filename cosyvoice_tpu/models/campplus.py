"""CAM++ speaker verification network (prompt audio -> speaker vector).

Behavioral spec: reference `cosyvoice/speaker/CAMPPlus.py` — FCM 2-D res
front-end (:341-382), TDNN stem stride 2, three CAM-dense-TDNN blocks
(12/24/16 layers, growth 32, bottleneck 128, dilations 1/2/2) with transit
halvings, stats pooling (mean ++ unbiased std, :35-47), dense head to the
embedding (:384-453).  The frontend feeds kaldi fbank 80 with per-utterance
mean-norm (`cli/frontend.py:93-97`).  The deployed campplus.onnx uses
embedding_size 192; the trainable torch class defaults to 512.

Inference-mode BatchNorm uses imported running stats ('batch_stats'
collection); channels-last layouts throughout.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv1d, Conv2d
from cosyvoice_tpu.ops.kaldi import kaldi_fbank


class BN(nn.Module):
    """torch BatchNorm (eval mode unless train) over the channel axis."""

    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                            momentum=0.9, use_bias=self.affine,
                            use_scale=self.affine, name="bn")(x)


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x [B, F, T, C] (NHWC with H=freq); stride applies to freq only."""
        in_c = x.shape[-1]
        h = Conv2d(self.planes, (3, 3), (self.stride, 1), (1, 1),
                   use_bias=False, name="conv1")(x)
        h = jax.nn.relu(BN(name="bn1")(h, train))
        h = Conv2d(self.planes, (3, 3), (1, 1), (1, 1), use_bias=False,
                   name="conv2")(h)
        h = BN(name="bn2")(h, train)
        if self.stride != 1 or in_c != self.planes:
            sc = Conv2d(self.planes, (1, 1), (self.stride, 1), (0, 0),
                        use_bias=False, name="shortcut_conv")(x)
            sc = BN(name="shortcut_bn")(sc, train)
        else:
            sc = x
        return jax.nn.relu(h + sc)


class FCM(nn.Module):
    """2-D conv front: [B, T, F] feats -> [B, T, C*(F//8)] (CAMPPlus.py:341-382)."""

    m_channels: int = 32
    num_blocks: Sequence[int] = (2, 2)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = jnp.swapaxes(feats, 1, 2)[..., None]  # [B, F, T, 1]
        x = Conv2d(self.m_channels, (3, 3), (1, 1), (1, 1), use_bias=False,
                   name="conv1")(x)
        x = jax.nn.relu(BN(name="bn1")(x, train))
        for li, n in enumerate(self.num_blocks):
            for bi in range(n):
                x = BasicResBlock(self.m_channels, stride=2 if bi == 0 else 1,
                                  name=f"layer{li + 1}_{bi}")(x, train)
        x = Conv2d(self.m_channels, (3, 3), (2, 1), (1, 1), use_bias=False,
                   name="conv2")(x)
        x = jax.nn.relu(BN(name="bn2")(x, train))
        B, F, T, C = x.shape
        # torch reshape merges (C, F) with C-major: [B, C*F, T]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, C * F, T)
        return jnp.swapaxes(x, 1, 2)  # [B, T, C*F]


class NL(nn.Module):
    """'batchnorm-relu' / 'batchnorm_' nonlinear stacks (CAMPPlus.py:18-33)."""

    config: str = "batchnorm-relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for name in self.config.split("-"):
            if name == "relu":
                x = jax.nn.relu(x)
            elif name == "batchnorm":
                x = BN(name="batchnorm")(x, train)
            elif name == "batchnorm_":
                x = BN(affine=False, name="batchnorm")(x, train)
        return x


class CAMLayer(nn.Module):
    """Context-aware mask conv (CAMPPlus.py:80-113): local conv gated by
    sigmoid(mlp(global-mean + 100-frame segment pooling))."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = Conv1d(self.out_channels, self.kernel_size, padding=pad,
                   dilation=self.dilation, use_bias=False,
                   name="linear_local")(x)
        T = x.shape[1]
        n_seg = -(-T // self.seg_len)
        pad_t = n_seg * self.seg_len - T
        xp = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        # ceil-mode average pooling: last segment averages only real frames
        seg = xp.reshape(x.shape[0], n_seg, self.seg_len, -1).sum(axis=2)
        counts = jnp.full((n_seg,), self.seg_len, x.dtype).at[-1].set(
            self.seg_len - pad_t)
        seg = seg / counts[None, :, None]
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :T]
        context = x.mean(axis=1, keepdims=True) + seg
        m = Conv1d(self.bn_channels // self.reduction, 1, name="linear1")(context)
        m = jax.nn.relu(m)
        m = Conv1d(self.out_channels, 1, name="linear2")(m)
        return y * jax.nn.sigmoid(m)


class CAMDenseTDNNLayer(nn.Module):
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = NL(name="nonlinear1")(x, train)
        h = Conv1d(self.bn_channels, 1, use_bias=False, name="linear1")(h)
        h = NL(name="nonlinear2")(h, train)
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel_size,
                        self.dilation, name="cam_layer")(h)


@dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192  # deployed campplus.onnx; torch class: 512
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    blocks: Sequence[tuple[int, int, int]] = ((12, 3, 1), (24, 3, 2), (16, 3, 2))


class CAMPPlus(nn.Module):
    cfg: CAMPPlusConfig = CAMPPlusConfig()

    @nn.compact
    def __call__(self, feats: jax.Array, train: bool = False) -> jax.Array:
        """feats [B, T, feat_dim] (kaldi fbank, mean-normed) -> [B, emb]."""
        cfg = self.cfg
        x = FCM(name="head")(feats, train)
        x = Conv1d(cfg.init_channels, 5, stride=2, padding=2, use_bias=False,
                   name="tdnn_conv")(x)
        x = NL(name="tdnn_nl")(x, train)
        for i, (n_layers, k, d) in enumerate(cfg.blocks):
            for j in range(n_layers):
                h = CAMDenseTDNNLayer(cfg.growth_rate,
                                      cfg.bn_size * cfg.growth_rate, k, d,
                                      name=f"block{i + 1}_tdnnd{j + 1}")(x, train)
                x = jnp.concatenate([x, h], axis=-1)
            x = NL(name=f"transit{i + 1}_nl")(x, train)
            x = Conv1d(x.shape[-1] // 2, 1, use_bias=False,
                       name=f"transit{i + 1}_conv")(x)
        x = NL(name="out_nonlinear")(x, train)
        mean = x.mean(axis=1)
        std = jnp.sqrt(jnp.maximum(x.var(axis=1, ddof=1), 0.0) + 0.0)
        stats = jnp.concatenate([mean, std], axis=-1)
        h = nn.Dense(cfg.embedding_size, use_bias=False, name="dense_linear")(stats)
        return NL("batchnorm_", name="dense_nl")(h, train)


def campplus_embed(model: CAMPPlus, variables, wav_16k: np.ndarray) -> np.ndarray:
    """Frontend contract (cli/frontend.py:91-100): kaldi fbank 80 dither 0,
    per-utterance mean-norm, CAMPPlus -> vector."""
    feat = kaldi_fbank(jnp.asarray(wav_16k))
    feat = feat - feat.mean(axis=0, keepdims=True)
    return np.asarray(model.apply(variables, feat[None]))[0]


def make_campplus_frontend_fn(model: CAMPPlus, variables):
    """Jitted `wav16k [S] -> spk vec [emb]` callable for CosyVoiceFrontEnd.

    One compile per distinct prompt length (CAMPPlus pools global statistics
    over time, so the forward cannot be padded without changing the result —
    the reference's onnxruntime session likewise runs the exact length).
    Prompts are typically reused across a session, so recompiles are rare.
    """
    import jax

    @jax.jit
    def _fn(wav):
        feat = kaldi_fbank(wav)
        feat = feat - feat.mean(axis=0, keepdims=True)
        return model.apply(variables, feat[None])[0]

    return lambda wav_16k: np.asarray(_fn(jnp.asarray(wav_16k, jnp.float32)))


def import_campplus_torch(state_dict, cfg: CAMPPlusConfig = CAMPPlusConfig()) -> dict:
    """reference CAMPPlus torch state_dict -> {'params', 'batch_stats'}."""
    from cosyvoice_tpu.nn.conv import torch_conv2d_weight, torch_conv_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    P, S = {}, {}

    def bn(dst, src, affine=True):
        p = {}
        if affine:
            p = {"scale": jnp.asarray(sd[f"{src}.weight"]),
                 "bias": jnp.asarray(sd[f"{src}.bias"])}
        _set(P, dst + ("bn",), p)
        _set(S, dst + ("bn",), {"mean": jnp.asarray(sd[f"{src}.running_mean"]),
                                "var": jnp.asarray(sd[f"{src}.running_var"])})

    def _set(tree, path, val):
        cur = tree
        for k in path[:-1]:
            cur = cur.setdefault(k, {})
        cur[path[-1]] = val

    def conv2d(dst, src, bias=False):
        p = {"kernel": torch_conv2d_weight(sd[f"{src}.weight"])}
        if bias:
            p["bias"] = jnp.asarray(sd[f"{src}.bias"])
        _set(P, dst, p)

    def conv1d(dst, src, bias=True):
        p = {"kernel": torch_conv_weight(sd[f"{src}.weight"])}
        if bias and f"{src}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{src}.bias"])
        _set(P, dst, p)

    # FCM head
    conv2d(("head", "conv1"), "head.conv1")
    bn(("head", "bn1"), "head.bn1")
    conv2d(("head", "conv2"), "head.conv2")
    bn(("head", "bn2"), "head.bn2")
    for li in (1, 2):
        for bi in range(2):
            pre = f"head.layer{li}.{bi}"
            dst = ("head", f"layer{li}_{bi}")
            conv2d(dst + ("conv1",), f"{pre}.conv1")
            bn(dst + ("bn1",), f"{pre}.bn1")
            conv2d(dst + ("conv2",), f"{pre}.conv2")
            bn(dst + ("bn2",), f"{pre}.bn2")
            if f"{pre}.shortcut.0.weight" in sd:
                conv2d(dst + ("shortcut_conv",), f"{pre}.shortcut.0")
                bn(dst + ("shortcut_bn",), f"{pre}.shortcut.1")
    # TDNN stem
    conv1d(("tdnn_conv",), "xvector.tdnn.linear", bias=False)
    bn(("tdnn_nl", "batchnorm"), "xvector.tdnn.nonlinear.batchnorm")
    # dense blocks
    for i, (n_layers, _, _) in enumerate(cfg.blocks):
        for j in range(n_layers):
            pre = f"xvector.block{i + 1}.tdnnd{j + 1}"
            dst = (f"block{i + 1}_tdnnd{j + 1}",)
            bn(dst + ("nonlinear1", "batchnorm"), f"{pre}.nonlinear1.batchnorm")
            conv1d(dst + ("linear1",), f"{pre}.linear1", bias=False)
            bn(dst + ("nonlinear2", "batchnorm"), f"{pre}.nonlinear2.batchnorm")
            conv1d(dst + ("cam_layer", "linear_local"), f"{pre}.cam_layer.linear_local", bias=False)
            conv1d(dst + ("cam_layer", "linear1"), f"{pre}.cam_layer.linear1")
            conv1d(dst + ("cam_layer", "linear2"), f"{pre}.cam_layer.linear2")
        bn((f"transit{i + 1}_nl", "batchnorm"), f"xvector.transit{i + 1}.nonlinear.batchnorm")
        conv1d((f"transit{i + 1}_conv",), f"xvector.transit{i + 1}.linear", bias=False)
    bn(("out_nonlinear", "batchnorm"), "xvector.out_nonlinear.batchnorm")
    _set(P, ("dense_linear",), {"kernel": jnp.asarray(sd["xvector.dense.linear.weight"])[:, :, 0].T})
    bn(("dense_nl", "batchnorm"), "xvector.dense.nonlinear.batchnorm", affine=False)
    return {"params": P, "batch_stats": S}


def import_campplus_onnx(path: str, cfg: CAMPPlusConfig = CAMPPlusConfig()) -> dict:
    """`campplus.onnx` from a reference model dir -> {'params', 'batch_stats'}.

    The deployed campplus.onnx (reference `cli/frontend.py:50-53`) is a torch
    export of the CAMPPlus module, so its initializer names are the torch
    state_dict names (`head.conv1.weight`, `xvector.tdnn.linear.weight`, ...)
    — the same mapping `import_campplus_torch` consumes.  Raises with the
    available initializer names if the file uses a different naming scheme
    (e.g. a constant-folded export).
    """
    from cosyvoice_tpu.utils.onnx_io import read_onnx_tensors

    sd = read_onnx_tensors(path)
    try:
        return import_campplus_torch(sd, cfg)
    except KeyError as e:
        sample = sorted(sd)[:12]
        raise KeyError(
            f"{path}: initializer {e} not found — the export does not use "
            f"torch state_dict names (saw e.g. {sample}); re-export the onnx "
            f"without constant folding or import the torch .pt instead") from e
