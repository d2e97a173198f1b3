"""S3 speech tokenizer: 16 kHz audio -> 25 Hz discrete speech tokens.

The reference treats this as a frozen external model: the ONNX
`speech_tokenizer_v2.onnx` at inference (`cosyvoice/cli/frontend.py:79-89`,
fed whisper 128-bin log-mel) and the `s3tokenizer` package during online-codec
training (`cosyvoice/utils/train_utils.py:434-457`).  This module provides:

  * `whisper_log_mel`: exact whisper.log_mel_spectrogram semantics (n_fft 400,
    hop 160, 128 slaney-normed mels, log10, max-8 floor, (x+4)/4 scaling) —
    the tokenizer's input contract.
  * `FSQ`: finite scalar quantization with 3^8 = 6561 codes (the v2 vocab).
  * `S3TokenizerV2`: whisper-style audio encoder (conv x2 stride-2 front,
    pre-LN transformer with sinusoidal positions) + FSQ head, dims matching
    the released v2_25hz checkpoint family so weights can be imported.
    Numerical parity against the official checkpoint requires the released
    weights (not available in this environment) — the architecture follows
    the public s3tokenizer release.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.mel import mel_filterbank
from cosyvoice_tpu.ops.stft import hann_window, stft


def whisper_log_mel(wav_16k: jax.Array, n_mels: int = 128) -> jax.Array:
    """[S] @16 kHz -> [T, n_mels] whisper-normalized log10-mel (hop 160)."""
    pad = 200  # center=True with n_fft=400
    y = jnp.pad(wav_16k, (pad, pad), mode="reflect")
    re, im = stft(y, 400, 160, hann_window(400), center=False)
    mag2 = (re * re + im * im)[..., :-1]  # whisper drops the last frame
    fb = jnp.asarray(mel_filterbank(16000, 400, n_mels, 0.0, 8000.0))
    mel = jnp.einsum("mf,ft->tm", fb, mag2)
    logspec = jnp.log10(jnp.maximum(mel, 1e-10))
    logspec = jnp.maximum(logspec, logspec.max() - 8.0)
    return (logspec + 4.0) / 4.0


class FSQ(nn.Module):
    """Finite scalar quantization: project -> bound -> round per dim.

    vocab = prod(levels); v2 uses 8 dims x 3 levels = 6561.
    """

    dim: int = 8
    levels: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """hidden [B, T, D] -> token ids [B, T]."""
        h = nn.Dense(self.dim, name="project_in")(x)
        half = (self.levels - 1) / 2.0
        bounded = jnp.tanh(h) * half + half          # [0, levels-1]
        digits = jnp.round(bounded).astype(jnp.int32)
        weights = (self.levels ** np.arange(self.dim)).astype(np.int32)
        return jnp.sum(digits * jnp.asarray(weights), axis=-1)


@dataclass(frozen=True)
class S3Config:
    n_mels: int = 128
    dim: int = 1280
    heads: int = 20
    layers: int = 12
    fsq_dim: int = 8
    fsq_levels: int = 3
    stride2: int = 2  # conv2 stride: 100 Hz mel -> 50 Hz; pooling -> 25 Hz


def _sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class S3AttentionBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        D = self.dim // self.heads
        h = nn.LayerNorm(name="attn_ln")(x)
        B, T, _ = x.shape
        q = nn.Dense(self.dim, name="q")(h).reshape(B, T, self.heads, D)
        k = nn.Dense(self.dim, use_bias=False, name="k")(h).reshape(B, T, self.heads, D)
        v = nn.Dense(self.dim, name="v")(h).reshape(B, T, self.heads, D)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k) / np.sqrt(D)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhij,bjhd->bihd", p, v).reshape(B, T, self.dim)
        x = x + nn.Dense(self.dim, name="out")(o)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(self.dim * 4, name="mlp_1")(h)
        h = jax.nn.gelu(h)
        return x + nn.Dense(self.dim, name="mlp_2")(h)


class S3TokenizerV2(nn.Module):
    cfg: S3Config = field(default_factory=S3Config)

    @nn.compact
    def __call__(self, mel: jax.Array, mel_len: jax.Array) -> tuple[jax.Array, jax.Array]:
        """mel [B, T, n_mels] (whisper-normalized) -> (tokens [B, T//4], len)."""
        cfg = self.cfg
        x = Conv1d(cfg.dim, 3, padding=1, name="conv1")(mel)
        x = jax.nn.gelu(x)
        x = Conv1d(cfg.dim, 3, stride=cfg.stride2, padding=1, name="conv2")(x)
        x = jax.nn.gelu(x)
        T = x.shape[1]
        x = x + jnp.asarray(_sinusoids(T, cfg.dim))
        out_len = mel_len // cfg.stride2
        mask = jnp.arange(T)[None, :] < out_len[:, None]
        for i in range(cfg.layers):
            x = S3AttentionBlock(cfg.dim, cfg.heads, name=f"blocks_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_post")(x)
        # 50 Hz -> 25 Hz: average-pool pairs (v2 25hz variant)
        B = x.shape[0]
        x = x[:, : (T // 2) * 2].reshape(B, T // 2, 2, cfg.dim).mean(axis=2)
        tokens = FSQ(cfg.fsq_dim, cfg.fsq_levels, name="quantizer")(x)
        tok_len = out_len // 2
        valid = jnp.arange(tokens.shape[1])[None, :] < tok_len[:, None]
        return jnp.where(valid, tokens, 0), tok_len


def s3_tokenize(model: S3TokenizerV2, variables, wav_16k: np.ndarray) -> np.ndarray:
    """Frontend contract (cli/frontend.py:79-89): <=30 s, whisper mel -> ids."""
    assert len(wav_16k) / 16000 <= 30
    mel = whisper_log_mel(jnp.asarray(wav_16k))
    toks, n = model.apply(variables, mel[None], jnp.asarray([mel.shape[0]]))
    return np.asarray(toks[0][: int(n[0])])


def make_s3_frontend_fn(model: S3TokenizerV2, variables,
                        bucket_s: float = 2.0):
    """Jitted `wav16k [S] -> token ids [T]` callable for CosyVoiceFrontEnd.

    The wav is zero-padded to a `bucket_s`-second bucket so compiles are
    bounded (<= 15 shapes for the 30 s prompt cap).  Padding is EXACT, not
    approximate: pad mel frames are forced to zero, which the conv front
    treats identically to its own zero edge-padding in an exact-length run,
    and the attention masks pad frames out; the whisper normalization max is
    unaffected because silence frames sit ~10 dB under any real signal.
    """
    import jax

    @jax.jit
    def _fn(wav, n_samples):
        mel = whisper_log_mel(wav)                       # [T_pad, n_mels]
        t_true = n_samples // 160
        keep = jnp.arange(mel.shape[0])[:, None] < t_true
        mel = jnp.where(keep, mel, 0.0)
        toks, n = model.apply(variables, mel[None], t_true[None])
        return toks[0], n[0]

    def tokenize(wav_16k: np.ndarray) -> np.ndarray:
        s = len(wav_16k)
        assert s / 16000 <= 30, "prompt audio must be <= 30 s"
        bucket = max(int(bucket_s * 16000), 160)
        s_pad = -(-s // bucket) * bucket
        wav = np.pad(np.asarray(wav_16k, np.float32), (0, s_pad - s))
        toks, n = _fn(jnp.asarray(wav), jnp.asarray(s, jnp.int32))
        return np.asarray(toks)[: int(n)]

    return tokenize


# ----------------------------------------------------------- weight import
#
# Canonical weight naming (whisper lineage, matching the public s3tokenizer
# torch port that the released speech_tokenizer_v2.onnx weights map onto):
#
#   encoder.conv1.{weight,bias}            [dim, n_mels, 3] torch conv layout
#   encoder.conv2.{weight,bias}            stride-2 conv
#   encoder.blocks.{i}.attn.{query,key,value,out}.{weight,bias}   (key: no bias)
#   encoder.blocks.{i}.attn_ln.{weight,bias}
#   encoder.blocks.{i}.mlp.{0,2}.{weight,bias}
#   encoder.blocks.{i}.mlp_ln.{weight,bias}
#   encoder.ln_post.{weight,bias}
#   quantizer.project_in.{weight,bias}     FSQ projection (alias: project_down)
#
# `encoder.positional_embedding` (fixed sinusoids) is ignored — the module
# recomputes it.  Linear weights are torch [out, in]; conv [out, in, k].

def _ln(sd, src):
    return {"scale": jnp.asarray(sd[f"{src}.weight"]),
            "bias": jnp.asarray(sd[f"{src}.bias"])}


def _dense(sd, src, bias=True):
    p = {"kernel": jnp.asarray(np.asarray(sd[f"{src}.weight"]).T)}
    if bias and f"{src}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{src}.bias"])
    return p


def import_s3tokenizer_torch(state_dict, cfg: S3Config = S3Config()) -> dict:
    """Whisper-style named weights (torch state_dict or onnx initializers,
    see naming table above) -> flax variables for `S3TokenizerV2`."""
    from cosyvoice_tpu.nn.conv import torch_conv_weight

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # tolerate both bare and 'encoder.'-prefixed names, and FSQ aliases;
    # candidates are module prefixes, probed via their '.weight' key
    def find(*cands):
        for c in cands:
            if f"{c}.weight" in sd:
                return c
        raise KeyError(f"none of {cands} in weights (saw e.g. {sorted(sd)[:8]})")

    def pre(name):
        return find(f"encoder.{name}", name)

    P: dict = {}
    for conv in ("conv1", "conv2"):
        w = pre(conv)
        P[conv] = {"kernel": torch_conv_weight(sd[f"{w}.weight"]),
                   "bias": jnp.asarray(sd[f"{w}.bias"])}
    for i in range(cfg.layers):
        b = f"blocks.{i}"
        blk = {
            "attn_ln": _ln(sd, pre(f"{b}.attn_ln")),
            "q": _dense(sd, pre(f"{b}.attn.query")),
            "k": _dense(sd, pre(f"{b}.attn.key"), bias=False),
            "v": _dense(sd, pre(f"{b}.attn.value")),
            "out": _dense(sd, pre(f"{b}.attn.out")),
            "mlp_ln": _ln(sd, pre(f"{b}.mlp_ln")),
            "mlp_1": _dense(sd, pre(f"{b}.mlp.0")),
            "mlp_2": _dense(sd, pre(f"{b}.mlp.2")),
        }
        P[f"blocks_{i}"] = blk
    P["ln_post"] = _ln(sd, pre("ln_post"))
    proj = find("quantizer.project_in", "quantizer.project_down")
    P["quantizer"] = {"project_in": _dense(sd, proj)}
    return {"params": P}


def import_s3tokenizer_onnx(path: str, cfg: S3Config = S3Config()) -> dict:
    """`speech_tokenizer_v2.onnx` weights (reference `cli/frontend.py:54-66`)
    -> flax variables, via the pure-python onnx reader."""
    from cosyvoice_tpu.utils.onnx_io import read_onnx_tensors

    return import_s3tokenizer_torch(read_onnx_tensors(path), cfg)


def s3tokenizer_state_dict(variables, cfg: S3Config = S3Config()) -> dict:
    """Inverse of `import_s3tokenizer_torch`: flax variables -> whisper-named
    numpy tensors (torch layouts).  Used to write reference-format .onnx
    fixtures/checkpoints with utils.onnx_io.write_onnx_tensors."""
    P = variables["params"]
    sd: dict[str, np.ndarray] = {}
    for conv in ("conv1", "conv2"):
        sd[f"encoder.{conv}.weight"] = np.transpose(
            np.asarray(P[conv]["kernel"]), (2, 1, 0))
        sd[f"encoder.{conv}.bias"] = np.asarray(P[conv]["bias"])
    for i in range(cfg.layers):
        blk = P[f"blocks_{i}"]
        b = f"encoder.blocks.{i}"
        for dst, src in (("attn.query", "q"), ("attn.key", "k"),
                         ("attn.value", "v"), ("attn.out", "out"),
                         ("mlp.0", "mlp_1"), ("mlp.2", "mlp_2")):
            sd[f"{b}.{dst}.weight"] = np.asarray(blk[src]["kernel"]).T
            if "bias" in blk[src]:
                sd[f"{b}.{dst}.bias"] = np.asarray(blk[src]["bias"])
        for dst, src in (("attn_ln", "attn_ln"), ("mlp_ln", "mlp_ln")):
            sd[f"{b}.{dst}.weight"] = np.asarray(blk[src]["scale"])
            sd[f"{b}.{dst}.bias"] = np.asarray(blk[src]["bias"])
    sd["encoder.ln_post.weight"] = np.asarray(P["ln_post"]["scale"])
    sd["encoder.ln_post.bias"] = np.asarray(P["ln_post"]["bias"])
    sd["quantizer.project_in.weight"] = np.asarray(
        P["quantizer"]["project_in"]["kernel"]).T
    sd["quantizer.project_in.bias"] = np.asarray(
        P["quantizer"]["project_in"]["bias"])
    return sd
