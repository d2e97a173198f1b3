"""Golden parity: JAX HiFT vocoder vs the torch reference (random weights)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.hift import (ConvRNNF0Predictor, HiFTConfig,
                                       HiFTGenerator, import_hift_torch)

SMALL = HiFTConfig(
    in_channels=20, base_channels=32, nb_harmonics=2, sampling_rate=24000,
    upsample_rates=(4, 3), upsample_kernel_sizes=(8, 7),
    resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 3), (1, 3)),
    source_resblock_kernel_sizes=(5, 7),
    source_resblock_dilation_sizes=((1, 3), (1, 3)),
    f0_cond_channels=24,
)


def _ref_hift(cfg: HiFTConfig):
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as RefF0
    from cosyvoice.hifigan.generator import HiFTGenerator as RefHiFT

    torch.manual_seed(0)
    f0p = RefF0(in_channels=cfg.in_channels, cond_channels=cfg.f0_cond_channels)
    ref = RefHiFT(
        in_channels=cfg.in_channels, base_channels=cfg.base_channels,
        nb_harmonics=cfg.nb_harmonics, sampling_rate=cfg.sampling_rate,
        nsf_alpha=cfg.nsf_alpha, nsf_sigma=cfg.nsf_sigma,
        nsf_voiced_threshold=cfg.nsf_voiced_threshold,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop_len},
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(cfg.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[list(d) for d in cfg.source_resblock_dilation_sizes],
        lrelu_slope=cfg.lrelu_slope, audio_limit=cfg.audio_limit,
        f0_predictor=f0p,
    ).eval()
    return ref


def _zero_randomness(monkeypatch):
    """Make the reference SineGen deterministic: zero phase offsets + noise."""
    import cosyvoice.hifigan.generator as rg

    class ZeroUniform:
        def __init__(self, low, high):
            pass

        def sample(self, sample_shape):
            return torch.zeros(*sample_shape)

    monkeypatch.setattr(rg, "Uniform", ZeroUniform)
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))


def test_f0_predictor_parity(rng):
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as RefF0

    torch.manual_seed(1)
    ref = RefF0(in_channels=20, cond_channels=24).eval()
    mel = rng.standard_normal((2, 20, 17)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(mel)).numpy()

    sd = ref_state_dict(ref)
    from cosyvoice_tpu.models.hift import import_hift_torch
    # reuse the importer's submap by prefixing keys
    params = import_hift_torch(
        _dummy_hift_keys() |
        {f"f0_predictor.{k}": v for k, v in sd.items()}, SMALL)["params"]["f0_predictor"]
    model = ConvRNNF0Predictor(cond_channels=24)
    out_j = model.apply({"params": params}, jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=1e-5, rtol=1e-4)


def _dummy_hift_keys():
    """Minimal fake keys so import_hift_torch can index everything it expects."""
    d = {}
    cfg = SMALL
    z = lambda *s: np.zeros(s, np.float32)
    for name, (o, i, k) in {
        "conv_pre": (cfg.base_channels, cfg.in_channels, 7),
        "conv_post": (cfg.istft_n_fft + 2, cfg.base_channels // 4, 7),
    }.items():
        d[f"{name}.weight_g"] = z(o, 1, 1)
        d[f"{name}.weight_v"] = z(o, i, k)
        d[f"{name}.bias"] = z(o)
    d["m_source.l_linear.weight"] = z(1, cfg.nb_harmonics + 1)
    d["m_source.l_linear.bias"] = z(1)
    for i in range(2):
        ch_in = cfg.base_channels // (2 ** i)
        ch = cfg.base_channels // (2 ** (i + 1))
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        d[f"ups.{i}.weight_g"] = z(ch_in, 1, 1)
        d[f"ups.{i}.weight_v"] = z(ch_in, ch, k)
        d[f"ups.{i}.bias"] = z(ch)
        du = [3, 1][i]
        d[f"source_downs.{i}.weight"] = z(ch, cfg.istft_n_fft + 2, 1 if du == 1 else du * 2)
        d[f"source_downs.{i}.bias"] = z(ch)
        for pre, kk, dil in [(f"source_resblocks.{i}", cfg.source_resblock_kernel_sizes[i],
                              cfg.source_resblock_dilation_sizes[i])]:
            for j in range(len(dil)):
                for c in ("convs1", "convs2"):
                    d[f"{pre}.{c}.{j}.weight_g"] = z(ch, 1, 1)
                    d[f"{pre}.{c}.{j}.weight_v"] = z(ch, ch, kk)
                    d[f"{pre}.{c}.{j}.bias"] = z(ch)
                for a in ("activations1", "activations2"):
                    d[f"{pre}.{a}.{j}.alpha"] = z(ch)
        for j, (kk, dil) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            pre = f"resblocks.{i * 2 + j}"
            for jj in range(len(dil)):
                for c in ("convs1", "convs2"):
                    d[f"{pre}.{c}.{jj}.weight_g"] = z(ch, 1, 1)
                    d[f"{pre}.{c}.{jj}.weight_v"] = z(ch, ch, kk)
                    d[f"{pre}.{c}.{jj}.bias"] = z(ch)
                for a in ("activations1", "activations2"):
                    d[f"{pre}.{a}.{jj}.alpha"] = z(ch)
    for i in range(5):
        d[f"f0_predictor.condnet.{i * 2}.weight_g"] = z(cfg.f0_cond_channels, 1, 1)
        d[f"f0_predictor.condnet.{i * 2}.weight_v"] = z(
            cfg.f0_cond_channels, cfg.in_channels if i == 0 else cfg.f0_cond_channels, 3)
        d[f"f0_predictor.condnet.{i * 2}.bias"] = z(cfg.f0_cond_channels)
    d["f0_predictor.classifier.weight"] = z(1, cfg.f0_cond_channels)
    d["f0_predictor.classifier.bias"] = z(1)
    return d


def test_hift_inference_parity(rng, monkeypatch):
    """Full mel->wav parity with deterministic source randomness."""
    _zero_randomness(monkeypatch)
    ref = _ref_hift(SMALL)
    T = 16
    mel = (rng.standard_normal((1, SMALL.in_channels, T)).astype(np.float32) * 0.5)
    with torch.no_grad():
        wav_t, s_t = ref.inference(torch.from_numpy(mel))
    wav_t, s_t = wav_t.numpy(), s_t.numpy()

    params = import_hift_torch(ref_state_dict(ref), SMALL)
    model = HiFTGenerator(SMALL, deterministic=True)
    wav_j, s_j = model.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                             method=HiFTGenerator.inference)
    s_j = np.asarray(s_j).transpose(0, 2, 1)  # ours [B, L, 1] -> torch [B, 1, L]
    assert wav_j.shape == wav_t.shape
    np.testing.assert_allclose(s_j, s_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wav_j), wav_t, atol=2e-4, rtol=1e-3)


def test_hift_streaming_cache_source(rng, monkeypatch):
    """cache_source splice matches reference streaming behavior."""
    _zero_randomness(monkeypatch)
    ref = _ref_hift(SMALL)
    mel = (rng.standard_normal((1, SMALL.in_channels, 12)).astype(np.float32) * 0.5)
    cache = rng.standard_normal((1, 1, 24)).astype(np.float32) * 0.1
    with torch.no_grad():
        wav_t, _ = ref.inference(torch.from_numpy(mel), torch.from_numpy(cache))
    params = import_hift_torch(ref_state_dict(ref), SMALL)
    model = HiFTGenerator(SMALL, deterministic=True)
    wav_j, _ = model.apply(params, jnp.asarray(mel.transpose(0, 2, 1)),
                           jnp.asarray(cache.transpose(0, 2, 1)),
                           method=HiFTGenerator.inference)
    np.testing.assert_allclose(np.asarray(wav_j), wav_t.numpy(), atol=2e-4, rtol=1e-3)


def test_hift_bf16_serving_dtype(rng):
    """dtype="bfloat16" conv stack tracks the fp32 vocoder closely (the
    f0/source phase path and iSTFT head stay fp32 by design)."""
    import dataclasses

    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.utils.dtype import to_bf16

    cfg = HiFTConfig(base_channels=32, f0_cond_channels=16)
    mel = jnp.asarray((rng.standard_normal((1, 24, 80)) * 0.5).astype(np.float32))
    model = HiFTGenerator(cfg, deterministic=True)
    params = model.init({"params": jax.random.PRNGKey(0)}, mel)
    wav32, _ = model.apply(params, mel, method=HiFTGenerator.inference)
    m16 = HiFTGenerator(dataclasses.replace(cfg, dtype="bfloat16"),
                        deterministic=True)
    wav16, _ = m16.apply(to_bf16(params), mel, method=HiFTGenerator.inference)
    assert wav16.dtype == jnp.float32
    assert np.isfinite(np.asarray(wav16)).all()
    # waveform-level closeness: bf16 convs under tanh-ish dynamics
    err = np.abs(np.asarray(wav16) - np.asarray(wav32)).mean()
    ref = np.abs(np.asarray(wav32)).mean() + 1e-6
    assert err / ref < 0.2, (err, ref)


def test_fast_sin_accuracy():
    """fast_sin (serving polynomial sine) matches sin to ~6e-6 everywhere."""
    from cosyvoice_tpu.ops.activations import fast_sin

    x = jnp.asarray(np.linspace(-50.0, 50.0, 200001), jnp.float32)
    np.testing.assert_allclose(np.asarray(fast_sin(x)), np.sin(np.asarray(x)),
                               atol=2e-5)


def test_hift_approx_sin_serving(rng):
    """approx_sin + bf16 serving vocoder tracks the exact-fp32 one."""
    import dataclasses

    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.utils.dtype import to_bf16

    cfg = HiFTConfig(base_channels=32, f0_cond_channels=16)
    mel = jnp.asarray((rng.standard_normal((1, 24, 80)) * 0.5).astype(np.float32))
    model = HiFTGenerator(cfg, deterministic=True)
    params = model.init({"params": jax.random.PRNGKey(0)}, mel)
    wav32, _ = model.apply(params, mel, method=HiFTGenerator.inference)
    mfast = HiFTGenerator(dataclasses.replace(cfg, dtype="bfloat16",
                                              approx_sin=True),
                          deterministic=True)
    wavf, _ = mfast.apply(to_bf16(params), mel, method=HiFTGenerator.inference)
    assert np.isfinite(np.asarray(wavf)).all()
    err = np.abs(np.asarray(wavf) - np.asarray(wav32)).mean()
    ref = np.abs(np.asarray(wav32)).mean() + 1e-6
    assert err / ref < 0.2, (err, ref)


def test_pack_conv_weights_matches_unpacked(rng):
    """Lane-packed conv (space-to-depth factor P) == plain conv, all
    dilations/kernels used by the HiFT/BigVGAN resblocks."""
    from cosyvoice_tpu.nn.conv import pack_conv_weights

    B, C = 2, 8
    for P in (2, 4):
        for k, d in ((3, 1), (7, 3), (11, 5), (7, 1)):
            T = 24 * P
            x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
            w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32))
            pad = d * (k - 1) // 2
            want = jax.lax.conv_general_dilated(
                x, w, (1,), ((pad, pad),), rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            Wp, pl_, pr_ = pack_conv_weights(w, d, P)
            xp = x.reshape(B, T // P, P * C)
            got = jax.lax.conv_general_dilated(
                xp, Wp, (1,), ((pl_, pr_),),
                dimension_numbers=("NWC", "WIO", "NWC")).reshape(B, T, C)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-5), (P, k, d)


def test_hift_lane_pack_matches_unpacked(rng):
    """lane_pack=True (serving layout lever) == baseline HiFT, same params."""
    import dataclasses

    cfg = HiFTConfig(base_channels=64, f0_cond_channels=32)  # levels 32/16/8 ch
    cfg_p = dataclasses.replace(cfg, lane_pack=True)
    mel = jnp.asarray((rng.standard_normal((2, 18, 80)) * 0.3).astype(np.float32))
    k = jax.random.PRNGKey(0)
    base = HiFTGenerator(cfg, deterministic=True)
    params = base.init({"params": k, "noise": k}, mel)
    want, _ = base.apply(params, mel, method=HiFTGenerator.inference)
    got, _ = HiFTGenerator(cfg_p, deterministic=True).apply(
        params, mel, method=HiFTGenerator.inference)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
