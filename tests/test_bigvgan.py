"""Golden parity: BigVGAN (anti-aliased snake) vs torch reference."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.bigvgan import (BigVGAN, BigVGANConfig,
                                          anti_alias_activation, downsample2,
                                          import_bigvgan_torch, upsample2)

SMALL = BigVGANConfig(vocab_size=30, input_size=16, output_size=16, mel_bin=8,
                      upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                      upsample_initial_channel=32,
                      resblock_kernel_sizes=(3,),
                      resblock_dilation_sizes=((1, 3),),
                      speaker_embedding_dim=8)


def test_aa_resample_matches_torch(rng):
    from cosyvoice.BigVGAN.alias_free_activation.torch.resample import (
        DownSample1d, UpSample1d)

    x = rng.standard_normal((2, 4, 50)).astype(np.float32)
    up_t = UpSample1d(2)(torch.from_numpy(x)).numpy()
    up_j = np.asarray(upsample2(jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(up_j, up_t, atol=1e-5)
    dn_t = DownSample1d(2)(torch.from_numpy(x)).numpy()
    dn_j = np.asarray(downsample2(jnp.asarray(x.transpose(0, 2, 1)))).transpose(0, 2, 1)
    np.testing.assert_allclose(dn_j, dn_t, atol=1e-5)


def test_aa_activation_matches_torch(rng):
    from cosyvoice.BigVGAN.alias_free_activation.torch.act import Activation1d
    from cosyvoice.BigVGAN.nnet.activations import SnakeBeta

    torch.manual_seed(0)
    act = Activation1d(activation=SnakeBeta(4, alpha_logscale=True))
    with torch.no_grad():
        act.act.alpha += torch.randn(4) * 0.3
        act.act.beta += torch.randn(4) * 0.3
    x = rng.standard_normal((1, 4, 64)).astype(np.float32)
    out_t = act(torch.from_numpy(x)).detach().numpy()
    out_j = anti_alias_activation(jnp.asarray(x.transpose(0, 2, 1)),
                                  jnp.asarray(act.act.alpha.detach().numpy()),
                                  jnp.asarray(act.act.beta.detach().numpy()),
                                  logscale=True)
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1), out_t,
                               atol=1e-5)


def test_bigvgan_forward_parity(rng):
    from cosyvoice.BigVGAN.bigvgan import BigVGAN as Ref

    torch.manual_seed(0)
    ref = Ref(vocab_size=SMALL.vocab_size, input_size=SMALL.input_size,
              output_size=SMALL.output_size, mel_bin=SMALL.mel_bin,
              upsample_rates=list(SMALL.upsample_rates),
              upsample_kernel_sizes=list(SMALL.upsample_kernel_sizes),
              upsample_initial_channel=SMALL.upsample_initial_channel,
              resblock_kernel_sizes=list(SMALL.resblock_kernel_sizes),
              resblock_dilation_sizes=[list(d) for d in SMALL.resblock_dilation_sizes],
              speaker_embedding_dim=SMALL.speaker_embedding_dim).eval()

    B, T = 2, 12
    token = rng.integers(0, SMALL.vocab_size, (B, T)).astype(np.int64)
    tlen = np.array([12, 9], np.int64)
    emb = rng.standard_normal((B, SMALL.speaker_embedding_dim)).astype(np.float32)
    with torch.no_grad():
        wav_t, (mel_t, _) = ref({"speech_token": torch.from_numpy(token),
                                 "speech_token_len": torch.from_numpy(tlen),
                                 "embedding": torch.from_numpy(emb)},
                                torch.device("cpu"))
    model = BigVGAN(SMALL)
    params = import_bigvgan_torch(ref_state_dict(ref), SMALL)
    wav_j, mel_j = model.apply(params, jnp.asarray(token), jnp.asarray(tlen),
                               jnp.asarray(emb))
    assert wav_j.shape == tuple(wav_t.shape)
    np.testing.assert_allclose(np.asarray(wav_j), wav_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mel_j).transpose(0, 2, 1)
                               if mel_j.shape[1] != mel_t.shape[1] else np.asarray(mel_j),
                               mel_t.numpy(), atol=2e-4, rtol=1e-3)
