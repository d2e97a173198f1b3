"""Golden parity: CAMPPlus speaker encoder vs torch reference."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.campplus import (CAMPPlus, CAMPPlusConfig,
                                           import_campplus_torch)


def test_campplus_parity(rng):
    from cosyvoice.speaker.CAMPPlus import CAMPPlus as Ref

    torch.manual_seed(0)
    ref = Ref(feat_dim=16, embedding_size=24, growth_rate=4, bn_size=2,
              init_channels=8, memory_efficient=False).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean += torch.randn_like(m.running_mean) * 0.1
                m.running_var *= torch.rand_like(m.running_var) * 0.5 + 0.75

    feats = rng.standard_normal((2, 16, 130)).astype(np.float32)  # [B, F, T]
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(feats)).numpy()

    cfg = CAMPPlusConfig(feat_dim=16, embedding_size=24, growth_rate=4,
                         bn_size=2, init_channels=8)
    model = CAMPPlus(cfg)
    variables = import_campplus_torch(ref_state_dict(ref), cfg)
    out_j = model.apply(variables, jnp.asarray(feats.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(out_j), out_ref, atol=5e-4, rtol=1e-3)


def test_kaldi_fbank_properties(rng):
    from cosyvoice_tpu.ops.kaldi import kaldi_fbank

    wav = (np.sin(np.arange(16000) * 2 * np.pi * 440 / 16000) * 0.3).astype(np.float32)
    feat = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    assert feat.shape == (1 + (16000 - 400) // 160, 80)
    assert np.isfinite(feat).all()
    # energy should concentrate near the 440 Hz bins
    peak = feat.mean(0).argmax()
    assert 5 <= peak <= 20
