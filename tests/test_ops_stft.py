"""Golden tests: ops/stft vs torch.stft/istft, ops/mel structure, masks, sampling."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cosyvoice_tpu.ops import stft as jstft
from cosyvoice_tpu.ops import mel as jmel
from cosyvoice_tpu.ops import masks as jmasks


@pytest.mark.parametrize("n_fft,hop,center,S", [(16, 4, True, 1000), (1920, 480, False, 24000)])
def test_stft_matches_torch(n_fft, hop, center, S, rng):
    x = rng.standard_normal((2, S)).astype(np.float32)
    win = torch.hann_window(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop, n_fft, window=win,
                      center=center, return_complex=True)
    re_t, im_t = spec.real.numpy(), spec.imag.numpy()
    re_j, im_j = jstft.stft(jnp.asarray(x), n_fft, hop, jstft.hann_window(n_fft), center=center)
    np.testing.assert_allclose(np.asarray(re_j), re_t, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im_j), im_t, atol=2e-3, rtol=1e-4)


def test_istft_matches_torch(rng):
    n_fft, hop = 16, 4
    # magnitude/phase style spectra like the HiFT head produces
    mag = np.exp(rng.standard_normal((2, 9, 50)).astype(np.float32) * 0.3)
    ph = rng.standard_normal((2, 9, 50)).astype(np.float32)
    re, im = mag * np.cos(ph), mag * np.sin(ph)
    win = torch.hann_window(n_fft)
    y_t = torch.istft(torch.complex(torch.from_numpy(re), torch.from_numpy(im)),
                      n_fft, hop, n_fft, window=win).numpy()
    y_j = jstft.istft(jnp.asarray(re), jnp.asarray(im), n_fft, hop, jstft.hann_window(n_fft))
    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-4, rtol=1e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal((1, 480)).astype(np.float32)
    re, im = jstft.stft(jnp.asarray(x), 16, 4, jstft.hann_window(16), center=True)
    y = jstft.istft(re, im, 16, 4, jstft.hann_window(16))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_mel_filterbank_structure():
    fb = jmel.mel_filterbank(24000, 1920, 80, 0.0, 8000.0)
    assert fb.shape == (80, 961)
    assert (fb >= 0).all()
    # each filter is a single triangle: nonzero support is contiguous
    nz = fb > 0
    assert all(np.flatnonzero(r).size == 0 or
               np.all(np.diff(np.flatnonzero(r)) == 1) for r in nz)
    # slaney normalization: peak of each filter ~ 2/(width in Hz)
    assert fb.max() < 0.1


def test_log_mel_shape(rng):
    y = rng.standard_normal((1, 24000)).astype(np.float32) * 0.1
    m = jmel.log_mel_spectrogram(jnp.asarray(y))
    assert m.shape == (1, 80, 50)  # 1 s @ 24k, hop 480 -> 50 fps
    assert np.isfinite(np.asarray(m)).all()


def test_make_pad_mask():
    m = jmasks.make_pad_mask(jnp.array([5, 3, 2]), 5)
    exp = np.array([[0, 0, 0, 0, 0], [0, 0, 0, 1, 1], [0, 0, 1, 1, 1]], dtype=bool)
    np.testing.assert_array_equal(np.asarray(m), exp)


def test_subsequent_chunk_mask():
    m = np.asarray(jmasks.subsequent_chunk_mask(4, 2))
    exp = np.array([[1, 1, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1], [1, 1, 1, 1]], dtype=bool)
    np.testing.assert_array_equal(m, exp)


def test_nucleus_keep_rule_matches_reference(rng):
    """Replicate reference nucleus_sampling keep-set (common.py:126-141) on one dist."""
    from cosyvoice_tpu.ops import sampling as jsamp
    logits = rng.standard_normal(100).astype(np.float32)
    probs = torch.from_numpy(logits).softmax(dim=0)
    sorted_value, sorted_idx = probs.sort(descending=True, stable=True)
    keep_ref, cum = [], 0.0
    for i in range(len(sorted_idx)):
        if cum < 0.8 and len(keep_ref) < 25:
            cum += sorted_value[i].item()
            keep_ref.append(sorted_idx[i].item())
        else:
            break
    p = jax.nn.softmax(jnp.asarray(logits))
    top_p_vals, top_idx = jax.lax.top_k(p, 25)
    keep = jsamp.nucleus_mask(top_p_vals, 0.8, 25)
    keep_jax = [int(i) for i, k in zip(np.asarray(top_idx), np.asarray(keep)) if k]
    assert keep_jax == keep_ref


def test_ras_sampling_runs():
    from cosyvoice_tpu.ops import sampling as jsamp
    key = jax.random.PRNGKey(0)
    logits = jnp.zeros((6564,)).at[17].set(10.0)
    recent = jnp.full((10,), 17)
    valid = jnp.ones((10,), bool)
    # token 17 dominates but repeats -> fallback draw from full softmax
    tok = jsamp.ras_sample(key, logits, recent, valid)
    assert tok.shape == ()
    # no repetition -> nucleus keeps the dominant token
    tok2 = jsamp.ras_sample(key, logits, jnp.full((10,), 3), valid)
    assert int(tok2) == 17


def test_autocorr_f0_tracks_tone():
    from cosyvoice_tpu.ops.f0 import autocorr_f0, interp_to_len

    sr = 24000
    t = np.arange(sr) / sr
    wav = jnp.asarray((0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32))
    f0 = np.asarray(autocorr_f0(wav, sr=sr))
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 220.0) < 15.0
    out = np.asarray(interp_to_len(jnp.asarray(f0), 100))
    assert out.shape == (100,)
