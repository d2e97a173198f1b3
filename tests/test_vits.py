"""Golden parity: VITS decoder vs torch reference (deterministic paths)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict
from cosyvoice_tpu.models.vits import (VitsConfig, VitsDecoder, import_vits_torch,
                                       linear_spectrogram, vits_kl_loss)

SMALL = VitsConfig(n_vocab=30, spec_channels=33, inter_channels=16,
                   hidden_channels=16, filter_channels=24, n_heads=2,
                   n_layers=2, kernel_size=3,
                   resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
                   upsample_rates=(4, 3), upsample_initial_channel=32,
                   upsample_kernel_sizes=(8, 7), segment_size=96,
                   gin_channels=8, sample_rate=1200, frame_rate=25,
                   token_upsample_ratio=4)


def _ref_vits():
    from cosyvoice.vits.models import VitsDecoder as Ref

    torch.manual_seed(0)
    return Ref(n_vocab=SMALL.n_vocab, spec_channels=SMALL.spec_channels,
               inter_channels=SMALL.inter_channels,
               hidden_channels=SMALL.hidden_channels,
               filter_channels=SMALL.filter_channels, n_heads=SMALL.n_heads,
               n_layers=SMALL.n_layers, kernel_size=SMALL.kernel_size,
               p_dropout=0.0, resblock="1",
               resblock_kernel_sizes=list(SMALL.resblock_kernel_sizes),
               resblock_dilation_sizes=[list(d) for d in SMALL.resblock_dilation_sizes],
               upsample_rates=list(SMALL.upsample_rates),
               upsample_initial_channel=SMALL.upsample_initial_channel,
               upsample_kernel_sizes=list(SMALL.upsample_kernel_sizes),
               segment_size=SMALL.segment_size, gin_channels=SMALL.gin_channels,
               sample_rate=SMALL.sample_rate, frame_rate=SMALL.frame_rate,
               token_upsample_ratio=SMALL.token_upsample_ratio).eval()


def test_vits_inference_parity_zero_noise(rng):
    ref = _ref_vits()
    tokens = rng.integers(0, SMALL.n_vocab, (1, 12)).astype(np.int64)
    g = rng.standard_normal((1, SMALL.gin_channels)).astype(np.float32)
    with torch.no_grad():
        wav_ref = ref.inference(torch.from_numpy(tokens), torch.tensor([12]),
                                torch.from_numpy(g), noise_scale=0.0).numpy()
    model = VitsDecoder(SMALL)
    params = import_vits_torch(ref_state_dict(ref), SMALL)
    wav_j = model.apply(params, jnp.asarray(tokens), jnp.asarray([12]),
                        jnp.asarray(g), jax.random.PRNGKey(0), noise_scale=0.0,
                        method=VitsDecoder.inference)
    np.testing.assert_allclose(np.asarray(wav_j)[:, None, :], wav_ref,
                               atol=3e-4, rtol=1e-3)


def test_vits_training_and_kl(rng):
    model = VitsDecoder(SMALL)
    tokens = jnp.asarray(rng.integers(0, SMALL.n_vocab, (2, 12)))
    spec = jnp.asarray(rng.standard_normal((2, 48, SMALL.spec_channels)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, SMALL.gin_channels)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), tokens, jnp.asarray([12, 9]),
                        spec, jnp.asarray([48, 36]), g, jax.random.PRNGKey(1))
    o, (ids, x_mask, y_mask, z, z_p, m_p, logs_p, m_q, logs_q) = model.apply(
        params, tokens, jnp.asarray([12, 9]), spec, jnp.asarray([48, 36]), g,
        jax.random.PRNGKey(2))
    assert o.shape[1] == SMALL.segment_size
    # without conformer upsamplers the prior (token rate) and posterior
    # (spec rate) lengths differ; evaluate KL over the shared prefix
    L = m_p.shape[1]
    kl = vits_kl_loss(z_p[:, :L], logs_q[:, :L], m_p, logs_p, x_mask)
    assert np.isfinite(float(kl))


def test_linear_spectrogram_matches_torch(rng):
    from cosyvoice.speaker.mel_processing import spectrogram_torch

    y = rng.standard_normal((1, 2400)).astype(np.float32) * 0.3
    ref = spectrogram_torch(torch.from_numpy(y), 256, 2400, 64, 256,
                            center=False).numpy()
    ours = np.asarray(linear_spectrogram(jnp.asarray(y), 256, 64, 256))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-3)


def test_spline_transform_matches_reference(rng):
    """piecewise_rational_quadratic_transform (transforms_sdp.py:11-205):
    forward + inverse + identity tails vs torch."""
    import torch

    from cosyvoice.speaker.transforms_sdp import \
        piecewise_rational_quadratic_transform as ref_t

    from cosyvoice_tpu.ops.splines import \
        piecewise_rational_quadratic_transform as our_t

    N, bins = 50, 10
    x = (rng.standard_normal(N) * 3.0).astype(np.float32)  # some outside tails
    uw = rng.standard_normal((N, bins)).astype(np.float32)
    uh = rng.standard_normal((N, bins)).astype(np.float32)
    ud = rng.standard_normal((N, bins - 1)).astype(np.float32)
    for inverse in (False, True):
        with torch.no_grad():
            want, want_lad = ref_t(torch.from_numpy(x), torch.from_numpy(uw),
                                   torch.from_numpy(uh), torch.from_numpy(ud),
                                   inverse=inverse, tails="linear",
                                   tail_bound=5.0)
        got, got_lad = our_t(jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh),
                             jnp.asarray(ud), inverse=inverse, tails="linear",
                             tail_bound=5.0)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4,
                                   rtol=1e-4, err_msg=f"inverse={inverse}")
        np.testing.assert_allclose(np.asarray(got_lad), want_lad.numpy(),
                                   atol=1e-4, rtol=1e-4)


def test_conv_flow_matches_reference(rng):
    """ConvFlow spline coupling (speaker/modules.py:385-470) with imported
    weights, forward logdet + reverse round-trip."""
    import torch

    from cosyvoice.speaker.modules import ConvFlow as RefFlow

    from cosyvoice_tpu.models.vits import ConvFlow, import_conv_flow_torch
    from tests.reference_util import ref_state_dict

    C, F, K, L = 4, 12, 3, 2
    torch.manual_seed(0)
    ref = RefFlow(C, F, K, L).eval()
    # proj is zero-init in reference; randomize so the spline actually bends
    with torch.no_grad():
        ref.proj.weight.normal_(0, 0.3)
        ref.proj.bias.normal_(0, 0.1)
    B, T = 2, 9
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    mask[1, :, 6:] = 0.0
    with torch.no_grad():
        want, want_logdet = ref(torch.from_numpy(x), torch.from_numpy(mask))
        want_rev = ref(torch.from_numpy(want.numpy()),
                       torch.from_numpy(mask), reverse=True)

    model = ConvFlow(C, F, K, L)
    params = import_conv_flow_torch(ref_state_dict(ref), L)
    xl = jnp.asarray(x.transpose(0, 2, 1))
    ml = jnp.asarray(mask[:, 0, :])
    got, got_logdet = model.apply(params, xl, ml)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1),
                               want.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_logdet), want_logdet.numpy(),
                               atol=1e-4, rtol=1e-4)
    got_rev = model.apply(params, got, ml, reverse=True)
    np.testing.assert_allclose(np.asarray(got_rev).transpose(0, 2, 1),
                               want_rev.numpy(), atol=3e-5, rtol=1e-4)
