"""Stream flow family parity: StreamConditionalDecoder / StreamConditionalCFM
(reference flow/decoder.py:337-537, flow/flow_matching.py:243-274) vs the
`stream=True` estimator config here, plus StreamMaskedDiffWithXvec behavior.

NOTE the reference fork's StreamMaskedDiffWithXvec itself cannot run:
`UpsampleConformerEncoder_v2.forward:502` passes `context=` to
`PreLookaheadLayer.forward:81`, which does not accept it (upstream CosyVoice
does).  So the full stream model is covered by upstream-semantics property
tests; the estimator/CFM pieces are golden-tested against torch.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_util import ref_state_dict  # installs stubs first
from cosyvoice_tpu.models.conformer import ConformerConfig
from cosyvoice_tpu.models.flow import (
    CFMConfig, CausalConditionalCFM, ConditionalDecoder, EstimatorConfig,
    FlowConfig, StreamMaskedDiffWithXvec, import_estimator_torch)
from tests.test_flow import _cfm_params

STREAM_SMALL = EstimatorConfig(in_channels=32, out_channels=8, causal=True,
                               channels=(16, 16), n_blocks=1, num_mid_blocks=2,
                               num_heads=2, attention_head_dim=4,
                               static_chunk_size=4, stream=True)


def _ref_stream_estimator(cfg: EstimatorConfig):
    from cosyvoice.flow.decoder import StreamConditionalDecoder as Ref

    torch.manual_seed(0)
    return Ref(in_channels=cfg.in_channels, out_channels=cfg.out_channels,
               channels=list(cfg.channels), dropout=0.0,
               attention_head_dim=cfg.attention_head_dim, n_blocks=cfg.n_blocks,
               num_mid_blocks=cfg.num_mid_blocks, num_heads=cfg.num_heads,
               act_fn="gelu",
               static_chunk_size=cfg.static_chunk_size).eval()


@pytest.mark.parametrize("streaming", [False, True])
def test_stream_estimator_parity(streaming):
    rng = np.random.default_rng(12345)
    ref = _ref_stream_estimator(STREAM_SMALL)
    B, T, F = 2, 12, 8
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    mu = rng.standard_normal((B, F, T)).astype(np.float32)
    spks = rng.standard_normal((B, F)).astype(np.float32)
    cond = rng.standard_normal((B, F, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    mask[1, :, 10:] = 0.0
    t = np.array([0.3, 0.8], np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(mask),
                      torch.from_numpy(mu), torch.from_numpy(t),
                      torch.from_numpy(spks), torch.from_numpy(cond),
                      streaming=streaming).numpy()
    model = ConditionalDecoder(STREAM_SMALL)
    params = import_estimator_torch(ref_state_dict(ref), STREAM_SMALL)
    out_j = model.apply(params, jnp.asarray(x.transpose(0, 2, 1)),
                        jnp.asarray(mask[:, 0, :]),
                        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t),
                        jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)),
                        streaming=streaming)
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1), out_ref,
                               atol=2e-4, rtol=1e-3)


def test_stream_cfm_euler_parity():
    """StreamConditionalCFM.forward (fixed seed-0 noise buffer, streaming
    chunk attention in the estimator) vs CausalConditionalCFM with the
    stream estimator, torch noise injected."""
    from cosyvoice.flow.flow_matching import StreamConditionalCFM as RefCFM

    rng = np.random.default_rng(12345)
    cfg = EstimatorConfig(in_channels=320, out_channels=80, causal=True,
                          channels=(16, 16), n_blocks=1, num_mid_blocks=1,
                          num_heads=2, attention_head_dim=8,
                          static_chunk_size=4, stream=True)
    ref_est = _ref_stream_estimator(cfg)
    ref = RefCFM(in_channels=240, cfm_params=_cfm_params(), n_spks=1,
                 spk_emb_dim=80, estimator=ref_est)
    B, T = 1, 16
    mu = rng.standard_normal((B, 80, T)).astype(np.float32)
    spks = rng.standard_normal((B, 80)).astype(np.float32)
    cond = rng.standard_normal((B, 80, T)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    with torch.no_grad():
        out_ref, _ = ref(torch.from_numpy(mu), torch.from_numpy(mask), 10,
                         spks=torch.from_numpy(spks),
                         cond=torch.from_numpy(cond), streaming=True)
    noise = ref.rand_noise[:, :, :T].numpy()
    model = CausalConditionalCFM(CFMConfig(), cfg)
    params = {"params": {"estimator": import_estimator_torch(
        ref_state_dict(ref_est), cfg)["params"]}}
    out_j = model.apply(params, jnp.asarray(mu.transpose(0, 2, 1)),
                        jnp.asarray(mask[:, 0, :]), jnp.asarray(spks),
                        jnp.asarray(cond.transpose(0, 2, 1)), n_timesteps=10,
                        noise=jnp.asarray(noise.transpose(0, 2, 1)),
                        streaming=True)
    np.testing.assert_allclose(np.asarray(out_j).transpose(0, 2, 1),
                               out_ref.numpy(), atol=5e-4, rtol=1e-2)


SMALL_FLOW = FlowConfig(
    input_size=16, output_size=8, spk_embed_dim=12, vocab_size=50,
    token_mel_ratio=2, pre_lookahead_len=3,
    encoder=ConformerConfig(dim=16, heads=2, linear_units=32, num_blocks=1,
                            dropout_rate=0.0, attention_dropout_rate=0.0,
                            input_size=16, static_chunk_size=4),
    cfm=CFMConfig(),
    estimator=EstimatorConfig(in_channels=32, out_channels=8, causal=True,
                              channels=(16,), n_blocks=1, num_mid_blocks=1,
                              num_heads=2, attention_head_dim=4,
                              static_chunk_size=4, stream=True))


def test_stream_flow_model_runs(rng):
    """flow_stream kind: training loss (both streaming modes) + inference
    with finalize=False routing real lookahead context."""
    model = StreamMaskedDiffWithXvec(SMALL_FLOW)
    B, T = 2, 12
    token = jnp.asarray(rng.integers(0, 50, (B, T)))
    token_len = jnp.asarray([T, T - 2])
    feat = jnp.asarray(rng.standard_normal((B, 2 * T, 8)).astype(np.float32))
    feat_len = token_len * 2
    emb = jnp.asarray(rng.standard_normal((B, 12)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    params = model.init(k, token, token_len, feat, feat_len, emb, k)
    for streaming in (False, True):
        out = model.apply(params, token, token_len, feat, feat_len, emb, k,
                          streaming=streaming)
        assert np.isfinite(float(out["loss"]))

    prompt_feat = jnp.asarray(
        rng.standard_normal((1, 4, 8)).astype(np.float32))
    tok1 = token[:1]
    mel_full = model.apply(params, tok1, jnp.asarray([T]), prompt_feat, emb[:1],
                           method=StreamMaskedDiffWithXvec.inference,
                           streaming=True, finalize=True)
    assert mel_full.shape == (1, 2 * T - 4, 8)
    mel_chunk = model.apply(params, tok1, jnp.asarray([T]), prompt_feat,
                            emb[:1],
                            method=StreamMaskedDiffWithXvec.inference,
                            streaming=True, finalize=False)
    # non-finalize drops the pre_lookahead tokens from the output length
    assert mel_chunk.shape == (1, 2 * (T - 3) - 4, 8)
    assert np.isfinite(np.asarray(mel_chunk)).all()
    # the context tokens must actually influence the encoding: changing the
    # lookahead tail changes the chunk output
    tok2 = tok1.at[:, -1].set((tok1[0, -1] + 7) % 50)
    mel_chunk2 = model.apply(params, tok2, jnp.asarray([T]), prompt_feat,
                             emb[:1],
                             method=StreamMaskedDiffWithXvec.inference,
                             streaming=True, finalize=False)
    assert not np.allclose(np.asarray(mel_chunk), np.asarray(mel_chunk2))


def test_flow_stream_registry():
    from cosyvoice_tpu.config import build_model

    model, cfg = build_model("flow_stream", {
        "input_size": 16, "output_size": 8, "spk_embed_dim": 12,
        "vocab_size": 50,
        "encoder": {"dim": 16, "heads": 2, "linear_units": 32,
                    "num_blocks": 1, "input_size": 16},
        "estimator": {"in_channels": 32, "out_channels": 8,
                      "channels": [16], "n_blocks": 1, "num_mid_blocks": 1,
                      "num_heads": 2, "attention_head_dim": 4,
                      "stream": True}})
    assert isinstance(model, StreamMaskedDiffWithXvec)
    assert model.cfg.estimator.stream
