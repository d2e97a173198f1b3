"""Incremental streaming flow (models/flow_chunk.py) == the one-shot
stream-masked model to fp tolerance.

The one-shot twin is `CausalMaskedDiffWithXvec.inference(streaming=True,
finalize=True, chunk_anchor=...)` with the SAME anchored chunk grid and
finite left_chunks — chunked processing with cached encoder K/V, estimator
per-euler-step K/V and conv histories must reproduce it row for row
(reference behavioral spec: StreamConditionalDecoder flow/decoder.py:337-537
run over the full prefix per chunk; here each row is computed once)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.conformer import ConformerConfig
from cosyvoice_tpu.models.flow import (CFMConfig, EstimatorConfig, FlowConfig,
                                       StreamMaskedDiffWithXvec)
from cosyvoice_tpu.models import flow_chunk as FC

CFG = FlowConfig(
    input_size=16, output_size=8, spk_embed_dim=12, vocab_size=50,
    token_mel_ratio=2, pre_lookahead_len=3,
    encoder=ConformerConfig(dim=16, heads=2, linear_units=32, num_blocks=2,
                            dropout_rate=0.0, attention_dropout_rate=0.0,
                            input_size=16, static_chunk_size=4),
    cfm=CFMConfig(n_timesteps=4),
    estimator=EstimatorConfig(in_channels=32, out_channels=8, causal=True,
                              channels=(16,), n_blocks=1, num_mid_blocks=2,
                              num_heads=2, attention_head_dim=4,
                              static_chunk_size=8, stream=True,
                              left_chunks=1))
HOP = 4          # tokens; multiple of enc C (4) and est C/ratio (4)
LA = 3


def _setup(B, P_toks, gen_lens, seed=0):
    rng = np.random.default_rng(seed)
    model = StreamMaskedDiffWithXvec(CFG)
    Pmax = max(P_toks)
    Gmax = max(gen_lens)
    T = Pmax + Gmax
    token = np.zeros((B, T), np.int32)
    tlen = np.zeros(B, np.int32)
    pf = np.zeros((B, 2 * Pmax, 8), np.float32)
    pfl = np.zeros(B, np.int32)
    toks = []
    for b in range(B):
        pt = rng.integers(1, 50, P_toks[b])
        gt = rng.integers(1, 50, gen_lens[b])
        toks.append((pt, gt))
        token[b, :P_toks[b] + gen_lens[b]] = np.concatenate([pt, gt])
        tlen[b] = P_toks[b] + gen_lens[b]
        pfl[b] = 2 * P_toks[b]
        pf[b, :pfl[b]] = rng.standard_normal((pfl[b], 8)) * 0.3
    emb = rng.standard_normal((B, 12)).astype(np.float32)
    noise = rng.standard_normal((1, 2 * T + 8, 8)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(token[:, :6]),
                        jnp.asarray([6] * B),
                        jnp.zeros((B, 12, 8)), jnp.asarray([12] * B),
                        jnp.asarray(emb), jax.random.PRNGKey(2))
    return model, params, token, tlen, pf, pfl, emb, noise, toks


def _one_shot(model, params, token, tlen, pf, pfl, emb, noise, anchors):
    T = token.shape[1]
    return np.asarray(model.apply(
        params, jnp.asarray(token), jnp.asarray(tlen), jnp.asarray(pf),
        jnp.asarray(emb),
        n_timesteps=CFG.cfm.n_timesteps,
        noise=jnp.asarray(noise[:, :2 * T]), streaming=True, finalize=True,
        prompt_feat_len=jnp.asarray(pfl),
        chunk_anchor=jnp.asarray(anchors),
        method=StreamMaskedDiffWithXvec.inference))


def _run_chunks(model, params, toks, P_toks, gen_lens, pf, pfl, emb, noise,
                B):
    state = FC.init_state(CFG, B, tok_cap=64)
    state = state._replace(anchor=jnp.asarray(P_toks, jnp.int32))
    Gmax = max(gen_lens)
    n_chunks = -(-Gmax // HOP)
    out = [[] for _ in range(B)]
    Pmax_t = max(P_toks)

    def apply_chunk(tok_c, ctx_c, cl, nv, z, first, pfeat=None, pflen=None,
                    ragged=True):
        nonlocal state
        mel, state = model.apply(
            params, jnp.asarray(tok_c), jnp.asarray(ctx_c),
            (jnp.asarray(pfeat) if pfeat is not None
             else jnp.zeros((B, 1, 8))),
            (jnp.asarray(pflen) if pflen is not None
             else jnp.zeros(B, jnp.int32)),
            jnp.asarray(emb), jnp.asarray(nv, np.int32),
            jnp.asarray(cl, np.int32), state,
            jnp.asarray(z), first=first, ragged_tail=ragged,
            method=FC.flow_chunk)
        return np.asarray(mel)

    def ctx_for(gt, s):
        """Lookahead tokens after position s (up to LA) + their count."""
        rest = gt[s:s + LA]
        c = np.zeros(LA, np.int32)
        c[:len(rest)] = rest
        return c, len(rest)

    # chunk 0: [prompt ++ first hop] per row, tail-padded to the bucket
    M0 = Pmax_t + HOP
    tok0 = np.zeros((B, M0), np.int32)
    ctx0 = np.zeros((B, LA), np.int32)
    cl0 = np.zeros(B, np.int32)
    nv0 = np.zeros(B, np.int32)
    z0 = np.zeros((B, 2 * M0, 8), np.float32)
    for b in range(B):
        pt, gt = toks[b]
        n = len(pt) + min(HOP, len(gt))
        tok0[b, :n] = np.concatenate([pt, gt[:HOP]])
        nv0[b] = n
        ctx0[b], cl0[b] = ctx_for(gt, HOP)
        z0[b] = noise[0, :2 * M0]
    mel = apply_chunk(tok0, ctx0, cl0, nv0, z0, True, pf, pfl)
    for b in range(B):
        out[b].append(mel[b, 2 * len(toks[b][0]): 2 * nv0[b]])

    for c in range(1, n_chunks):
        s = c * HOP
        tok_c = np.zeros((B, HOP), np.int32)
        ctx_c = np.zeros((B, LA), np.int32)
        cl = np.zeros(B, np.int32)
        nv = np.zeros(B, np.int32)
        z = np.zeros((B, 2 * HOP, 8), np.float32)
        for b in range(B):
            pt, gt = toks[b]
            take = max(0, min(HOP, len(gt) - s))
            tok_c[b, :take] = gt[s:s + take]
            nv[b] = take
            ctx_c[b], cl[b] = ctx_for(gt, s + HOP)
            p0 = 2 * (len(pt) + s)
            z[b] = noise[0, p0:p0 + 2 * HOP]
        # full (non-ragged) non-final chunks drive the static-slice cache
        # roll fast path the serving engine uses (ragged_tail=False)
        mel = apply_chunk(tok_c, ctx_c, cl, nv, z, False,
                          ragged=bool((nv != HOP).any()))
        for b in range(B):
            out[b].append(mel[b, :2 * nv[b]])
    return [np.concatenate(o, axis=0) for o in out]


@pytest.mark.parametrize("P_toks,gen_lens", [
    ([3], [12]),               # prompt NOT on the grid; 3 exact chunks
    ([3, 4], [11, 8]),         # ragged batch: final chunk partial, row 1
])                             # finishes a chunk early
def test_incremental_matches_one_shot(P_toks, gen_lens):
    B = len(P_toks)
    model, params, token, tlen, pf, pfl, emb, noise, toks = _setup(
        B, P_toks, gen_lens)
    want = _one_shot(model, params, token, tlen, pf, pfl, emb, noise, P_toks)
    got = _run_chunks(model, params, toks, P_toks, gen_lens, pf, pfl, emb,
                      noise, B)
    for b in range(B):
        # with prompt_feat_len the one-shot returns the FULL mel; the
        # generated region for row b is [pfl_b, pfl_b + 2*gen_len_b)
        w = want[b, pfl[b]: pfl[b] + 2 * gen_lens[b]]
        np.testing.assert_allclose(got[b], w, atol=2e-4, rtol=1e-3)
