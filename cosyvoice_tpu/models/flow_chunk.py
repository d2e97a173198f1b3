"""Incremental streaming flow: token chunks -> mel chunks with cached state.

THE structural serving lever of round 5 (r4 VERDICT #2): the windowed
streaming path re-runs the flow encoder + 10-step CFM over the whole
prompt+context window (~600 mel rows) to emit one hop (~100 rows) — a >2x
rework factor that is most of the measured 76x-vs-161x continuous-engine
gap.  This module computes each mel row EXACTLY ONCE: every chunk runs only
its new rows through the encoder and the CFM estimator against cached
left-context state:

  * flow encoder (UpsampleConformerEncoder): per-layer K/V caches at token
    and mel rate (RelPositionAttention.chunk_decode handles the espnet
    rel-pos skew at a dynamic offset), 2-row conv histories for the
    pre-lookahead and upsample convs;
  * CFM estimator (ConditionalDecoder, stream config): per-EULER-STEP,
    per-DiT-block K/V caches over the last `left_chunks * static_chunk_size`
    mel rows, plus 2-row histories for every causal conv.  Chunk-causal
    masks make each row's 10-step Euler trajectory independent of later
    rows, so per-chunk completion is exact.

Exactness: chunked output == the one-shot stream-masked model
(`inference(streaming=True)` with the same `chunk_anchor` and finite
`left_chunks`) to fp tolerance — tests/test_flow_incremental.py.  The chunk
grid is ANCHORED at the prompt/generation boundary (ops/masks.
anchored_chunk_ids) so serving hops (multiples of the chunk size) always end
on grid boundaries regardless of prompt length.

Deviations from the reference stream family, both documented serving levers:
the reference re-computes the full prefix per chunk with UNBOUNDED left
context (flow/decoder.py:483 passes num_left_chunks=-1) and an absolute
chunk grid; here left context is finite (left_chunks) and the grid is
anchored.  Reference behavioral spec: StreamConditionalDecoder
(cosyvoice/flow/decoder.py:337-537), StreamMaskedDiffWithXvec
(cosyvoice/flow/flow.py:322-455).
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosyvoice_tpu.ops.masks import NEG_INF, anchored_chunk_ids


def tail_rows(full: jax.Array, shift: jax.Array, rows: int) -> jax.Array:
    """Last `rows` VALID rows of `full` [B, H+N, ...] whose layout is
    [H history rows ++ N new rows] with per-row valid new counts `shift`:
    slice [shift_b, shift_b + rows)."""
    return jax.vmap(lambda f, s: jax.lax.dynamic_slice_in_dim(f, s, rows, 0)
                    )(full, shift)


def roll_rows(cache: jax.Array, new: jax.Array, shift: jax.Array) -> jax.Array:
    """Keep the last `cache rows` valid rows: cache [B, R, ...], new
    [B, N, ...] (rows >= shift_b are pad), shift [B] = per-row valid count.
    Returns [B, R, ...] = per row, rows [shift_b, shift_b + R) of
    [cache ++ new] — i.e. the stream's most recent R valid rows."""
    R = cache.shape[1]
    full = jnp.concatenate([cache, new], axis=1)
    return jax.vmap(lambda f, s: jax.lax.dynamic_slice_in_dim(f, s, R, 0)
                    )(full, shift)


class FlowChunkState(NamedTuple):
    """All cross-chunk state for B concurrent streams (estimator rows are
    2B: classifier-free-guidance cond/uncond halves, solve_euler's layout)."""

    # encoder, token rate: [L, B, Tcap, H, D]
    enc_k: jax.Array
    enc_v: jax.Array
    # encoder, mel rate: [Lu, B, 2*Tcap, H, D]
    up_k: jax.Array
    up_v: jax.Array
    pre_hist: jax.Array      # [B, 2, dim]   pre-lookahead conv2 inputs
    ups_hist: jax.Array      # [B, 2, dim]   token-rate rows for the upsample conv
    # estimator: [S, L_est, 2B, R, 2, inner] per-euler-step DiT K/V
    est_kv: jax.Array
    # estimator conv histories: dict name -> [S, 2B, 2, C_in]
    est_conv: dict
    tok_pos: jax.Array       # [B] token frontier (valid tokens incl. prompt)
    anchor: jax.Array        # [B] prompt token count (grid anchor)


def est_block_count(cfg) -> int:
    assert len(cfg.channels) == 1, "incremental flow: single-level estimator"
    return (2 + cfg.num_mid_blocks) * cfg.n_blocks


def est_conv_shapes(cfg) -> dict:
    """name -> input channel width of every causal conv in the estimator."""
    ch = cfg.channels[0]
    shapes = {"d0b1": cfg.in_channels, "d0b2": ch, "ds0": ch,
              "u0b1": 2 * ch, "u0b2": ch, "us0": ch, "fb": ch}
    for i in range(cfg.num_mid_blocks):
        shapes[f"m{i}b1"] = ch
        shapes[f"m{i}b2"] = ch
    return shapes


def init_state(flow_cfg, B: int, tok_cap: int, dtype=jnp.float32,
               est_dtype=None) -> FlowChunkState:
    """Zero state for B streams.  tok_cap bounds total tokens (prompt+gen);
    the estimator cache keeps R = left_chunks * static_chunk_size mel rows
    (left_chunks must be finite in flow_cfg.estimator)."""
    enc = flow_cfg.encoder
    est = flow_cfg.estimator
    assert est.stream and est.left_chunks >= 0, (
        "incremental flow needs the stream estimator with finite "
        "left_chunks")
    H, D = enc.heads, enc.dim // enc.heads
    S = flow_cfg.cfm.n_timesteps
    R = est.left_chunks * est.static_chunk_size
    inner = est.num_heads * est.attention_head_dim
    edt = est_dtype or jnp.dtype(est.dtype)
    conv = {k: jnp.zeros((S, 2 * B, 2, c), edt)
            for k, c in est_conv_shapes(est).items()}
    return FlowChunkState(
        enc_k=jnp.zeros((enc.num_blocks, B, tok_cap, H, D), dtype),
        enc_v=jnp.zeros((enc.num_blocks, B, tok_cap, H, D), dtype),
        up_k=jnp.zeros((4, B, 2 * tok_cap, H, D), dtype),
        up_v=jnp.zeros((4, B, 2 * tok_cap, H, D), dtype),
        pre_hist=jnp.zeros((B, 2, enc.dim), dtype),
        ups_hist=jnp.zeros((B, 2, enc.dim), dtype),
        est_kv=jnp.zeros((S, est_block_count(est), 2 * B, max(R, 1), 2,
                          inner), edt),
        est_conv=conv,
        tok_pos=jnp.zeros((B,), jnp.int32),
        anchor=jnp.zeros((B,), jnp.int32))


def reset_rows(state: FlowChunkState, keep: jax.Array) -> FlowChunkState:
    """Zero the state of streams where keep[b] is False (slot recycling).
    Estimator rows b and b+B (cond/uncond) follow stream b."""
    B = state.tok_pos.shape[0]
    keep2 = jnp.concatenate([keep, keep])

    def z(x, k):
        return jnp.where(k.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0)

    return FlowChunkState(
        enc_k=jax.vmap(z, in_axes=(0, None))(state.enc_k, keep),
        enc_v=jax.vmap(z, in_axes=(0, None))(state.enc_v, keep),
        up_k=jax.vmap(z, in_axes=(0, None))(state.up_k, keep),
        up_v=jax.vmap(z, in_axes=(0, None))(state.up_v, keep),
        pre_hist=z(state.pre_hist, keep),
        ups_hist=z(state.ups_hist, keep),
        est_kv=jax.vmap(jax.vmap(z, in_axes=(0, None)),
                        in_axes=(0, None))(state.est_kv, keep2),
        est_conv={k: jax.vmap(z, in_axes=(0, None))(v, keep2)
                  for k, v in state.est_conv.items()},
        tok_pos=jnp.where(keep, state.tok_pos, 0),
        anchor=jnp.where(keep, state.anchor, 0))


# --------------------------------------------------------------------------
# encoder chunk
# --------------------------------------------------------------------------

def _conv_hist_chunk(conv, h, mask, hist):
    """Causal k3 conv with built-in (2,0) padding driven chunk-wise: prepend
    the 2-row history, drop the 2 history outputs.  Returns (out, inputs)."""
    xin = jnp.concatenate([hist, h * mask[..., None]], axis=1)
    return conv(xin)[:, 2:], xin


def _enc_bias(pos, n_valid, M, Tcap, anchor, C, dtype):
    """[B, M, Tcap] additive: anchored chunk-causal (full left) + validity.
    Query i sits at absolute pos_b + i; key slot j IS absolute position j."""
    B = pos.shape[0]
    qa = pos[:, None] + jnp.arange(M)[None, :]               # [B, M]
    ka = jnp.arange(Tcap)[None, :]                           # [1, Tcap]
    cq = anchored_chunk_ids(qa, anchor[:, None], C)
    ck = anchored_chunk_ids(jnp.broadcast_to(ka, (B, Tcap)), anchor[:, None], C)
    keep = ck[:, None, :] <= cq[:, :, None]
    keep = keep & (ka[:, None, :] < (pos + n_valid)[:, None, None])
    return jnp.where(keep, 0.0, NEG_INF).astype(dtype)


def encoder_chunk(mdl, tokens, ctx_tokens, ctx_len, n_valid,
                  state: FlowChunkState):
    """One encoder step over M new tokens.  mdl = CausalMaskedDiffWithXvec
    (bound).  tokens [B, M] (rows >= n_valid are pad), ctx_tokens [B, la]
    lookahead with per-row valid counts ctx_len [B] (0 = this row's stream
    ends here: the lookahead degrades to the one-shot zero pad), n_valid [B].
    Returns (mu [B, 2M, 80], mel_valid_mask [B, 2M], new state fields)."""
    enc = mdl.encoder
    cfg = enc.cfg
    B, M = tokens.shape
    la = enc.pre_lookahead_len
    valid = (jnp.arange(M)[None, :] < n_valid[:, None])
    edt = jnp.dtype(mdl.cfg.encoder_dtype)
    emb = mdl.input_embedding(jnp.maximum(tokens, 0)) * valid[..., None]
    emb = emb.astype(edt)
    ctx_emb = mdl.input_embedding(jnp.maximum(ctx_tokens, 0)).astype(edt)

    xs = enc.embed(emb) * valid[..., None].astype(edt)
    # scatter the (embedded) lookahead rows at each row's valid frontier so
    # the right-looking conv1 sees [valid rows ++ context] contiguously even
    # when the chunk is tail-padded (PreLookaheadLayer.chunk); rows past
    # ctx_len zero out (finished streams keep the one-shot right-zero-pad)
    cemb = enc.embed(ctx_emb)
    cemb = cemb * (jnp.arange(la)[None, :] < ctx_len[:, None])[..., None
                                                               ].astype(edt)
    ctx_buf = jax.vmap(lambda c, s: jax.lax.dynamic_update_slice(
        jnp.zeros((M + la, c.shape[-1]), c.dtype), c, (s, 0))
    )(cemb, n_valid)
    xs, pre_in = enc.pre_lookahead_layer.chunk(xs, ctx_buf, state.pre_hist)

    Tcap = state.enc_k.shape[2]
    bias = _enc_bias(state.tok_pos, n_valid, M, Tcap, state.anchor,
                     cfg.static_chunk_size, xs.dtype)
    new_ek, new_ev = [], []
    for i, layer in enumerate(enc.encoders):
        xs, lk, lv = layer.chunk(xs, state.enc_k[i], state.enc_v[i],
                                 state.tok_pos, bias)
        new_ek.append(lk)
        new_ev.append(lv)

    up, ups_in = enc.up_layer.chunk(xs * valid[..., None].astype(xs.dtype),
                                    state.ups_hist)
    # NOTE: the one-shot path multiplies by the pad mask before the upsample
    # conv (h * m); valid rows only read valid/history rows, so this matches
    M2 = 2 * M
    valid2 = (jnp.arange(M2)[None, :] < (2 * n_valid)[:, None])
    up = enc.up_embed(up) * valid2[..., None].astype(up.dtype)
    bias2 = _enc_bias(2 * state.tok_pos, 2 * n_valid, M2,
                      state.up_k.shape[2], 2 * state.anchor,
                      2 * cfg.static_chunk_size, up.dtype)
    new_uk, new_uv = [], []
    for i, layer in enumerate(enc.up_encoders):
        up, lk, lv = layer.chunk(up, state.up_k[i], state.up_v[i],
                                 2 * state.tok_pos, bias2)
        new_uk.append(lk)
        new_uv.append(lv)
    up = enc.after_norm(up)
    mu = mdl.encoder_proj(up.astype(jnp.float32)) * valid2[..., None]

    new = dict(
        enc_k=jnp.stack(new_ek), enc_v=jnp.stack(new_ev),
        up_k=jnp.stack(new_uk), up_v=jnp.stack(new_uv),
        pre_hist=roll_rows(state.pre_hist, pre_in[:, 2:], n_valid),
        ups_hist=roll_rows(state.ups_hist, ups_in[:, 2:], n_valid))
    return mu, valid2, new


# --------------------------------------------------------------------------
# estimator chunk (one euler step)
# --------------------------------------------------------------------------

def _est_bias(pos2, n_valid2, N, R, anchor2, C, left, dtype):
    """[B2, N, R+N] additive for the chunk estimator: keys are the R cached
    rows (absolute pos2-R+j) then the N new rows (absolute pos2+j)."""
    B2 = pos2.shape[0]
    qa = pos2[:, None] + jnp.arange(N)[None, :]
    ka_cache = pos2[:, None] - R + jnp.arange(R)[None, :]
    ka_new = pos2[:, None] + jnp.arange(N)[None, :]
    ka = jnp.concatenate([ka_cache, ka_new], axis=1)        # [B2, R+N]
    valid_k = jnp.concatenate(
        [ka_cache >= 0,
         jnp.arange(N)[None, :] < n_valid2[:, None]], axis=1)
    cq = anchored_chunk_ids(qa, anchor2[:, None], C)
    ck = anchored_chunk_ids(ka, anchor2[:, None], C)
    keep = (ck[:, None, :] <= cq[:, :, None]) \
        & (ck[:, None, :] >= cq[:, :, None] - left) \
        & valid_k[:, None, :]
    return jnp.where(keep, 0.0, NEG_INF).astype(dtype)


def estimator_step(est, x, mu, t_emb, spks, cond, mask, bias, kv_s, conv_s):
    """One euler step's estimator forward over N new rows (2B batch).
    est = ConditionalDecoder (bound, stream cfg, single level).  kv_s
    [L_est, 2B, R, 2, inner]; conv_s dict name -> [2B, 2, C_in]; bias
    [2B, N, R+N].  Returns (v [2B, N, 80], new kv rows [L_est, 2B, N, 2,
    inner], new conv input rows dict)."""
    cfg = est.cfg
    cdt = jnp.dtype(cfg.dtype)
    x, mu, spks, cond, mask = (v.astype(cdt)
                               for v in (x, mu, spks, cond, mask))
    bias = bias.astype(cdt)
    N = x.shape[1]
    spks_b = jnp.broadcast_to(spks[:, None, :],
                              (x.shape[0], N, spks.shape[-1]))
    h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)

    kv_new = []
    conv_new = {}
    li = 0

    def resnet_chunk(res, h, key1, key2):
        nonlocal conv_new
        hh, x1, x2 = res.chunk(h, mask, t_emb, conv_s[key1].astype(cdt),
                               conv_s[key2].astype(cdt))
        conv_new[key1] = x1
        conv_new[key2] = x2
        return hh

    def tbs_chunk(tbs, h):
        nonlocal li
        for tb in tbs:
            h, kn, vn = tb.chunk(h, kv_s[li].astype(cdt), bias)
            kv_new.append(jnp.stack([kn, vn], axis=2))
            li += 1
        return h

    h = resnet_chunk(est.down_resnets[0], h, "d0b1", "d0b2")
    h = tbs_chunk(est.down_tbs[0], h)
    skip = h
    h, ds_in = _conv_hist_chunk(est.downsamples[0], h, mask,
                                conv_s["ds0"].astype(cdt))
    conv_new["ds0"] = ds_in
    for i in range(cfg.num_mid_blocks):
        h = resnet_chunk(est.mid_resnets[i], h, f"m{i}b1", f"m{i}b2")
        h = tbs_chunk(est.mid_tbs[i], h)
    h = jnp.concatenate([h, skip], axis=-1)
    h = resnet_chunk(est.up_resnets[0], h, "u0b1", "u0b2")
    h = tbs_chunk(est.up_tbs[0], h)
    h, us_in = _conv_hist_chunk(est.upsamples[0], h, mask,
                                conv_s["us0"].astype(cdt))
    conv_new["us0"] = us_in
    h, fb_in = est.final_block.chunk(h, mask, conv_s["fb"].astype(cdt))
    conv_new["fb"] = fb_in
    out = est.final_proj(h * mask[..., None])
    return ((out * mask[..., None]).astype(jnp.float32),
            jnp.stack(kv_new), conv_new)


# --------------------------------------------------------------------------
# whole-chunk CFM + orchestration
# --------------------------------------------------------------------------

def flow_chunk(mdl, tokens, ctx_tokens, prompt_feat, prompt_feat_len,
               embedding, n_valid, ctx_len, state: FlowChunkState, noise,
               first: bool = False, ragged_tail: bool = True):
    """Process one chunk for B streams.  mdl = CausalMaskedDiffWithXvec
    (stream config, finite left_chunks); call via
    `flow.apply(params, ..., method=flow_chunk)`.

    tokens [B, M]: chunk 0 carries [prompt ++ first-hop gen]; later chunks
    gen only.  rows >= n_valid[b] are pad.  ctx_tokens [B, la] = the next
    chunk's first tokens (real lookahead) with per-row counts ctx_len [B]
    (0 = that row's stream ends at this chunk — its lookahead becomes the
    one-shot zero pad, so mixed mid-stream/final rows share one program).
    prompt_feat [B, P, 80] + prompt_feat_len [B] only on first=True chunks
    (conditioning rows; the caller must also have set state.anchor to the
    per-row prompt TOKEN length before the first call).  noise [B, 2M, 80]:
    the pinned CFM noise rows at each row's ABSOLUTE mel positions (caller
    slices the buffer at state.tok_pos * ratio).

    Returns (mel [B, 2M, 80] — generated rows are [2*anchor (first) or 0 :
    2*n_valid], rows beyond are zero —, new_state).

    ragged_tail=False is the steady-state fast path: every row's n_valid is
    either N (full chunk) or 0 (disabled slot), so the cache rolls become a
    static slice + per-row select instead of per-row concat+gather — the
    engine passes it for non-final groups (final groups have RAS-drifted
    ragged lengths and keep the general roll)."""
    cfm = mdl.decoder
    est = cfm.estimator
    ecfg = est.cfg
    ratio = mdl.cfg.token_mel_ratio
    assert ratio == 2, "up_stride/token_mel_ratio 2"
    B, M = tokens.shape
    N = ratio * M

    mu, valid2, enc_new = encoder_chunk(mdl, tokens, ctx_tokens, ctx_len,
                                        n_valid, state)

    spks = embedding / jnp.linalg.norm(embedding, axis=-1,
                                       keepdims=True).clip(1e-12)
    spks = mdl.spk_embed_affine_layer(spks)

    cond = jnp.zeros((B, N, mdl.cfg.output_size), mu.dtype)
    if first:
        P = prompt_feat.shape[1]
        cond = cond.at[:, :P].set(prompt_feat)
        keep = jnp.arange(N)[None, :] < prompt_feat_len[:, None]
        cond = jnp.where(keep[..., None], cond, 0.0)

    # CFG 2B layout: rows [0, B) conditioned, [B, 2B) unconditioned —
    # identical math to solve_euler's concat trick
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([valid2, valid2], axis=0).astype(mu.dtype)
    pos2 = jnp.tile(ratio * state.tok_pos, 2)
    nv2 = jnp.tile(ratio * n_valid, 2)
    anchor2 = jnp.tile(ratio * state.anchor, 2)
    R = state.est_kv.shape[3]
    cdt = jnp.dtype(ecfg.dtype)
    bias2 = _est_bias(pos2, nv2, N, R, anchor2, ecfg.static_chunk_size,
                      ecfg.left_chunks, cdt)

    from cosyvoice_tpu.models.flow import cosine_t_span
    t_span = cosine_t_span(cfm.cfg.n_timesteps, mu.dtype)
    ts, dts = t_span[:-1], t_span[1:] - t_span[:-1]
    r = cfm.cfg.inference_cfg_rate
    x = noise.astype(mu.dtype) * valid2[..., None]

    static_roll = not ragged_tail and N >= R
    full = (nv2 == N)

    def step(mdl_, x, scan_in):
        t, dt, kv_s, conv_s = scan_in
        est_ = mdl_.decoder.estimator   # re-bound under the lifted scan
        t_emb = est_.time_embed(jnp.full((2 * B,), t, mu.dtype), cdt)
        x2 = jnp.concatenate([x, x], axis=0)
        v, kv_rows, conv_rows = estimator_step(
            est_, x2, mu2, t_emb, spks2, cond2, mask2, bias2, kv_s, conv_s)
        dphi = (1.0 + r) * v[:B] - r * v[B:]
        if static_roll:
            kv_s = jnp.where(full[None, :, None, None, None],
                             kv_rows[:, :, N - R:].astype(kv_s.dtype), kv_s)
            conv_s = {k: jnp.where(full[:, None, None],
                                   conv_rows[k][:, N: N + 2
                                                ].astype(conv_s[k].dtype),
                                   conv_s[k]) for k in conv_s}
        else:
            kv_s = jax.vmap(roll_rows, in_axes=(0, 0, None))(
                kv_s, kv_rows.astype(kv_s.dtype), nv2)
            # conv histories: the returned rows already carry the old
            # history prepended ([2 hist ++ N new]) — last 2 valid directly
            conv_s = {k: tail_rows(conv_rows[k].astype(conv_s[k].dtype),
                                   nv2, 2) for k in conv_s}
        return x + dt * dphi, (kv_s, conv_s)

    scan = nn.scan(step, variable_broadcast="params",
                   split_rngs={"params": False}, in_axes=0, out_axes=0)
    mel, (est_kv, est_conv) = scan(mdl, x, (ts, dts, state.est_kv,
                                            state.est_conv))

    new_state = state._replace(
        tok_pos=state.tok_pos + n_valid, est_kv=est_kv, est_conv=est_conv,
        **enc_new)
    return mel * valid2[..., None], new_state
