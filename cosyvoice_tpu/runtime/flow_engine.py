"""Slot-based incremental flow engine for continuous streaming serving.

Companion to the LM slot engine (runtime/engine.py): `FlowSlotEngine` keeps
one `FlowChunkState` (models/flow_chunk.py) for `num_slots` concurrent
streams DEVICE-RESIDENT, and advances any enabled subset of slots by one
token chunk per jitted call — computing each mel row exactly once (cached
encoder K/V + per-euler-step estimator K/V), instead of the windowed path's
re-run of the whole prompt+context window per chunk (r4 VERDICT #2: that
rework is most of the 76x-vs-161x continuous-engine gap).

Disabled slots ride along with n_valid = 0: their cache rolls shift by zero
and their outputs are discarded, so one compiled program per chunk bucket
serves every group composition (the same churn-avoidance rationale as the
pow2 group padding it replaces).  Slot admission is a cheap jitted reset of
the small per-slot state (conv histories, frontiers, anchors); the big K/V
caches need no clearing — stale rows sit beyond each slot's frontier or
below its left-context window and are masked by construction.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models import flow_chunk as FC


@partial(jax.jit, static_argnames=("model", "first", "ragged"),
         donate_argnames=("state",))
def flow_slots_chunk(model, params, state: FC.FlowChunkState, tokens, ctx,
                     ctx_len, n_valid, pfeat, pfl, emb, noise_buf,
                     first: bool, ragged: bool = True):
    """Advance slots by one chunk.  tokens [S, M] (row b pad past
    n_valid[b]; n_valid 0 = slot disabled this call), ctx [S, la] +
    ctx_len [S], pfeat [S, P, 80] + pfl [S] (first=True groups only), emb
    [S, spk], noise_buf [1, F, 80] pinned CFM noise.  Returns
    (mel [S, ratio*M, 80], new state)."""
    ratio = model.cfg.token_mel_ratio
    M = tokens.shape[1]
    C = noise_buf.shape[-1]
    z = jax.vmap(lambda p: jax.lax.dynamic_slice(
        noise_buf[0], (p, 0), (ratio * M, C)))(ratio * state.tok_pos)
    return model.apply(params, tokens, ctx, pfeat, pfl, emb, n_valid,
                       ctx_len, state, z, first=first, ragged_tail=ragged,
                       method=FC.flow_chunk)


@partial(jax.jit, donate_argnames=("state",))
def flow_slots_reset(state: FC.FlowChunkState, keep, anchor
                     ) -> FC.FlowChunkState:
    """Re-arm the slots where keep[b] is False for a fresh stream with
    prompt token count anchor[b].  Only the SMALL state needs clearing
    (conv histories must read as the one-shot zero left-pad, frontiers and
    anchors restart); the big K/V caches stay — rows beyond a slot's
    frontier or left window are masked by construction, and the first
    chunk's writes overwrite the live region."""
    keep2 = jnp.concatenate([keep, keep])

    def z(x, k):
        return jnp.where(k.reshape((-1,) + (1,) * (x.ndim - 1)), x, 0)

    return state._replace(
        pre_hist=z(state.pre_hist, keep),
        ups_hist=z(state.ups_hist, keep),
        est_conv={k: jax.vmap(z, in_axes=(0, None))(v, keep2)
                  for k, v in state.est_conv.items()},
        tok_pos=jnp.where(keep, state.tok_pos, 0),
        anchor=jnp.where(keep, state.anchor, anchor))


class FlowSlotEngine:
    """Host wrapper: owns the device state + slot allocation."""

    def __init__(self, model, params, num_slots: int, tok_cap: int,
                 noise_buf: np.ndarray, spk_dim: int,
                 enc_dtype=jnp.float32, est_dtype=None):
        est = model.cfg.estimator
        assert est.stream and est.left_chunks >= 0, (
            "incremental flow serving needs a stream-config flow model with "
            "finite estimator.left_chunks (got stream=%s left_chunks=%d)"
            % (est.stream, est.left_chunks))
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.tok_cap = tok_cap
        self.noise_buf = jnp.asarray(noise_buf)
        self.state = FC.init_state(model.cfg, num_slots, tok_cap,
                                   dtype=enc_dtype, est_dtype=est_dtype)
        self.free = list(range(num_slots))[::-1]
        self.emb = np.zeros((num_slots, spk_dim), np.float32)
        self.anchors = np.zeros(num_slots, np.int32)

    def admit(self, prompt_len: int, embedding: np.ndarray) -> int:
        """Claim a slot for a new stream (prompt_len TOKENS anchors its
        chunk grid).  The reset rides the next jitted call."""
        slot = self.free.pop()
        keep = np.ones(self.num_slots, bool)
        keep[slot] = False
        anchor = np.zeros(self.num_slots, np.int32)
        anchor[slot] = prompt_len
        self.state = flow_slots_reset(self.state, jnp.asarray(keep),
                                      jnp.asarray(anchor))
        self.emb[slot] = embedding
        self.anchors[slot] = prompt_len
        return slot

    def release(self, slot: int) -> None:
        self.free.append(slot)

    def chunk(self, slots, tokens, ctx, ctx_len, n_valid, first: bool,
              pfeat: Optional[np.ndarray] = None,
              pfl: Optional[np.ndarray] = None, ragged: bool = True):
        """Advance the given slots (host lists/arrays, one entry per JOB)
        and return the device mel [num_slots, ratio*M, 80] — callers index
        rows by slot id.  tokens [K, M] etc. are scattered to the full slot
        axis here; disabled slots run masked."""
        S, M = self.num_slots, tokens.shape[1]
        la = ctx.shape[1]
        tok_f = np.zeros((S, M), np.int32)
        ctx_f = np.zeros((S, la), np.int32)
        cl_f = np.zeros(S, np.int32)
        nv_f = np.zeros(S, np.int32)
        for i, s in enumerate(slots):
            tok_f[s] = tokens[i]
            ctx_f[s] = ctx[i]
            cl_f[s] = ctx_len[i]
            nv_f[s] = n_valid[i]
        if first:
            P = pfeat.shape[1]
            pf_f = np.zeros((S, P, pfeat.shape[2]), np.float32)
            pfl_f = np.zeros(S, np.int32)
            for i, s in enumerate(slots):
                pf_f[s] = pfeat[i]
                pfl_f[s] = pfl[i]
        else:
            pf_f = np.zeros((S, 1, self.model.cfg.output_size), np.float32)
            pfl_f = np.zeros(S, np.int32)
        mel, self.state = flow_slots_chunk(
            self.model, self.params, self.state, jnp.asarray(tok_f),
            jnp.asarray(ctx_f), jnp.asarray(cl_f), jnp.asarray(nv_f),
            jnp.asarray(pf_f), jnp.asarray(pfl_f), jnp.asarray(self.emb),
            self.noise_buf, first, ragged)
        return mel
