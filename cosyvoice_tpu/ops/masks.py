"""Attention / padding mask construction (static-shape, jit-friendly).

Behavioral spec: reference `cosyvoice/utils/mask.py` (make_pad_mask:203,
subsequent_chunk_mask:91, add_optional_chunk_mask:127) and
`cosyvoice/utils/common.py:167` (mask_to_bias).  Everything here is expressed
with broadcasted iota so it lowers to pure vector ops on TPU — no Python loops,
no data-dependent shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite "minus infinity" — safer than -inf under bf16 softmax


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] lengths -> [B, max_len] bool, True at PADDED positions.

    Mirrors reference `utils/mask.py:203-229` (True == pad).  `max_len` must be
    static under jit.
    """
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] lengths -> [B, max_len] bool, True at VALID positions."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size: int) -> jax.Array:
    """[size, size] bool lower-triangular causal mask (True == attend)."""
    r = jnp.arange(size)
    return r[None, :] <= r[:, None]


def subsequent_chunk_mask(size: int, chunk_size: int, num_left_chunks: int = -1) -> jax.Array:
    """Chunk-causal attention mask [size, size] (True == attend).

    Position i attends to [start, (i//chunk + 1) * chunk) where start is 0
    (num_left_chunks < 0) or (i//chunk - L) * chunk.  Mirrors reference
    `utils/mask.py:91-124`.  chunk_size may be a traced scalar.
    """
    q = jnp.arange(size)[:, None]
    k = jnp.arange(size)[None, :]
    q_chunk = q // chunk_size
    end = (q_chunk + 1) * chunk_size
    if isinstance(num_left_chunks, int) and num_left_chunks < 0:
        start = jnp.zeros_like(end)
    else:
        start = jnp.maximum((q_chunk - num_left_chunks) * chunk_size, 0)
    return (k >= start) & (k < end)


def add_chunk_mask(
    pad_mask: jax.Array,
    static_chunk_size: int = 0,
    chunk_size: jax.Array | int | None = None,
    num_left_chunks: int = -1,
) -> jax.Array:
    """Combine a [B, 1, T] (or [B, T]) key pad mask with a chunk-causal mask.

    Training-time *dynamic* chunk selection (reference
    `utils/mask.py:127-201`: chunk ~ U[1,25] or full) is done by the caller
    sampling `chunk_size` with jax.random and passing it in — keeping this
    function pure.  Returns [B, T, T] bool.
    """
    if pad_mask.ndim == 2:
        pad_mask = pad_mask[:, None, :]
    T = pad_mask.shape[-1]
    if chunk_size is not None:
        cm = subsequent_chunk_mask(T, chunk_size, num_left_chunks)
    elif static_chunk_size and static_chunk_size > 0:
        cm = subsequent_chunk_mask(T, static_chunk_size, num_left_chunks)
    else:
        return pad_mask & jnp.ones((T, T), dtype=bool)[None]
    return pad_mask & cm[None]


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool attend-mask -> additive bias (0 where attend, NEG_INF where not)."""
    return jnp.where(mask, jnp.zeros((), dtype), jnp.asarray(NEG_INF, dtype))


def anchored_chunk_ids(pos: jax.Array, anchor: jax.Array,
                       chunk_size: int) -> jax.Array:
    """Chunk index of absolute position(s) `pos` on a grid ANCHORED at
    `anchor` (the prompt/generation boundary): the whole prompt region
    [0, anchor) is chunk 0, then one chunk per `chunk_size` positions.

    Incremental streaming flow (models/flow_chunk.py) emits generated rows
    in hop-sized chunks that are multiples of chunk_size, so anchoring the
    grid at the boundary makes every serving chunk end exactly on a grid
    boundary for ANY prompt length — the property that lets cached K/V
    reproduce the one-shot chunk-masked computation exactly.  `anchor`
    broadcasts ([B] or scalar).
    """
    rel = pos - anchor
    return jnp.where(rel < 0, 0, rel // chunk_size + 1)


def anchored_chunk_mask(pad_mask: jax.Array, chunk_size: int,
                        anchor: jax.Array,
                        num_left_chunks: int = -1) -> jax.Array:
    """Chunk-causal mask on the anchored grid (see anchored_chunk_ids),
    combined with a [B, T] (or [B, 1, T]) key pad mask.  Returns [B, T, T]
    bool.  num_left_chunks >= 0 bounds the visible left context (the finite
    per-chunk cache window of incremental streaming flow)."""
    if pad_mask.ndim == 2:
        pad_mask = pad_mask[:, None, :]
    T = pad_mask.shape[-1]
    pos = jnp.arange(T)
    anchor = jnp.asarray(anchor)
    if anchor.ndim == 0:
        anchor = anchor[None]
    cid = anchored_chunk_ids(pos[None, :], anchor[:, None], chunk_size)
    ok = cid[:, None, :] <= cid[:, :, None]
    if num_left_chunks >= 0:
        ok = ok & (cid[:, None, :] >= cid[:, :, None] - num_left_chunks)
    return pad_mask & ok
