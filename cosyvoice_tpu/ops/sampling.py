"""On-device token sampling: nucleus / top-k / repetition-aware (RAS).

Behavioral spec: reference `cosyvoice/utils/common.py:109-146`
(ras_sampling / non_random_ras_sampling / nucleus_sampling / random_sampling).
The reference runs these per-token on host with Python sorts; here they are
fully vectorized jit-able JAX so they live inside the `lax.while_loop` decode
step (no host round-trip per token).

Semantics of the reference nucleus sampler (`common.py:126-141`): sort probs
descending (stable), keep element i iff (cumsum of probs BEFORE i) < top_p AND
i < top_k (so the arg-max is always kept), renormalize, sample.
RAS (`common.py:109-114`): after a nucleus draw, if the drawn id appeared
>= win_size*tau_r times in the last `win_size` decoded tokens, redraw from the
FULL softmax (v1) or from an expanded nucleus (top_p+0.15, top_k*2) for the
"non_random" variant used by the phoneme recipes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def nucleus_mask(sorted_probs: jax.Array, top_p: float, top_k: int) -> jax.Array:
    """Keep-mask over DESC-sorted probs, reference-exact keep rule."""
    excl_cumsum = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs
    ranks = jnp.arange(sorted_probs.shape[-1])
    return (excl_cumsum < top_p) & (ranks < top_k)


def nucleus_sample(rng: jax.Array, logits: jax.Array, top_p: float = 0.8,
                   top_k: int = 25) -> jax.Array:
    """Sample one id from logits [..., V] via top-p/top-k nucleus. Returns [...]."""
    probs = jax.nn.softmax(logits, axis=-1)
    # Sorting the full vocab is wasteful; top_k is small, so take top-(top_k)
    # first (MXU/VPU-friendly) and nucleus-filter within it.
    k = min(int(top_k), logits.shape[-1])
    top_probs, top_idx = jax.lax.top_k(probs, k)
    keep = nucleus_mask(top_probs, top_p, top_k)
    masked_logp = jnp.where(keep, jnp.log(jnp.maximum(top_probs, 1e-38)), -1e9)
    choice = jax.random.categorical(rng, masked_logp, axis=-1)
    return jnp.take_along_axis(top_idx, choice[..., None], axis=-1)[..., 0]


def random_sample(rng: jax.Array, logits: jax.Array) -> jax.Array:
    """Sample from the full softmax (reference random_sampling)."""
    return jax.random.categorical(rng, logits, axis=-1)


def _rep_count(token: jax.Array, recent: jax.Array, valid: jax.Array) -> jax.Array:
    """#occurrences of `token` in `recent` [..., W] where `valid` is True."""
    return jnp.sum((recent == token[..., None]) & valid, axis=-1)


@partial(jax.jit, static_argnames=("top_p", "top_k", "win_size", "tau_r"))
def ras_sample(rng: jax.Array, logits: jax.Array, recent: jax.Array,
               recent_valid: jax.Array, top_p: float = 0.8, top_k: int = 25,
               win_size: int = 10, tau_r: float = 0.1) -> jax.Array:
    """Repetition-aware sampling (VALL-E 2 style), reference `common.py:109`.

    recent: [..., win_size] last decoded ids; recent_valid: matching bool mask
    (False before win_size tokens exist).  Both draws are computed and selected
    with `where` — branchless, TPU-friendly.
    """
    r1, r2 = jax.random.split(rng)
    cand = nucleus_sample(r1, logits, top_p, top_k)
    reps = _rep_count(cand, recent, recent_valid)
    fallback = random_sample(r2, logits)
    return jnp.where(reps >= win_size * tau_r, fallback, cand)


@partial(jax.jit, static_argnames=("top_p", "top_k", "win_size", "tau_r", "expand_scale"))
def non_random_ras_sample(rng: jax.Array, logits: jax.Array, recent: jax.Array,
                          recent_valid: jax.Array, top_p: float = 0.8,
                          top_k: int = 25, win_size: int = 10, tau_r: float = 0.1,
                          expand_scale: int = 2) -> jax.Array:
    """RAS variant resampling from an expanded nucleus (`common.py:116-123`)."""
    r1, r2 = jax.random.split(rng)
    cand = nucleus_sample(r1, logits, top_p, top_k)
    reps = _rep_count(cand, recent, recent_valid)
    fallback = nucleus_sample(r2, logits, top_p + 0.15, top_k * expand_scale)
    return jnp.where(reps >= win_size * tau_r, fallback, cand)


def greedy_sample(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1)
