"""TPU perf probe: continuous-batching engine vs static-batch decode.

Validates that the per-row-pos fused decode kernel compiles and runs on real
TPU hardware, and measures:
  * steady-state engine decode ms/token at S slots (per-row frontiers)
  * static lm_generate ms/token at the same batch (scalar frontier)
  * continuous vs static full-generation throughput under staggered lengths
    (the continuous win: slots recycle the moment a sequence finishes)

Run: python tools/probe_engine.py [slots] (full-size Qwen2-0.5B body,
zeros bf16 params — decode cost is weight-independent).
"""
import sys
import time

import numpy as np

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, SamplingConfig, lm_generate
from cosyvoice_tpu.runtime.engine import (GenRequest, ServingEngine,
                                          engine_decode_segment, engine_init)
from cosyvoice_tpu.utils.dtype import to_bf16


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} slots={S}", flush=True)
    cfg = LMConfig(sampling=SamplingConfig(method="ras"))
    if on_tpu:
        cfg = dataclasses.replace(cfg, qwen=dataclasses.replace(
            cfg.qwen, fused_cache_update=True))
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.integers(0, 1000, (1, 25)))
    p1 = jnp.asarray(rng.integers(0, 6561, (1, 50)))
    k = jax.random.PRNGKey(0)
    params = to_bf16(jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: model.init(k, t1, jnp.asarray([25]), p1,
                                          jnp.asarray([50])))))

    # --- engine steady state: admit S requests, time decode segments
    N = 500
    eng = ServingEngine(model, params, num_slots=S, cache_len=1024, max_out=N,
                        segment_steps=50)
    state = engine_init(model, S, 1024, N, jax.random.PRNGKey(0),
                        jax.tree.leaves(params)[0].dtype)
    # manual admit of S rows (reuse engine's jitted program)
    from cosyvoice_tpu.runtime.engine import engine_admit
    text = rng.integers(0, 1000, 25).astype(np.int32)
    psp = rng.integers(0, 6561, 50).astype(np.int32)
    for s in range(S):
        state = engine_admit(model, params, state, jnp.asarray(s, jnp.int32),
                             jnp.asarray(np.pad(text, (0, 7))), jnp.asarray(25),
                             jnp.asarray(np.pad(psp, (0, 14))), jnp.asarray(50),
                             jnp.asarray(N, jnp.int32), jnp.asarray(N, jnp.int32))
    state = engine_decode_segment(model, params, state, 50)  # compile
    jax.block_until_ready(state.out)
    t0 = time.time()
    reps, steps = 4, 50
    for _ in range(reps):
        state = engine_decode_segment(model, params, state, steps)
    float(jnp.sum(state.count))  # forced device->host read
    dt = (time.time() - t0) / (reps * steps)
    print(f"engine per-row decode: {dt * 1e3:.2f} ms/step at S={S} "
          f"({S / dt:.0f} tok/s)", flush=True)

    # --- static batch baseline (scalar frontier, same shapes)
    textB = jnp.tile(t1, (S, 1))
    pspB = jnp.tile(p1, (S, 1))
    n = jnp.full((S,), N)
    out, cnt = lm_generate(model, params, textB, jnp.full((S,), 25), pspB,
                           jnp.full((S,), 50), n, n, jax.random.PRNGKey(0),
                           max_steps=N, cache_len=1024)
    jax.block_until_ready(out)
    t0 = time.time()
    out, cnt = lm_generate(model, params, textB, jnp.full((S,), 25), pspB,
                           jnp.full((S,), 50), n, n, jax.random.PRNGKey(1),
                           max_steps=N, cache_len=1024)
    float(jnp.sum(cnt))
    dt2 = (time.time() - t0) / N
    print(f"static lm_generate:    {dt2 * 1e3:.2f} ms/step at B={S} "
          f"({S / dt2:.0f} tok/s)", flush=True)

    # --- continuous vs static under staggered lengths (recycling win)
    lens = [100 + (i * 67) % 400 for i in range(2 * S)]
    reqs = [GenRequest(text=text, prompt_speech=psp, min_len=L, max_len=L)
            for L in lens]
    t0 = time.time()
    res = eng.generate(reqs, rng=jax.random.PRNGKey(2))
    dt3 = time.time() - t0
    total = sum(len(r) for r in res)
    print(f"continuous: {total} tokens over {len(reqs)} staggered reqs in "
          f"{dt3:.1f}s -> {total / dt3:.0f} tok/s", flush=True)
    # static comparison: same requests in 2 lockstep batches of S, every row
    # padded to the batch max length
    t0 = time.time()
    done_tokens = 0
    for half in (lens[:S], lens[S:]):
        mx = jnp.asarray(half)
        out, cnt = lm_generate(model, params, textB, jnp.full((S,), 25), pspB,
                               jnp.full((S,), 50), mx, mx,
                               jax.random.PRNGKey(3), max_steps=max(half),
                               cache_len=1024)
        done_tokens += int(jnp.sum(cnt))
    dt4 = time.time() - t0
    print(f"static 2x lockstep batches: {done_tokens} tokens in {dt4:.1f}s "
          f"-> {done_tokens / dt4:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
