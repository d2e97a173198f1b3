"""TPU sweep: LLM train-step config (batch size / packing / remat).

Packing to 2048-token rows raised tokens/step 5x but measured WORSE MFU
(7% vs 18%): block-diagonal attention still computes the full quadratic
[rows, H, N, N] score tile, so N=2048 multiplies attention FLOPs by ~4x
per token and remat recomputes it again in backward.  This sweep times the
candidate configs at the bench's utterance distribution and records the
winner for bench.py's training section.

Usage: python tools/probe_train_cfg.py
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cosyvoice_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import optax

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.train.packing import pack_llm_examples, packed_llm_loss_fn
from cosyvoice_tpu.train.step import (llm_loss_fn, make_train_state,
                                      make_train_step)
from cosyvoice_tpu.utils.dtype import to_bf16

rng = np.random.default_rng(0)
lm_cfg = LMConfig()
PEAK = 610e12


def build(remat, policy="scores"):
    cfg = dataclasses.replace(
        lm_cfg, qwen=dataclasses.replace(lm_cfg.qwen, remat=remat,
                                         remat_policy=policy))
    return Qwen2LM(cfg)


def rand_params(model):
    t = jnp.asarray(rng.integers(0, 1000, (1, 8)))
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), t, jnp.asarray([8]), t % 6561,
        jnp.asarray([8])))
    prng = np.random.default_rng(7)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    out = [jnp.asarray((prng.standard_normal(s.shape) * 0.02).astype(np.float32))
           for s in leaves]
    return to_bf16(jax.tree_util.tree_unflatten(treedef, out))


tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-4))


def run_steps(step_fn, st, batch, n=4):
    t0 = time.time()
    for i in range(n):
        st, m = step_fn(st, batch, jax.random.PRNGKey(i))
    float(m["loss"])
    return (time.time() - t0) / n


def bench_unpacked(bs, seq_t, seq_s, remat, policy="scores"):
    model = build(remat, policy)
    params = rand_params(model)
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    batch = {"text_token": jnp.asarray(rng.integers(0, 1000, (bs, seq_t))),
             "text_token_len": jnp.full((bs,), seq_t, jnp.int32),
             "speech_token": jnp.asarray(rng.integers(0, 6561, (bs, seq_s))),
             "speech_token_len": jnp.full((bs,), seq_s, jnp.int32)}
    step = make_train_step(llm_loss_fn(model), tx, donate=False)
    st = make_train_state(params, tx)
    try:
        run_steps(step, st, batch, n=1)
        dt = run_steps(step, st, batch)
    except Exception as e:
        print(f"unpacked bs{bs} remat={remat}: FAILED {str(e)[:120]}",
              flush=True)
        return
    toks = bs * (seq_t + seq_s + 2)
    mfu = 6.0 * n_par * toks / dt / PEAK
    print(f"unpacked bs{bs} seq{seq_t}+{seq_s} remat={int(remat)}: "
          f"{dt*1e3:6.0f} ms  {toks/dt:8.0f} tok/s  MFU {mfu*100:4.1f}%",
          flush=True)


def bench_packed(row, n_ex, remat, policy="scores"):
    model = build(remat, policy)
    params = rand_params(model)
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    exs = [(rng.integers(0, 1000, int(rng.integers(10, 60))),
            rng.integers(0, 6561, int(rng.integers(60, 440))))
           for _ in range(n_ex)]
    packed = pack_llm_examples(exs, row_len=row, eos_token=6561 + 2)
    batch = {k: jnp.asarray(v) for k, v in packed.items() if k != "n_tokens"}
    step = make_train_step(packed_llm_loss_fn(model), tx, donate=False)
    st = make_train_state(params, tx)
    try:
        run_steps(step, st, batch, n=1)
        dt = run_steps(step, st, batch)
    except Exception as e:
        print(f"packed row{row} remat={remat}: FAILED {str(e)[:120]}",
              flush=True)
        return
    toks = packed["n_tokens"]
    mfu = 6.0 * n_par * toks / dt / PEAK
    print(f"packed {packed['ids'].shape[0]}x{row} ({toks} tok) remat="
          f"{int(remat)}: {dt*1e3:6.0f} ms  {toks/dt:8.0f} tok/s  "
          f"MFU {mfu*100:4.1f}%", flush=True)


CONFIGS = {
    "u8": lambda: bench_unpacked(8, 64, 384, False),
    "u16": lambda: bench_unpacked(16, 64, 384, False),
    "u16a": lambda: bench_unpacked(16, 64, 384, True, "all"),
    "u32a": lambda: bench_unpacked(32, 64, 384, True, "all"),
    "u16s": lambda: bench_unpacked(16, 64, 384, True, "scores"),
    "u32s": lambda: bench_unpacked(32, 64, 384, True, "scores"),
    "u64s": lambda: bench_unpacked(64, 64, 384, True, "scores"),
    "p1024s": lambda: bench_packed(1024, 64, True, "scores"),
    "p2048s": lambda: bench_packed(2048, 64, True, "scores"),
}

if __name__ == "__main__":
    # one config per PROCESS: an OOM'd execution leaves HBM exhausted for
    # the rest of the client session on this backend
    if len(sys.argv) > 1 and sys.argv[1] in CONFIGS:
        CONFIGS[sys.argv[1]]()
    else:
        import subprocess
        for name in CONFIGS:
            subprocess.run([sys.executable, __file__, name])
