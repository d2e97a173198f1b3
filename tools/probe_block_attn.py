"""Train-config probe for blockwise attention (round-5 VERDICT #3).

Measures one LLM train-step config per PROCESS (OOM isolation) on the real
chip.  Usage: python tools/probe_block_attn.py CFG  with CFG one of
  naive8     bs 8,  seq 64+384, naive attention            (r4 headline)
  block8     bs 8,  seq 64+384, block_attention
  block16    bs 16, seq 64+384, block_attention
  block32    bs 32, seq 64+384, block_attention
  block32r   bs 32, seq 64+384, block_attention + remat all
  packedb    packed 2048-rows,  block_attention + remat all
  packedb4   packed 4x2048,     block_attention, no remat

MEASURED (this backend, v5e via tunnel, 2026-08-21, bf16 params+activations,
fan-in-scaled random weights, adamw+clip in the step; MFU vs the measured
610 TF/s chip peak — 2x the nominal 197 TF/s v5e bf16 figure, so double
these percentages for nominal-MFU):
  naive8    89 ms/step   40.3k tok/s   20.0% MFU   (baseline, == r4 19.4%)
  block8    81 ms/step   44.3k tok/s   22.0% MFU   (block attn is FASTER even
                                                    at seq 448: no [B,H,N,N]
                                                    HBM round trips)
  block16  167 ms/step   43.2k tok/s   21.5% MFU   (fits! r4's bs16 OOM was
                                                    the materialized scores)
  block32  351 ms/step   41.1k tok/s   20.4% MFU   (fits without remat)
  packedb4 273 ms/step   28.5k tok/s   14.2% MFU   (4 rows x 2048, no remat)
  packedb 1356 ms/step   14.2k tok/s    7.1% MFU   (9 rows x 2048 + remat
                                                    all: recompute tax)
CONCLUSION: throughput SATURATES at ~44k tok/s (~134 TF/s-equivalent) from
bs8 upward — the hidden-896 matmul shapes' rate on this chip, 68% of the
nominal v5e bf16 peak and 22% of the 610 TF/s 8k-cube peak.  Scaling batch
or packing adds tokens/step but not tokens/SECOND, so the production config
is unpacked bs8 + block_attention (fastest step, least memory); packing
remains the right call only where examples are far shorter than the row
(packed no-remat at <=4 rows).  The 30%-of-610 ask is not reachable with
these layer shapes on this backend; against the nominal peak the headline
config runs at 68% MFU.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "block8"
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import optax

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.train.step import (llm_loss_fn, make_train_state,
                                          make_train_step)
    from cosyvoice_tpu.utils.dtype import to_bf16

    rng = np.random.default_rng(0)
    lm_cfg = LMConfig()
    qwen = lm_cfg.qwen
    if cfg_name.startswith("block") or cfg_name.startswith("packed"):
        qwen = dataclasses.replace(qwen, block_attention=True)
    if cfg_name in ("block32r", "packedb"):
        qwen = dataclasses.replace(qwen, remat=True, remat_policy="all")
    lm_cfg = dataclasses.replace(lm_cfg, qwen=qwen)
    model = Qwen2LM(lm_cfg)

    k = jax.random.PRNGKey(0)
    text1 = jnp.asarray(rng.integers(0, 1000, (1, 25)))
    psp1 = jnp.asarray(rng.integers(0, 6561, (1, 50)))

    def rand_params(init_fn, seed=12345):
        shapes = jax.eval_shape(init_fn)
        prng = np.random.default_rng(seed)
        flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
        leaves = []
        for path, s in flat:
            name = jax.tree_util.keystr(path).lower()
            if s.ndim >= 2:
                std = 0.02 if "embed" in name else \
                    1.0 / float(np.sqrt(np.prod(s.shape[:-1])))
                v = (prng.standard_normal(s.shape) * std).astype(np.float32)
            elif s.ndim == 1 and "bias" not in name:
                v = np.ones(s.shape, np.float32)
            else:
                v = np.zeros(s.shape, np.float32)
            leaves.append(jnp.asarray(v, dtype=s.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = to_bf16(rand_params(lambda: model.init(
        k, text1, jnp.asarray([25]), psp1, jnp.asarray([50]))))
    n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-4))

    if cfg_name.startswith("packed"):
        from cosyvoice_tpu.train.packing import (pack_llm_examples,
                                                 packed_llm_loss_fn)

        n_ex = 24 if cfg_name == "packedb4" else 64
        exs = [(rng.integers(0, 1000, int(rng.integers(10, 60))),
                rng.integers(0, 6561, int(rng.integers(60, 440))))
               for _ in range(n_ex)]
        packed = pack_llm_examples(exs, row_len=2048, eos_token=6561 + 2)
        batch = {kk: jnp.asarray(v) for kk, v in packed.items()
                 if kk != "n_tokens"}
        toks = packed["n_tokens"]
        print(f"packed: {packed['ids'].shape[0]} rows x 2048, {toks} tokens")
        loss_fn = packed_llm_loss_fn(model)
    else:
        Bt = {"naive8": 8, "block8": 8, "block16": 16, "block32": 32,
              "block32r": 32, "block64": 64, "naive16": 16}[cfg_name]
        Tt, Ts = 64, 384
        batch = {
            "text_token": jnp.asarray(rng.integers(0, 1000, (Bt, Tt))),
            "text_token_len": jnp.full((Bt,), Tt, jnp.int32),
            "speech_token": jnp.asarray(rng.integers(0, 6561, (Bt, Ts))),
            "speech_token_len": jnp.full((Bt,), Ts, jnp.int32)}
        toks = Bt * (Tt + Ts + 2)
        loss_fn = llm_loss_fn(model)

    step = make_train_step(loss_fn, tx, donate=True)
    st = make_train_state(params, tx)
    print(f"{cfg_name}: compiling...", flush=True)
    t0 = time.time()
    st, m = step(st, batch, jax.random.PRNGKey(0))
    print(f"compile+1 {time.time()-t0:.1f}s loss {float(m['loss']):.3f}",
          flush=True)
    t0 = time.time()
    n = 5
    for i in range(n):
        st, m = step(st, batch, jax.random.PRNGKey(i))
    loss = float(m["loss"])
    dt = (time.time() - t0) / n
    mfu = 6.0 * n_par * toks / dt / 610e12
    print(f"{cfg_name}: {dt*1e3:.0f} ms/step, {toks/dt:.0f} tok/s, "
          f"MFU {mfu*100:.1f}% (loss {loss:.3f}, {n_par/1e6:.0f}M params)",
          flush=True)


if __name__ == "__main__":
    main()
