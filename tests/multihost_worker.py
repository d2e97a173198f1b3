"""Worker for tests/test_multihost.py — runs a tiny DP training loop.

Invoked as a subprocess per fake host (CPU backend, 4 virtual devices each,
joined via jax.distributed) and imported in-process for the single-process
reference run.  The loss trajectory must be IDENTICAL (up to fp reduction
order) between 1 process x 8 devices and 2 processes x 4 devices — that is
the multi-host correctness claim replacing the reference's DDP
(`cosyvoice/utils/train_utils.py:47-58,105-120`).
"""
import argparse
import json
import os


def global_batches(n=3, batch=8, seed=0):
    """Deterministic synthetic LLM batches (the GLOBAL batch each step)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append({
            "text_token": rng.integers(0, 128, (batch, 6)).astype(np.int32),
            "text_token_len": np.full((batch,), 6, np.int32),
            "speech_token": rng.integers(0, 20, (batch, 10)).astype(np.int32),
            "speech_token_len": np.full((batch,), 10, np.int32),
        })
    return out


def run_training(rank=0, world=1, uneven=False, n_batches=3):
    """Train the tiny Qwen2LM for up to `n_batches` steps; returns losses.

    Each process slices ITS rows out of the global batch (as a real data
    pipeline would via shard_list).  `uneven=True` gives rank 1 one batch
    fewer, exercising the all-hosts vote (executor.all_hosts_have_data)."""
    import jax
    import numpy as np
    import optax

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.parallel.mesh import make_mesh, shard_params
    from cosyvoice_tpu.train.executor import all_hosts_have_data
    from cosyvoice_tpu.train.step import (llm_loss_fn, make_train_state,
                                          make_train_step, shard_batch)

    qwen = Qwen2Config(vocab_size=128, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64, rope_theta=10000.0)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32,
                   speech_token_size=20, qwen=qwen)
    model = Qwen2LM(cfg)
    mesh = make_mesh(-1, 1)

    batches = global_batches(n_batches)
    b0 = batches[0]
    params = model.init(jax.random.PRNGKey(0),
                        b0["text_token"][:1], b0["text_token_len"][:1],
                        b0["speech_token"][:1], b0["speech_token_len"][:1])
    params, _ = shard_params(params, mesh, [])
    tx = optax.adam(1e-3)
    state = make_train_state(params, tx)
    step = make_train_step(llm_loss_fn(model), tx)

    if uneven and rank == 1:
        batches = batches[:-1]
    lo = rank * (8 // world)
    hi = lo + 8 // world
    it = iter([{k: v[lo:hi] for k, v in b.items()} for b in batches])

    losses = []
    while True:
        b = next(it, None)
        if not all_hosts_have_data(b is not None):
            break
        state, metrics = step(state, shard_batch(b, mesh),
                              jax.random.PRNGKey(len(losses)))
        losses.append(float(metrics["loss"]))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--uneven", action="store_true")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from cosyvoice_tpu.parallel import distributed as dist

    assert dist.init(args.coordinator, args.nprocs, args.rank)
    assert jax.device_count() == 4 * args.nprocs
    losses = run_training(rank=args.rank, world=args.nprocs,
                          uneven=args.uneven)
    with open(args.out, "w") as f:
        json.dump(losses, f)


if __name__ == "__main__":
    main()
