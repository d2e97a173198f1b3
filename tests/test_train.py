"""Training runtime tests: pipeline stages, executor loop, checkpointing."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cosyvoice_tpu.data import pipeline as pp
from cosyvoice_tpu.tokenizer.text import ByteTokenizer


def _samples(n=20, sr=24000, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        dur = rng.integers(sr // 2, 2 * sr)
        yield {"utt": f"u{i}", "text": "hello world " * int(rng.integers(1, 5)),
               "speech": (rng.standard_normal(dur) * 0.1).astype(np.float32),
               "sample_rate": sr,
               "speech_token": rng.integers(0, 100, dur // 960),
               "embedding": rng.standard_normal(192).astype(np.float32)}


def test_pipeline_batches():
    p = (pp.Pipeline(_samples(),
                     pp.filter_samples(),
                     pp.resample(24000),
                     pp.compute_fbank(),
                     pp.tokenize(ByteTokenizer()),
                     pp.sort_by_feat_len(8),
                     pp.dynamic_batch(max_frames_in_batch=300),
                     pp.padding()))
    batches = list(p)
    assert len(batches) >= 2
    for b in batches:
        B, L, C = b["speech_feat"].shape
        assert C == 80 and L % 32 == 0
        assert (b["speech_feat_len"] <= L).all()
        assert b["speech_token"].shape[0] == B
        assert b["embedding"].shape == (B, 192)
        # mel length consistent with hop 480
        assert b["speech_feat_len"].max() <= L


def test_shard_list():
    items = list(range(10))
    a = pp.shard_list(items, 0, 2, shuffle=False)
    b = pp.shard_list(items, 1, 2, shuffle=False)
    assert sorted(a + b) == items and not (set(a) & set(b))


def test_executor_and_checkpoint(tmp_path):
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                                save_checkpoint)
    from cosyvoice_tpu.train.executor import Executor
    from cosyvoice_tpu.train.optim import make_optimizer
    from cosyvoice_tpu.train.step import (llm_loss_fn, make_train_state,
                                          make_train_step)

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                       num_kv_heads=2, head_dim=8, intermediate_size=64)
    model = Qwen2LM(LMConfig(llm_input_size=32, llm_output_size=32,
                             speech_token_size=16, qwen=qwen))
    rng = np.random.default_rng(0)

    def batches(n):
        for _ in range(n):
            yield {"utts": ["a", "b"],
                   "text_token": jnp.asarray(rng.integers(0, 64, (2, 6))),
                   "text_token_len": jnp.full((2,), 6),
                   "speech_token": jnp.asarray(rng.integers(0, 16, (2, 8))),
                   "speech_token_len": jnp.full((2,), 8)}

    b0 = next(batches(1))
    params = model.init(jax.random.PRNGKey(0), b0["text_token"],
                        b0["text_token_len"], b0["speech_token"],
                        b0["speech_token_len"])
    tx, _ = make_optimizer("adam", 1e-3, "constantlr")
    state = make_train_state(params, tx)
    lf = llm_loss_fn(model)
    step = make_train_step(lf, tx, donate=False)

    def cv_step(p, batch, rng):
        loss, m = lf(p, batch, rng)
        return {"loss": loss}

    ex = Executor(train_step=step, model_dir=str(tmp_path / "m"),
                  save_per_step=-1, log_interval=2, cv_step=cv_step)
    state = ex.train_one_epoch(state, batches(6), cv_data=list(batches(2)))
    assert ex.step == 6
    assert latest_step(str(tmp_path / "m")) == 6
    metrics = [json.loads(l) for l in open(ex.metrics_path)]
    assert any(m["tag"] == "CV" for m in metrics)
    assert all(np.isfinite(m["loss"]) for m in metrics)

    # resume
    state2, step2 = restore_checkpoint(str(tmp_path / "m"), state)
    assert step2 == 6
    l0 = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(l0),
                                  np.asarray(jax.tree.leaves(state2.params)[0]))


def test_checkpoint_averaging(tmp_path):
    from cosyvoice_tpu.train.checkpoint import average_checkpoints, save_checkpoint
    from cosyvoice_tpu.train.step import TrainState

    s1 = TrainState({"w": jnp.ones(3)}, {}, jnp.asarray(1))
    s2 = TrainState({"w": jnp.ones(3) * 3}, {}, jnp.asarray(2))
    save_checkpoint(str(tmp_path / "c"), s1, 1)
    save_checkpoint(str(tmp_path / "c"), s2, 2)
    avg = average_checkpoints(str(tmp_path / "c"), s1, last_n=2)
    np.testing.assert_allclose(np.asarray(avg["w"]), np.full(3, 2.0))


def test_executor_tensorboard_writer(tmp_path):
    """Optional TensorBoard sink mirrors JSONL metrics (train_utils.py:199)."""
    from cosyvoice_tpu.train.executor import Executor

    ex = Executor(train_step=lambda s, b, r: (s, {"loss": 1.0}),
                  model_dir=str(tmp_path), tensorboard_dir=str(tmp_path / "tb"))
    ex._log("TRAIN", {"loss": 0.5, "lr": 1e-4})
    assert (tmp_path / "metrics.jsonl").exists()
    if ex._tb is not None:
        ex._tb.flush()
        assert any((tmp_path / "tb").iterdir())
