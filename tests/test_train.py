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


def test_packed_llm_step_matches_unpacked():
    """Sequence packing (train/packing.py + Qwen2LM.packed_call) is loss-
    exact: packing the same examples into block-diagonal rows yields the
    SAME masked-CE loss/acc as the unpacked per-row __call__ (identical
    valid-position set and denominator)."""
    from cosyvoice_tpu.models.llm import IGNORE_ID, LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.train.packing import pack_llm_examples

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32,
                   speech_token_size=16, qwen=qwen)
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(3)
    exs = [(rng.integers(0, 64, n).astype(np.int32),
            rng.integers(0, 16, s).astype(np.int32))
           for n, s in [(5, 7), (3, 4), (6, 9), (2, 3)]]

    # unpacked: pad to common shapes, one example per row
    Tt = max(len(t) for t, _ in exs)
    Ts = max(len(s) for _, s in exs)
    text = np.zeros((len(exs), Tt), np.int32)
    tl = np.zeros(len(exs), np.int32)
    sp = np.zeros((len(exs), Ts), np.int32)
    sl = np.zeros(len(exs), np.int32)
    for i, (t, s) in enumerate(exs):
        text[i, :len(t)] = t
        tl[i] = len(t)
        sp[i, :len(s)] = s
        sl[i] = len(s)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(text),
                        jnp.asarray(tl), jnp.asarray(sp), jnp.asarray(sl))
    want = model.apply(params, jnp.asarray(text), jnp.asarray(tl),
                       jnp.asarray(sp), jnp.asarray(sl))

    packed = pack_llm_examples(exs, row_len=24, sos_eos=cfg.sos_eos,
                               task_id=cfg.task_id, eos_token=cfg.eos_token,
                               ignore_id=IGNORE_ID)
    assert packed["ids"].shape[0] < len(exs), "expected real packing"
    got = model.apply(params, *(jnp.asarray(packed[k]) for k in
                                ("ids", "types", "positions", "seg",
                                 "target")),
                      method=Qwen2LM.packed_call)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(got["acc"]), float(want["acc"]),
                               rtol=2e-5)


def test_lsm_loss_closed_form_matches_onehot():
    """The closed-form label-smoothing CE equals the one-hot KL
    materialization it replaced (wenet LabelSmoothingLoss semantics)."""
    from cosyvoice_tpu.models.llm import IGNORE_ID, masked_ce_loss

    rng = np.random.default_rng(0)
    V = 37
    logits = jnp.asarray(rng.standard_normal((3, 11, V)).astype(np.float32))
    target = rng.integers(0, V, (3, 11)).astype(np.int32)
    target[:, :4] = IGNORE_ID
    sm = 0.1
    got = float(masked_ce_loss(logits, jnp.asarray(target), smoothing=sm))

    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    conf, smv = 1.0 - sm, sm / (V - 1)
    onehot = np.eye(V)[np.maximum(target, 0)]
    true_dist = onehot * conf + (1.0 - onehot) * smv
    nll = np.sum(true_dist * (np.log(true_dist) - logp), axis=-1)
    valid = target != IGNORE_ID
    want = float(np.sum(np.where(valid, nll, 0.0)) / valid.sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_remat_packed_step_matches_no_remat():
    """qwen.remat recomputes layers in backward; loss and grads match the
    non-remat step (param tree unchanged)."""
    import dataclasses

    import optax

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.train.packing import (pack_llm_examples,
                                             packed_llm_loss_fn)

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32,
                   speech_token_size=16, qwen=qwen)
    rng = np.random.default_rng(1)
    exs = [(rng.integers(0, 64, 5).astype(np.int32),
            rng.integers(0, 16, 7).astype(np.int32)) for _ in range(3)]
    packed = pack_llm_examples(exs, row_len=32, eos_token=cfg.eos_token)
    batch = {k: jnp.asarray(v) for k, v in packed.items() if k != "n_tokens"}

    m0 = Qwen2LM(cfg)
    m1 = Qwen2LM(dataclasses.replace(
        cfg, qwen=dataclasses.replace(qwen, remat=True)))
    m2 = Qwen2LM(dataclasses.replace(
        cfg, qwen=dataclasses.replace(qwen, remat=True,
                                      remat_policy="all")))
    t = jnp.asarray(rng.integers(0, 64, (1, 5)))
    params = m0.init(jax.random.PRNGKey(0), t, jnp.asarray([5]), t % 16,
                     jnp.asarray([5]))
    # remat model loads the same tree
    g0 = jax.grad(lambda p: packed_llm_loss_fn(m0)(p, batch, None)[0])(params)
    for m in (m1, m2):   # "scores" policy and full recompute
        g1 = jax.grad(lambda p: packed_llm_loss_fn(m)(p, batch, None)[0])(params)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5), g0, g1)


def test_block_attention_forward_matches_naive():
    """ops/block_attention == einsum+softmax attention (GQA + bias), forward
    and every input grad — including a non-block-multiple key length (pad
    path) and a head-resolved bias."""
    from cosyvoice_tpu.ops.block_attention import block_attention
    from cosyvoice_tpu.ops.masks import NEG_INF

    rng = np.random.default_rng(0)
    B, KH, g, T, S, D = 2, 2, 3, 5, 11, 8
    H = KH * g
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KH, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KH, S, D)), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    def naive(q, k, v, bias):
        qg = q.reshape(B, KH, g, T, D)
        s = jnp.einsum("bkgtd,bkcd->bkgtc", qg, k) * scale
        hb = bias.shape[1]
        s = s + (bias[:, :, None] if hb == 1
                 else bias.reshape(B, KH, g, T, S))
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bkgtc,bkcd->bkgtd", p, v).reshape(B, H, T, D)

    for hb in (1, H):
        mask = rng.random((B, hb, T, S)) < 0.8
        mask[..., 0] = True
        bias = jnp.where(jnp.asarray(mask), 0.0, NEG_INF).astype(jnp.float32)
        want = naive(q, k, v, bias)
        got = block_attention(q, k, v, bias, scale, 4)   # 11 % 4 != 0
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

        def loss_b(fn):
            def f(q, k, v, bias):
                return jnp.sum(jnp.sin(fn(q, k, v, bias)))
            return f

        g_want = jax.grad(loss_b(naive), argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_got = jax.grad(loss_b(lambda *a: block_attention(*a, scale, 4)),
                         argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g_got, g_want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


def test_block_attention_grads_match():
    """qwen.block_attention trains identically to the naive attention: same
    packed-batch loss and grads (the r5 config replacing full-layer remat)."""
    import dataclasses

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.train.packing import (pack_llm_examples,
                                             packed_llm_loss_fn)

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32,
                   speech_token_size=16, qwen=qwen)
    rng = np.random.default_rng(1)
    exs = [(rng.integers(0, 64, 5).astype(np.int32),
            rng.integers(0, 16, 7).astype(np.int32)) for _ in range(3)]
    packed = pack_llm_examples(exs, row_len=32, eos_token=cfg.eos_token)
    batch = {k: jnp.asarray(v) for k, v in packed.items() if k != "n_tokens"}

    m0 = Qwen2LM(cfg)
    m1 = Qwen2LM(dataclasses.replace(
        cfg, qwen=dataclasses.replace(qwen, block_attention=True,
                                      attention_block=8)))
    t = jnp.asarray(rng.integers(0, 64, (1, 5)))
    params = m0.init(jax.random.PRNGKey(0), t, jnp.asarray([5]), t % 16,
                     jnp.asarray([5]))
    l0, _ = packed_llm_loss_fn(m0)(params, batch, None)
    l1, _ = packed_llm_loss_fn(m1)(params, batch, None)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    g0 = jax.grad(lambda p: packed_llm_loss_fn(m0)(p, batch, None)[0])(params)
    g1 = jax.grad(lambda p: packed_llm_loss_fn(m1)(p, batch, None)[0])(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5), g0, g1)


def test_block_attention_unpacked_call_matches():
    """block_attention through the plain (unpacked) training __call__."""
    import dataclasses

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32,
                   speech_token_size=16, qwen=qwen)
    rng = np.random.default_rng(2)
    tt = jnp.asarray(rng.integers(0, 64, (2, 6)))
    st = jnp.asarray(rng.integers(0, 16, (2, 9)))
    tl = jnp.asarray([6, 4])
    sl = jnp.asarray([9, 7])
    m0 = Qwen2LM(cfg)
    m1 = Qwen2LM(dataclasses.replace(
        cfg, qwen=dataclasses.replace(qwen, block_attention=True,
                                      attention_block=8)))
    params = m0.init(jax.random.PRNGKey(0), tt, tl, st, sl)

    def loss(m, p):
        return m.apply(p, tt, tl, st, sl)["loss"]

    np.testing.assert_allclose(float(loss(m0, params)),
                               float(loss(m1, params)), rtol=1e-6)
    g0 = jax.grad(lambda p: loss(m0, p))(params)
    g1 = jax.grad(lambda p: loss(m1, p))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5), g0, g1)


def test_packed_llm_loss_sum_normalized_matches():
    """length_normalized_loss=False: the packed step divides by the EXAMPLE
    count (sum of per-row max seg), not the packed row count — equal to the
    unpacked step's batch-size divisor (ADVICE r4 medium)."""
    import dataclasses

    from cosyvoice_tpu.models.llm import IGNORE_ID, LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.train.packing import pack_llm_examples

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32,
                   speech_token_size=16, qwen=qwen,
                   length_normalized_loss=False)
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(4)
    exs = [(rng.integers(0, 64, n).astype(np.int32),
            rng.integers(0, 16, s).astype(np.int32))
           for n, s in [(5, 7), (3, 4), (6, 9), (2, 3)]]
    Tt = max(len(t) for t, _ in exs)
    Ts = max(len(s) for _, s in exs)
    text = np.zeros((len(exs), Tt), np.int32)
    tl = np.zeros(len(exs), np.int32)
    sp = np.zeros((len(exs), Ts), np.int32)
    sl = np.zeros(len(exs), np.int32)
    for i, (t, s) in enumerate(exs):
        text[i, :len(t)] = t
        tl[i] = len(t)
        sp[i, :len(s)] = s
        sl[i] = len(s)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(text),
                        jnp.asarray(tl), jnp.asarray(sp), jnp.asarray(sl))
    want = model.apply(params, jnp.asarray(text), jnp.asarray(tl),
                       jnp.asarray(sp), jnp.asarray(sl))
    packed = pack_llm_examples(exs, row_len=24, sos_eos=cfg.sos_eos,
                               task_id=cfg.task_id, eos_token=cfg.eos_token,
                               ignore_id=IGNORE_ID)
    assert packed["ids"].shape[0] < len(exs), "expected real packing"
    got = model.apply(params, *(jnp.asarray(packed[k]) for k in
                                ("ids", "types", "positions", "seg",
                                 "target")),
                      method=Qwen2LM.packed_call)
    np.testing.assert_allclose(float(got["loss"]), float(want["loss"]),
                               rtol=2e-5)
