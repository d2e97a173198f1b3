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
