"""LoRA overlay: zero-init identity, targeted params only, training step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.train.lora import (LoRAConfig, init_lora, lora_loss_fn,
                                      lora_state_dict, merge_lora)

QW = Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                 num_kv_heads=2, head_dim=8, intermediate_size=64)


@pytest.fixture(scope="module")
def lm_and_params():
    model = Qwen2LM(LMConfig(llm_input_size=32, llm_output_size=32,
                             speech_token_size=16, qwen=QW))
    t = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), t, jnp.asarray([4]),
                        t, jnp.asarray([4]))
    return model, params


def test_lora_zero_init_is_identity(lm_and_params, rng):
    model, params = lm_and_params
    cfg = LoRAConfig(r=4)
    overlay = init_lora(params, cfg, jax.random.PRNGKey(1))
    assert len(overlay) == 2 * 4  # q/k/v/o per layer
    merged = merge_lora(params, overlay, cfg)
    text = jnp.asarray(rng.integers(0, 64, (1, 5)))
    sp = jnp.asarray(rng.integers(0, 16, (1, 6)))
    out0 = model.apply(params, text, jnp.asarray([5]), sp, jnp.asarray([6]))
    out1 = model.apply(merged, text, jnp.asarray([5]), sp, jnp.asarray([6]))
    np.testing.assert_allclose(float(out0["loss"]), float(out1["loss"]), rtol=1e-6)


def test_lora_training_updates_only_overlay(lm_and_params, rng):
    model, params = lm_and_params
    cfg = LoRAConfig(r=4)
    overlay = init_lora(params, cfg, jax.random.PRNGKey(1))

    def base_loss(p, batch, _rng):
        out = model.apply(p, *batch)
        return out["loss"], out

    lf = lora_loss_fn(params, base_loss, cfg)
    batch = (jnp.asarray(rng.integers(0, 64, (2, 5))), jnp.asarray([5, 4]),
             jnp.asarray(rng.integers(0, 16, (2, 6))), jnp.asarray([6, 5]))
    tx = optax.adam(1e-2)
    opt_state = tx.init(overlay)
    (l0, _), grads = jax.value_and_grad(lf, has_aux=True)(overlay, batch,
                                                          jax.random.PRNGKey(2))
    # b starts at zero -> grads flow into b (and a has zero grad at step 0)
    gb = grads[list(grads.keys())[0]]["b"]
    assert float(jnp.abs(gb).sum()) > 0
    updates, opt_state = tx.update(grads, opt_state)
    overlay2 = optax.apply_updates(overlay, updates)
    (l1, _), _ = jax.value_and_grad(lf, has_aux=True)(overlay2, batch,
                                                      jax.random.PRNGKey(2))
    assert float(l1) < float(l0)
    sd = lora_state_dict(overlay2)
    assert any(k.endswith(".lora_A") for k in sd)
