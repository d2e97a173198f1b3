"""Sharded train step builders (pjit/GSPMD) for each trainable model.

Replaces the reference's Executor/DDP loop (`cosyvoice/utils/executor.py:35-140`,
`train_utils.py:255-315`): one jitted step = forward + backward + clip +
optimizer, with gradients all-reduced by XLA over the mesh "data" axis and
TP-sharded LM params updated shard-locally.  Loss is computed in fp32;
the optimizer skips non-finite updates (optax.apply_if_finite), mirroring
train_utils.update_parameter_and_lr.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cosyvoice_tpu.parallel.mesh import param_shardings


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    mesh: Mesh | None = None, param_rules=None,
                    state_example: TrainState | None = None,
                    donate: bool = True):
    """loss_fn(params, batch, rng) -> (loss, metrics).  Returns jitted
    step(state, batch, rng) -> (state, metrics).  With a mesh, the batch is
    sharded on "data", params per `param_rules` (TP), and XLA inserts the
    gradient all-reduce / TP collectives."""

    def step(state: TrainState, batch, rng):
        def lf(p):
            loss, metrics = loss_fn(p, batch, rng)
            return loss.astype(jnp.float32), metrics

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm)
        return TrainState(params, opt_state, state.step + 1), metrics

    # Computation follows data: callers place params via shard_params()
    # (TP/DP NamedShardings) and batches via shard_batch(); tx.init(params)
    # inherits the param shardings, and GSPMD propagates everything inside
    # the jit — no need to enumerate optimizer-state shardings.
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh, sharded over the data axis.

    Single-process: a plain device_put.  Multi-process (jax.distributed):
    each host holds only ITS shard of the global batch, so the global array
    is assembled with `make_array_from_process_local_data` — every host must
    contribute the same local batch size and identical padded feature shapes
    (use `static_batch(drop_last=True)` + `padding(static_lens=...)` in the
    pipeline).  Replaces the reference's per-rank DDP batches
    (utils/train_utils.py:61-77 dataloaders + DDP allreduce).
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


# --------------------------------------------------------------------------
# per-model loss closures
# --------------------------------------------------------------------------

def llm_loss_fn(model):
    def loss_fn(params, batch, rng):
        out = model.apply(params, batch["text_token"], batch["text_token_len"],
                          batch["speech_token"], batch["speech_token_len"])
        return out["loss"], {"acc": out["acc"]}

    return loss_fn


def flow_loss_fn(model):
    def loss_fn(params, batch, rng):
        k_cfm, k_drop = jax.random.split(rng)
        out = model.apply(params, batch["speech_token"], batch["speech_token_len"],
                          batch["speech_feat"], batch["speech_feat_len"],
                          batch["embedding"], k_cfm, rngs={"dropout": k_drop})
        return out["loss"], {}

    return loss_fn
