"""Training executor: epoch loop, periodic CV + checkpoint, metric logging.

Behavioral spec: reference `cosyvoice/utils/executor.py` —
train_one_epoc:35-82 (batch loop -> forward/backward -> update -> periodic
CV + save by save_per_step), train_one_epoc_gan:84-140 (discriminator turn
then generator turn per batch), cv:142-172 (weighted loss aggregation,
epoch_X_whole checkpoints) — and `utils/train_utils.py:318-362`
(rank-0 metric logging).

TPU-native: one jitted train step (train/step.py) replaces
batch_forward/backward/update; gradient accumulation is optax.MultiSteps;
metrics stream to a JSONL file + stdout (TensorBoard writer optional).
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from cosyvoice_tpu.train.checkpoint import save_checkpoint
from cosyvoice_tpu.train.step import TrainState

logger = logging.getLogger(__name__)


def arrays_only(batch: dict) -> dict:
    """Drop non-array metadata (utt ids, text strings) before jit."""
    return {k: v for k, v in batch.items()
            if not isinstance(v, (str, bytes))
            and not (isinstance(v, list) and v and isinstance(v[0], str))}


def all_hosts_have_data(has_batch: bool) -> bool:
    """Multi-host uneven-data-exhaustion guard.

    Reference equivalent: `cosyvoice_join`'s gloo monitored_barrier
    (utils/train_utils.py:234-252) — when one rank's shard runs out first,
    every rank must stop together or the next collective hangs.  Under SPMD
    the same applies to XLA collectives, so every host votes before each
    step; the epoch ends for all hosts the moment any host is exhausted."""
    if jax.process_count() == 1:
        return has_batch
    from jax.experimental import multihost_utils

    votes = multihost_utils.process_allgather(
        np.asarray([has_batch], dtype=np.bool_))
    return bool(np.all(votes))


@dataclass
class Executor:
    train_step: Callable            # (state, batch, rng) -> (state, metrics)
    model_dir: str
    save_per_step: int = -1
    log_interval: int = 100
    max_epoch: int = 200
    rng_seed: int = 1986
    cv_step: Callable | None = None  # (params, batch, rng) -> loss dict
    metrics_path: Optional[str] = None
    step: int = 0
    epoch: int = 0

    tensorboard_dir: Optional[str] = None  # rank-0 SummaryWriter like the
    # reference (train_utils.py:199-204); optional — JSONL is the primary sink

    def __post_init__(self):
        os.makedirs(self.model_dir, exist_ok=True)
        self.metrics_path = self.metrics_path or os.path.join(
            self.model_dir, "metrics.jsonl")
        self._tb = None
        if self.tensorboard_dir:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(self.tensorboard_dir)
            except ImportError:
                logger.warning("tensorboardX unavailable; JSONL metrics only")

    def _log(self, tag: str, metrics: dict):
        rec = {"tag": tag, "epoch": self.epoch, "step": self.step,
               **{k: float(v) for k, v in metrics.items()}}
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{tag}/{k}", float(v), self.step)
        if tag == "CV" or self.step % self.log_interval == 0:
            logger.info("%s %s", tag, rec)

    def train_one_epoch(self, state: TrainState, train_data: Iterable,
                        cv_data: Optional[Iterable] = None,
                        to_device: Callable = lambda b: b) -> TrainState:
        logger.info("Epoch %d begin", self.epoch)
        t0, n_since = time.time(), 0
        it = iter(train_data)
        while True:
            batch = next(it, None)
            if not all_hosts_have_data(batch is not None):
                if batch is not None:
                    logger.info("another host exhausted its shard; "
                                "ending epoch early together (join guard)")
                break
            rng = jax.random.fold_in(jax.random.PRNGKey(self.rng_seed), self.step)
            state, metrics = self.train_step(state, to_device(arrays_only(batch)), rng)
            self.step += 1
            n_since += 1
            if self.step % self.log_interval == 0:
                dt = (time.time() - t0) / max(n_since, 1)
                self._log("TRAIN", dict(metrics, sec_per_step=dt))
                t0, n_since = time.time(), 0
            if self.save_per_step > 0 and self.step % self.save_per_step == 0:
                if cv_data is not None:
                    self.cv(state, cv_data, to_device)
                save_checkpoint(self.model_dir, state, self.step,
                                {"epoch": self.epoch})
        if cv_data is not None:
            self.cv(state, cv_data, to_device)
        save_checkpoint(self.model_dir, state, self.step,
                        {"epoch": self.epoch, "whole": True})
        self.epoch += 1
        return state

    def cv(self, state: TrainState, cv_data: Iterable,
           to_device: Callable = lambda b: b) -> dict:
        assert self.cv_step is not None
        tot, w = {}, 0
        for i, batch in enumerate(cv_data):
            n = len(batch.get("utts", [1]))
            out = self.cv_step(state.params, to_device(arrays_only(batch)),
                               jax.random.PRNGKey(i))
            for k, v in out.items():
                tot[k] = tot.get(k, 0.0) + float(v) * n
            w += n
        avg = {k: v / max(w, 1) for k, v in tot.items()}
        self._log("CV", avg)
        return avg


@dataclass
class GanExecutor(Executor):
    """Two-optimizer alternation (executor.py:84-140): per batch run the
    discriminator step on the current generator, then the generator step."""

    disc_step: Callable | None = None   # (d_state, g_params, batch, rng)

    def train_one_epoch_gan(self, g_state, d_state, train_data,
                            cv_data=None, to_device=lambda b: b):
        it = iter(train_data)
        while True:
            batch = next(it, None)
            if not all_hosts_have_data(batch is not None):
                break
            rng = jax.random.fold_in(jax.random.PRNGKey(self.rng_seed), self.step)
            b = to_device(arrays_only(batch))
            d_state, d_metrics = self.disc_step(d_state, g_state.params, b, rng)
            g_state, g_metrics = self.train_step(g_state, (d_state.params, b), rng)
            self.step += 1
            if self.step % self.log_interval == 0:
                self._log("TRAIN", {**{f"d_{k}": v for k, v in d_metrics.items()},
                                    **g_metrics})
            if self.save_per_step > 0 and self.step % self.save_per_step == 0:
                save_checkpoint(self.model_dir, g_state, self.step,
                                {"epoch": self.epoch})
                save_checkpoint(self.model_dir + "_disc", d_state, self.step)
        save_checkpoint(self.model_dir, g_state, self.step,
                        {"epoch": self.epoch, "whole": True})
        save_checkpoint(self.model_dir + "_disc", d_state, self.step)
        self.epoch += 1
        return g_state, d_state
