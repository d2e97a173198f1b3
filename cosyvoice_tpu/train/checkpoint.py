"""Checkpoint save / resume / averaging.

Behavioral spec: reference `cosyvoice/utils/train_utils.py:207-231`
(save_model: rank-0 state_dict -> {name}.pt + {name}.yaml info snapshot),
`:409-427` (get_latest_ckpt / get_resume_params: auto-resume with step/lr
restore) and `cosyvoice/bin/average_model.py` (checkpoint averaging).

TPU-native: orbax-checkpoint over the sharded TrainState (each host writes
its shards), plus a small json info sidecar; torch .pt import lives in the
per-model importers.
"""
from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from cosyvoice_tpu.train.step import TrainState


def _mgr(ckpt_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir))


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    info: Optional[dict] = None) -> None:
    with _mgr(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    meta = dict(info or {}, step=step,
                save_time=time.strftime("%d/%m/%Y %H:%M:%S"))
    with open(os.path.join(ckpt_dir, f"info_{step}.json"), "w") as f:
        json.dump(meta, f, indent=2)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _mgr(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, example: TrainState,
                       step: Optional[int] = None) -> tuple[TrainState, int]:
    with _mgr(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        assert step is not None, f"no checkpoint under {ckpt_dir}"
        state = mgr.restore(step, args=ocp.args.StandardRestore(example))
    return state, step


def average_checkpoints(ckpt_dir: str, example: TrainState,
                        last_n: int = 5) -> Any:
    """Average params of the newest `last_n` checkpoints (bin/average_model.py)."""
    with _mgr(ckpt_dir) as mgr:
        steps = sorted(mgr.all_steps())[-last_n:]
        assert steps, f"no checkpoints under {ckpt_dir}"
        acc = None
        for s in steps:
            st = mgr.restore(s, args=ocp.args.StandardRestore(example))
            p = jax.tree.map(lambda x: np.asarray(x, np.float64), st.params)
            acc = p if acc is None else jax.tree.map(np.add, acc, p)
    return jax.tree.map(lambda x: (x / len(steps)).astype(np.float32), acc)
