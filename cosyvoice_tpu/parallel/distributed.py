"""Multi-host initialization (jax.distributed) for training/serving.

Replaces the reference's `init_distributed` — torch
`dist.init_process_group(nccl)` + DeepSpeed comm init
(`cosyvoice/utils/train_utils.py:47-58`) and the torchrun env plumbing
(`bin/train.py:28,54-58`).  On TPU pods the runtime usually auto-detects the
cluster (no arguments needed); for CPU fake-clusters (tests) and explicit
setups the coordinator/num_processes/process_id triple is passed through.

All processes must call `init()` before any JAX computation; afterwards
`jax.devices()` is the GLOBAL device list, `jax.local_devices()` the
per-process slice, and `jax.process_index()/process_count()` replace the
reference's hand-fed `--rank/--world_size`.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU pod auto-detection
    (initialize() with no args, only when a cluster env is detected).
    Returns True iff a multi-process runtime was initialized.  Safe to call
    twice (second call is a no-op).
    """
    # do NOT touch jax.devices()/process_count() before initialize() — that
    # would spin up the single-process backend and lock the cluster out
    if jax.distributed.is_initialized():
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False                   # single-process run
    if (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                len(jax.local_devices()), jax.device_count())
    return True


def rank_and_world() -> tuple[int, int]:
    """Data-pipeline sharding coordinates (dataset.py:52-105 equivalent)."""
    return jax.process_index(), jax.process_count()
