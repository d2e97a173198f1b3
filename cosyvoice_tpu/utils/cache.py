"""Persistent XLA compilation cache.

First compiles through the TPU tunnel cost minutes; the persistent cache
makes every subsequent process start warm (measured 6.9s -> 0.5s on this
backend).  Call once before building models; safe to call repeatedly.
"""
from __future__ import annotations

import os

import jax

_DEFAULT = os.environ.get("COSYVOICE_TPU_CACHE",
                          os.path.expanduser("~/.cache/cosyvoice_tpu_xla"))


def enable_compilation_cache(path: str = _DEFAULT) -> str:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
