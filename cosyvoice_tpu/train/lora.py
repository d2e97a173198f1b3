"""LoRA finetuning as a functional params-tree overlay.

Behavioral spec: reference `cosyvoice/loralib/` — layers.py:11-718 implements
stateful merged/unmerged LoRA variants of Embedding/Linear/Conv1d/
CausalConv1d/ConvTranspose1d with weight-norm interplay, and utils.py:11-223
(mark_only_lora_as_trainable, lora_state_dict, replace_specific_layer_4lora
walking the model by config name patterns).

Functionally all of that collapses to: W_eff = W + (alpha/r) * B @ A on the
selected kernels.  Here `init_lora` builds a sparse overlay tree matching
regex-selected paths, `merge_lora` produces effective params for apply, and
training takes grads only w.r.t. the overlay (the frozen base never updates —
the built-in equivalent of mark_only_lora_as_trainable).  Weight-normed convs
(g, v) receive the delta on v (the direction), keeping g as the learned gain.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class LoRAConfig:
    r: int = 8
    alpha: int = 16
    # regex over '/'-joined param paths; matching 2D+ kernels get adapters
    target_patterns: Sequence[str] = (r".*/(q_proj|k_proj|v_proj|o_proj)/kernel$",)
    init_std: float = 0.01

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def _paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]

    def pstr(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    return [(pstr(kp), v) for kp, v in flat]


def _matches(path: str, cfg: LoRAConfig) -> bool:
    return any(re.match(p, path) for p in cfg.target_patterns)


def init_lora(params, cfg: LoRAConfig, rng: jax.Array) -> dict:
    """Build {path: {'a': [r, fan_in], 'b': [fan_out, r]}} for matching kernels.

    a ~ N(0, init_std) (reference layers.py inits A gaussian), b = 0, so the
    initial delta is zero and step 0 reproduces the base model exactly.
    """
    overlay = {}
    for path, v in _paths(params):
        if not _matches(path, cfg) or v.ndim < 2:
            continue
        fan_in = int(np.prod(v.shape[:-1]))
        fan_out = v.shape[-1]
        rng, k = jax.random.split(rng)
        overlay[path] = {
            "a": jax.random.normal(k, (cfg.r, fan_in), jnp.float32) * cfg.init_std,
            "b": jnp.zeros((fan_out, cfg.r), jnp.float32),
        }
    return overlay


def merge_lora(params, overlay: dict, cfg: LoRAConfig):
    """Effective params: kernel + scale * (a^T @ b^T) reshaped to kernel shape."""
    by_path = dict(_paths(params))

    def merged(path, v):
        if path not in overlay:
            return v
        ab = overlay[path]
        delta = (ab["a"].T @ ab["b"].T) * cfg.scale  # [fan_in, fan_out]
        return v + delta.reshape(v.shape).astype(v.dtype)

    flat = {p: merged(p, v) for p, v in by_path.items()}
    # rebuild tree with same structure
    treedef = jax.tree_util.tree_structure(params)
    keys = [p for p, _ in _paths(params)]
    return jax.tree_util.tree_unflatten(treedef, [flat[k] for k in keys])


def lora_loss_fn(base_params, loss_fn, cfg: LoRAConfig):
    """Wrap loss_fn(params, batch, rng) so grads flow only into the overlay."""

    def fn(overlay, batch, rng):
        merged = merge_lora(jax.lax.stop_gradient(base_params), overlay, cfg)
        return loss_fn(merged, batch, rng)

    return fn


def lora_state_dict(overlay: dict) -> dict:
    """Flatten to numpy for saving (reference utils.py:42)."""
    out = {}
    for path, ab in overlay.items():
        out[f"{path}.lora_A"] = np.asarray(ab["a"])
        out[f"{path}.lora_B"] = np.asarray(ab["b"])
    return out
