"""Weight-only int8 quantization for the serving LM.

The AR decode step is weight-HBM-bandwidth-bound (every step reads every
projection matrix once); int8 kernels + per-output-channel f32 scales halve
that traffic vs bf16 with negligible logit error (the reference's serving
backends lean on fp16/CUDA-graphs instead — cli/model.py:43, llm/qwen2_5.py).

Use: params = quantize_qwen_int8(fp_params); model built with
Qwen2Config(quant="int8") (models/qwen2.py QDense).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
              "gate_proj", "up_proj", "down_proj")


def quantize_kernel_int8(w: np.ndarray) -> dict:
    """[in, out] float kernel -> {kernel:int8, scale:f32[out]} (symmetric,
    per-output-channel)."""
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel": jnp.asarray(q), "scale": jnp.asarray(scale)}


def quantize_qwen_int8(params, proj_names: Iterable[str] = PROJ_NAMES):
    """Rewrite every {<proj>: {kernel, [bias]}} subtree in a param pytree to
    the int8 layout expected by QDense(quant="int8")."""
    proj_names = set(proj_names)

    def rewrite(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if name in proj_names and isinstance(sub, dict) and "kernel" in sub:
                new = quantize_kernel_int8(np.asarray(sub["kernel"]))
                if "bias" in sub:
                    new["bias"] = sub["bias"]
                out[name] = new
            else:
                out[name] = rewrite(sub)
        return out

    return rewrite(dict(params))
