"""Weight-only int8 / packed-int4 quantization for the serving LM.

The AR decode step is weight-HBM-bandwidth-bound (every step reads every
projection matrix once); int8 kernels + per-output-channel f32 scales halve
that traffic vs bf16 with negligible logit error, and packed int4 halves it
again through the Pallas dequant matmul (ops/pallas/int4_matmul.py).  The
reference's serving backends lean on fp16/CUDA-graphs/vLLM instead —
cli/model.py:43, llm/qwen2_5.py.

Use: params = quantize_qwen_int8(fp_params) or quantize_qwen_int4(fp_params);
model built with Qwen2Config(quant="int8"|"int4") (models/qwen2.py QDense).
Both are gated by greedy-agreement tests vs the fp path
(tests/test_llm.py::test_lm_int{8,4}_decode_matches_fp).
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


def quantize_kernel_int4(w: np.ndarray, group_size: int = 128) -> dict:
    """[in, out] float kernel -> {kernel: packed int8 [in/2, out],
    scale: f32[in/group, out]} (symmetric, GROUP-WISE along the input dim,
    range [-7, 7]).  Sub-channel groups are what make 4-bit weight-only
    usable — per-output-channel alone is too lossy (greedy agreement drops
    below the 75% gate even on tiny models)."""
    from cosyvoice_tpu.ops.pallas.int4_matmul import pack_int4

    w = np.asarray(w, np.float32)
    in_f, out = w.shape
    g = int(min(group_size, in_f))
    assert in_f % g == 0 and g % 2 == 0, (in_f, g)
    wg = w.reshape(in_f // g, g, out)
    scale = np.maximum(np.abs(wg).max(axis=1), 1e-8) / 7.0   # [n_g, out]
    q = np.clip(np.round(wg / scale[:, None, :]), -7, 7)
    q = q.reshape(in_f, out).astype(np.int8)
    return {"kernel": jnp.asarray(pack_int4(q)), "scale": jnp.asarray(scale)}


def _rewrite_projs(params, proj_names, quantize_one):
    proj_names = set(proj_names)

    def rewrite(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for name, sub in tree.items():
            if name in proj_names and isinstance(sub, dict) and "kernel" in sub:
                new = quantize_one(np.asarray(sub["kernel"]))
                if "bias" in sub:
                    new["bias"] = sub["bias"]
                out[name] = new
            else:
                out[name] = rewrite(sub)
        return out

    return rewrite(dict(params))


def quantize_qwen_int8(params, proj_names: Iterable[str] = PROJ_NAMES):
    """Rewrite every {<proj>: {kernel, [bias]}} subtree in a param pytree to
    the int8 layout expected by QDense(quant="int8")."""
    return _rewrite_projs(params, proj_names, quantize_kernel_int8)


def quantize_qwen_int4(params, proj_names: Iterable[str] = PROJ_NAMES,
                       group_size: int = 128):
    """Rewrite every {<proj>: {kernel, [bias]}} subtree to the packed-int4
    layout expected by QDense(quant="int4", quant_group=group_size)."""
    return _rewrite_projs(
        params, proj_names,
        lambda w: quantize_kernel_int4(w, group_size=group_size))
