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


def quantize_kernel_int4xla(w: np.ndarray, group_size: int = 128) -> dict:
    """[in, out] float kernel -> {kernel: int8 NIBBLE VALUES [in, out] in
    [-7, 7], scale: f32 [in/group, out]} for QDense(quant="int4xla").

    The XLA-native int4 decode path (round-5): weights are stored int8 at
    the program boundary (this backend rejects int4 program inputs/outputs
    — "device: nullptr"), cast to jnp.int4 ONCE inside each decode program
    (int4_device_cast), after which the decode loop streams PACKED int4
    HBM buffers.  Measured on this chip (tools/probe_int4_xla.py): the
    full decode-shaped chain runs 273 ms (int8) -> 211 ms (int4) per 500
    steps — 1.29x — where the round-4 Pallas packed-int4 kernel LOST 3x to
    custom-call DMA."""
    w = np.asarray(w, np.float32)
    in_f, out = w.shape
    g = int(min(group_size, in_f))
    assert in_f % g == 0, (in_f, g)
    wg = w.reshape(in_f // g, g, out)
    scale = np.maximum(np.abs(wg).max(axis=1), 1e-8) / 7.0   # [n_g, out]
    q = np.clip(np.round(wg / scale[:, None, :]), -7, 7)
    q = q.reshape(in_f, out).astype(np.int8)
    return {"kernel": jnp.asarray(q), "scale": jnp.asarray(scale)}


def quantize_qwen_int4xla(params, proj_names: Iterable[str] = PROJ_NAMES,
                          group_size: int = 128, act_amax: dict = None):
    """Rewrite projection subtrees to the int4xla layout.  With `act_amax`
    (per-layer activation-magnitude stats from collect_act_stats), applies
    AWQ-style equalization first: per-input-channel scales s = amax^0.5
    (normalized) are folded INTO the preceding norm weight / up_proj
    columns (exact at fp), so high-activation channels quantize with
    proportionally finer effective step — the calibration-aware rescue
    round-3 prescribed for int4's agreement."""
    if act_amax:
        params = awq_equalize(params, act_amax)
    return _rewrite_projs(
        params, proj_names,
        lambda w: quantize_kernel_int4xla(w, group_size=group_size))


def int4_device_cast(params):
    """Cast every int8 'kernel' leaf to jnp.int4 — MUST run INSIDE a jitted
    program (top of the decode-loop entries), because int4 arrays cannot
    cross this backend's program boundary and a cast left inline in the
    loop body would rely on XLA loop-invariant hoisting."""

    def walk(t):
        if isinstance(t, dict):
            return {k: (v.astype(jnp.int4)
                        if k == "kernel" and hasattr(v, "dtype")
                        and v.dtype == jnp.int8 else walk(v))
                    for k, v in t.items()}
        return t

    return walk(params)


def awq_equalize(params, act_amax: dict):
    """Fold per-input-channel equalization scales into the fp tree (EXACT
    transform; quantization then sees re-balanced kernels).

    act_amax: {layer_idx: {"attn_in": [H], "mlp_in": [H], "down_in": [I]}}
    — per-channel max |activation| at the q/k/v input (post input_layernorm),
    the gate/up input (post post_attention_layernorm) and the down_proj
    input (silu(gate)*up), collected by models/llm.collect_act_stats.
    s = (amax / gmean(amax))^0.5, clipped to [0.25, 4]; kernel rows *= s,
    and 1/s folds into the producing side (norm weight / up_proj columns)."""

    def scales(a):
        a = np.maximum(np.asarray(a, np.float64), 1e-6)
        s = (a / np.exp(np.mean(np.log(a)))) ** 0.5
        return np.clip(s, 0.25, 4.0).astype(np.float32)

    p = dict(params)
    root = dict(p["params"] if "params" in p else p)
    llm = dict(root["llm"])
    for i, stats in act_amax.items():
        lp = dict(llm[f"layers_{i}"])
        s_attn = scales(stats["attn_in"])
        lp["input_layernorm"] = jnp.asarray(
            np.asarray(lp["input_layernorm"]) / s_attn)
        for proj in ("q_proj", "k_proj", "v_proj"):
            d = dict(lp[proj])
            d["kernel"] = jnp.asarray(
                np.asarray(d["kernel"]) * s_attn[:, None])
            lp[proj] = d
        s_mlp = scales(stats["mlp_in"])
        lp["post_attention_layernorm"] = jnp.asarray(
            np.asarray(lp["post_attention_layernorm"]) / s_mlp)
        for proj in ("gate_proj", "up_proj"):
            d = dict(lp[proj])
            d["kernel"] = jnp.asarray(
                np.asarray(d["kernel"]) * s_mlp[:, None])
            lp[proj] = d
        s_down = scales(stats["down_in"])
        du = dict(lp["up_proj"])
        du["kernel"] = jnp.asarray(np.asarray(du["kernel"]) / s_down[None, :])
        lp["up_proj"] = du
        dd = dict(lp["down_proj"])
        dd["kernel"] = jnp.asarray(np.asarray(dd["kernel"]) * s_down[:, None])
        lp["down_proj"] = dd
        llm[f"layers_{i}"] = lp
    root["llm"] = llm
    if "params" in p:
        p["params"] = root
        return p
    return root
