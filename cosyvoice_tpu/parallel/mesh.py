"""Device mesh + sharding rules (GSPMD) for the TTS stack.

Replaces the reference's torch-DDP/NCCL/DeepSpeed machinery
(`cosyvoice/utils/train_utils.py:47-120`, SURVEY.md section 2.11) with XLA
collectives over a Mesh:

  * axis "data": utterance batches (DP) — gradients all-reduce over ICI
  * axis "model": tensor parallelism for the Qwen2 LM (attention heads /
    ffn intermediate sharded; GSPMD pads non-divisible dims)

The reference has no pipeline/sequence/expert parallelism (SURVEY 2.11) and
sequences are short; scaling is DP-first with optional TP for the LM.
Optimizer state is sharded like the params (GSPMD handles ZeRO-style
placement via the same specs).
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None, dcn_data: int = 1) -> Mesh:
    """Mesh(("data", "model")) over the GLOBAL device list.

    `data` is the global data-parallel degree (-1 = all devices / model).
    On TPU, `mesh_utils.create_device_mesh` orders devices so the "model"
    axis rides the fastest ICI dimension; `dcn_data > 1` builds a hybrid
    mesh for multi-slice deployments (data-parallel outer axis over DCN,
    everything else inside each ICI slice) — the GSPMD replacement for the
    reference's NCCL process groups (utils/train_utils.py:47-58).
    """
    devices = devices if devices is not None else jax.devices()
    if data == -1:
        data = len(devices) // model
    from jax.experimental import mesh_utils

    if dcn_data > 1:
        assert data % dcn_data == 0, (data, dcn_data)
        dev = mesh_utils.create_hybrid_device_mesh(
            (data // dcn_data, model), (dcn_data, 1), devices=devices)
        return Mesh(dev, ("data", "model"))
    try:
        dev = mesh_utils.create_device_mesh((data, model),
                                            devices=devices[: data * model])
    except (ValueError, AssertionError, NotImplementedError):
        # non-TPU backends / partial device lists: plain row-major layout
        dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


# path-regex -> PartitionSpec, first match wins.  Paths are '/'-joined
# flax param paths, e.g. "llm/layers_3/q_proj/kernel".
LM_RULES: list[tuple[str, P]] = [
    # attention: shard heads (output dim of q/k/v, input dim of o)
    (r".*/(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*/(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*/o_proj/kernel$", P("model", None)),
    # mlp: shard intermediate
    (r".*/(gate_proj|up_proj)/kernel$", P(None, "model")),
    (r".*/down_proj/kernel$", P("model", None)),
    # embeddings / heads: shard vocab
    (r".*/embed_tokens/embedding$", P("model", None)),
    (r".*/speech_embedding/embedding$", P("model", None)),
    (r".*/llm_decoder/kernel$", P(None, "model")),
    (r".*/llm_decoder/bias$", P("model")),
]

# flow/hift are small (~100M / ~80M): replicate params, shard batch on data.
REPLICATED_RULES: list[tuple[str, P]] = []


def spec_for(path: str, rules: list[tuple[str, P]]) -> P:
    for pat, spec in rules:
        if re.match(pat, path):
            return spec
    return P()


def _fits(spec: P, shape, mesh: Mesh) -> bool:
    """True iff every sharded dim is divisible by its mesh axis size."""
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        size = np.prod([mesh.shape[a] for a in
                        (axis if isinstance(axis, tuple) else (axis,))])
        if dim % size != 0:
            return False
    return True


def param_shardings(params, mesh: Mesh, rules: list[tuple[str, P]]):
    """Pytree of NamedShardings matching `params`; non-divisible dims fall
    back to replication (e.g. 14 query heads on model=4 — the reference pads
    vocab for vLLM TP the same way, bin/vllm_save_newckpt.py:5-45)."""

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    def to_sharding(kp, x):
        spec = spec_for(path_str(kp), rules)
        if not _fits(spec, x.shape, mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh, rules: list[tuple[str, P]]):
    shardings = param_shardings(params, mesh, rules)
    return jax.device_put(params, shardings), shardings


def sharded_bytes_fraction(params, mesh: Mesh,
                           rules: list[tuple[str, P]]) -> float:
    """Fraction of parameter BYTES whose resolved spec shards >= 1 dim.

    Diagnostic guard against silent whole-model replication (e.g. a config
    change making a dim non-divisible so `_fits` demotes it): callers assert
    a floor on the full-size config.  Accepts arrays or ShapeDtypeStructs
    (use jax.eval_shape to avoid materializing the full-size model).
    """
    shardings = param_shardings(params, mesh, rules)
    tot = sharded = 0
    for leaf, s in zip(jax.tree_util.tree_leaves(params),
                       jax.tree_util.tree_leaves(shardings)):
        nbytes = int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize
        tot += nbytes
        if any(ax is not None for ax in s.spec):
            sharded += nbytes
    return sharded / max(tot, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance batches shard on the data axis (leading dim)."""
    return NamedSharding(mesh, P("data"))
