"""Native .npz parameter checkpoints.

The deployable-dir format (bin/ckpt_resave.py --out_dir) stores each
sub-model's imported JAX param tree as one flat .npz ("/"-joined dict paths),
so `from_pretrained` can load a deployment without torch or the original .pt
files — the TPU-native analog of the reference's assembled deployment
checkpoints (cosyvoice/bin/ckpt_resave.py:432-675).
"""
from __future__ import annotations

import numpy as np


def flatten_params(tree, prefix: str = "") -> dict:
    """Nested param dict -> {"a/b/c": np.ndarray}."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {prefix + "/".join(str(getattr(k, "key", k)) for k in kp):
            np.asarray(v) for kp, v in flat}


def unflatten_params(flat: dict) -> dict:
    """{"a/b/c": arr} -> nested dicts (inverse of flatten_params)."""
    out: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val)
    return out


def save_params_npz(path: str, tree) -> None:
    np.savez(path, **flatten_params(tree))


def load_params_npz(path: str) -> dict:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})
