"""Assemble / merge full-system checkpoints for deployment.

Behavioral spec: reference `cosyvoice/bin/ckpt_resave.py:432-675` (combine
llm + flow + speaker-encoder + codec into deployable .pt sets, merge LoRA).
Here: gather per-model params (torch .pt imports and/or orbax dirs), merge a
LoRA overlay into the base, and write one .npz per sub-model.
"""
from __future__ import annotations

import argparse

import numpy as np


def flatten(tree, prefix=""):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {prefix + "/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
            for kp, v in flat}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--llm_pt", default=None)
    p.add_argument("--flow_pt", default=None)
    p.add_argument("--hift_pt", default=None)
    p.add_argument("--lora_npz", default=None, help="LoRA overlay to merge into the llm")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--out_prefix", required=True)
    args = p.parse_args()

    import torch

    from cosyvoice_tpu.models.flow import FlowConfig, import_flow_torch
    from cosyvoice_tpu.models.hift import HiFTConfig, import_hift_torch
    from cosyvoice_tpu.models.llm import LMConfig, import_qwen2lm_torch

    def load(path):
        return torch.load(path, map_location="cpu", weights_only=True)

    if args.llm_pt:
        params = import_qwen2lm_torch(load(args.llm_pt), LMConfig())
        if args.lora_npz:
            from cosyvoice_tpu.train.lora import LoRAConfig, merge_lora

            data = np.load(args.lora_npz)
            overlay = {}
            for key in data.files:
                path, kind = key.rsplit(".lora_", 1)
                overlay.setdefault(path, {})["a" if kind == "A" else "b"] = data[key]
            params = merge_lora(params, overlay,
                                LoRAConfig(r=args.lora_r, alpha=args.lora_alpha))
            print(f"merged LoRA overlay over {len(overlay)} kernels")
        np.savez(f"{args.out_prefix}.llm.npz", **flatten(params))
        print(f"wrote {args.out_prefix}.llm.npz")
    if args.flow_pt:
        np.savez(f"{args.out_prefix}.flow.npz",
                 **flatten(import_flow_torch(load(args.flow_pt), FlowConfig())))
        print(f"wrote {args.out_prefix}.flow.npz")
    if args.hift_pt:
        sd = {k.removeprefix("generator."): v for k, v in load(args.hift_pt).items()}
        np.savez(f"{args.out_prefix}.hift.npz",
                 **flatten(import_hift_torch(sd, HiFTConfig())))
        print(f"wrote {args.out_prefix}.hift.npz")


if __name__ == "__main__":
    main()
