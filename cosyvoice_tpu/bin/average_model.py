"""Checkpoint averaging CLI (reference `cosyvoice/bin/average_model.py`)."""
from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_dir", required=True, help="orbax checkpoint dir")
    p.add_argument("--dst_path", required=True, help="output .npz of params")
    p.add_argument("--num", type=int, default=5, help="average newest N")
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    from cosyvoice_tpu.train.checkpoint import average_checkpoints

    with ocp.CheckpointManager(args.src_dir) as mgr:
        step = mgr.latest_step()
        example = mgr.restore(step)
    avg = average_checkpoints(args.src_dir, example, last_n=args.num)
    flat = jax.tree_util.tree_flatten_with_path(avg)[0]
    out = {"/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
           for kp, v in flat}
    np.savez(args.dst_path, **out)
    print(f"averaged {args.num} checkpoints -> {args.dst_path} "
          f"({len(out)} tensors)")


if __name__ == "__main__":
    main()
