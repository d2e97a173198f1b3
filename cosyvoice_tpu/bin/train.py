"""Training entry point.

Behavioral spec: reference `cosyvoice/bin/train.py:39-158` (+ the
train_*_online_codec variants :40-253): pick the sub-model from the config,
build the dataset pipeline, wrap distributed, loop epochs with periodic
CV/checkpoint, auto-resume from the latest checkpoint.

TPU-native: Mesh(data, model) GSPMD replaces DDP/DeepSpeed; one jitted train
step; orbax checkpoints.  Usage:

  python -m cosyvoice_tpu.bin.train --config conf.yaml --model llm \
      --train_data data/train.list --model_dir exp/llm \
      --mesh_data 8 --mesh_model 1
"""
from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp

from cosyvoice_tpu.config import load_config, build_model
from cosyvoice_tpu.data import pipeline as pp
from cosyvoice_tpu.parallel.mesh import LM_RULES, make_mesh, shard_params
from cosyvoice_tpu.tokenizer.text import ByteTokenizer, QwenTokenizer
from cosyvoice_tpu.train.checkpoint import latest_step, restore_checkpoint
from cosyvoice_tpu.train.executor import Executor
from cosyvoice_tpu.train.optim import make_optimizer
from cosyvoice_tpu.train.step import (flow_loss_fn, llm_loss_fn,
                                      make_train_state, make_train_step,
                                      shard_batch)


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--model", required=True,
                   choices=["llm", "flow", "hift", "bigvgan", "vits"])
    p.add_argument("--train_data", required=True,
                   help="file with one jsonl shard path per line")
    p.add_argument("--cv_data", default=None)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)
    return p.parse_args()


def make_dataset(list_file, conf, tokenizer, rank, world_size, epoch):
    shards = [l.strip() for l in open(list_file) if l.strip()]
    shards = pp.shard_list(shards, rank, world_size, epoch=epoch)
    return pp.Pipeline(
        shards, pp.jsonl_opener,
        pp.filter_samples(**conf.get("filter", {})),
        pp.resample(conf.get("sample_rate", 24000)),
        pp.compute_fbank(**conf.get("fbank", {})),
        pp.tokenize(tokenizer),
        pp.shuffle(conf.get("shuffle_buf", 10000)),
        pp.sort_by_feat_len(conf.get("sort_buf", 500)),
        pp.dynamic_batch(conf.get("max_frames_in_batch", 2000)),
        pp.padding())


def main():
    args = get_args()
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    conf = load_config(args.config)
    model_conf = dict(conf[args.model])
    kind = model_conf.pop("kind")
    model, _ = build_model(kind, model_conf)
    train_conf = conf.get("train_conf", {})

    mesh = make_mesh(args.mesh_data, args.mesh_model)
    tokenizer = (QwenTokenizer(args.tokenizer_path) if args.tokenizer_path
                 else ByteTokenizer())

    # init params from one batch
    ds = make_dataset(args.train_data, conf.get("data", {}), tokenizer,
                      args.rank, args.world_size, 0)
    first = next(iter(ds))
    from cosyvoice_tpu.train.executor import arrays_only
    b0 = {k: jnp.asarray(v) for k, v in arrays_only(first).items()}
    rng = jax.random.PRNGKey(train_conf.get("seed", 1986))
    if args.model == "llm":
        params = model.init(rng, b0["text_token"], b0["text_token_len"],
                            b0["speech_token"], b0["speech_token_len"])
        loss_fn = llm_loss_fn(model)
        rules = LM_RULES
    elif args.model == "flow":
        params = model.init(rng, b0["speech_token"], b0["speech_token_len"],
                            b0["speech_feat"], b0["speech_feat_len"],
                            b0["embedding"], rng)
        loss_fn = flow_loss_fn(model)
        rules = []
    else:
        raise NotImplementedError(
            f"--model {args.model}: GAN vocoder training uses "
            "cosyvoice_tpu.train.gan (see tests/test_gan.py for the wiring)")

    params, _ = shard_params(params, mesh, rules)
    tx, _ = make_optimizer(
        train_conf.get("optim", "adam"), train_conf.get("lr", 1e-3),
        train_conf.get("scheduler", "warmuplr"),
        train_conf.get("scheduler_conf", {"warmup_steps": 25000}),
        grad_clip=train_conf.get("grad_clip", 5.0),
        accum_grad=train_conf.get("accum_grad", 1))
    state = make_train_state(params, tx)
    step = make_train_step(loss_fn, tx)

    if latest_step(args.model_dir) is not None:  # auto-resume
        state, at = restore_checkpoint(args.model_dir, state)
        logging.info("resumed from step %d", at)

    def cv_step(p, batch, r):
        loss, m = loss_fn(p, batch, r)
        return dict(m, loss=loss)

    ex = Executor(train_step=step, model_dir=args.model_dir,
                  save_per_step=train_conf.get("save_per_step", -1),
                  log_interval=train_conf.get("log_interval", 100),
                  cv_step=jax.jit(cv_step))
    ex.step = int(state.step)
    for epoch in range(args.epochs):
        ds = make_dataset(args.train_data, conf.get("data", {}), tokenizer,
                          args.rank, args.world_size, epoch)
        cv = (list(make_dataset(args.cv_data, conf.get("data", {}), tokenizer,
                                0, 1, 0)) if args.cv_data else None)
        state = ex.train_one_epoch(state, ds, cv_data=cv,
                                   to_device=lambda b: shard_batch(b, mesh))


if __name__ == "__main__":
    main()
