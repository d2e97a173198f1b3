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
import os

import numpy as np

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
    p.add_argument("--mesh_dcn_data", type=int, default=1,
                   help="data-parallel degree across DCN-connected slices")
    p.add_argument("--epochs", type=int, default=200)
    # multi-host: pass the jax.distributed triple (or rely on TPU pod
    # auto-detection / JAX_COORDINATOR_ADDRESS env); rank/world_size for the
    # data shards then come from jax.process_index()/process_count().
    # Explicit --rank/--world_size override for single-process data slicing.
    p.add_argument("--coordinator_address", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--rank", type=int, default=None)
    p.add_argument("--world_size", type=int, default=None)
    p.add_argument("--lora", action="store_true",
                   help="LoRA finetune: train only low-rank adapters over "
                        "the frozen base (also enabled by lora_conf.enabled "
                        "in the recipe); adapters checkpoint to the model "
                        "dir and export as lora.npz for ckpt_resave merge")
    p.add_argument("--data_format", choices=["jsonl", "spk_json", "parquet"],
                   default="jsonl",
                   help="train_data shard format: jsonl lines or the "
                        "speaker-keyed JSON production corpus")
    p.add_argument("--s3_ckpt", default=None,
                   help="frozen speech-tokenizer weights for online-codec "
                        "labels (.onnx); random-init if omitted")
    p.add_argument("--spk_ckpt", default=None,
                   help="frozen SpeakerEmbedding torch .pt for online spk "
                        "vectors; random-init if omitted")
    return p.parse_args()


def make_dataset(list_file, conf, tokenizer, rank, world_size, epoch,
                 gan=False, with_f0=False, data_format="jsonl"):
    shards = [l.strip() for l in open(list_file) if l.strip()]
    shards = pp.shard_list(shards, rank, world_size, epoch=epoch)
    if data_format == "parquet":
        # v1 corpus format (processor.py:29-57): wav bytes + offline tokens
        # + utt/spk embeddings in the rows
        opener = pp.parquet_opener
        pre = [pp.decode_audio_bytes(), pp.parse_embedding()]
    elif data_format == "spk_json":
        opener = pp.spk_json_source
        pre = []
    else:
        opener = pp.jsonl_opener
        pre = []
    stages = pre + [
        pp.filter_samples(**conf.get("filter", {})),
        pp.resample(conf.get("sample_rate", 24000)),
        pp.compute_fbank(**conf.get("fbank", {})),
    ]
    if with_f0:
        stages.append(pp.compute_f0(sr=conf.get("sample_rate", 24000)))
    if conf.get("batch_type", "dynamic") == "static":
        # multi-host SPMD needs identical local batch/shape on every process
        batcher = pp.static_batch(conf.get("batch_size", 8),
                                  drop_last=conf.get("drop_last", world_size > 1))
    else:
        batcher = pp.dynamic_batch(conf.get("max_frames_in_batch", 2000))
    stages += [
        pp.tokenize(tokenizer),
        pp.shuffle(conf.get("shuffle_buf", 10000)),
        pp.sort_by_feat_len(conf.get("sort_buf", 500)),
        batcher,
        pp.padding(gan=gan, static_lens=conf.get("static_lens")),
    ]
    return pp.Pipeline(shards, opener, *stages)


def main():
    args = get_args()
    from cosyvoice_tpu.parallel import distributed as dist
    from cosyvoice_tpu.utils.cache import enable_compilation_cache

    dist.init(args.coordinator_address, args.num_processes, args.process_id)
    if args.rank is None:
        args.rank, args.world_size = dist.rank_and_world()
    args.world_size = args.world_size or 1
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)
    conf = load_config(args.config)
    model_conf = dict(conf[args.model])
    kind = model_conf.pop("kind")
    model, _ = build_model(kind, model_conf)
    train_conf = conf.get("train_conf", {})

    mesh = make_mesh(args.mesh_data, args.mesh_model,
                     dcn_data=args.mesh_dcn_data)
    tokenizer = (QwenTokenizer(args.tokenizer_path) if args.tokenizer_path
                 else ByteTokenizer())

    if args.model == "llm" and "phoneme" in kind:
        run_phoneme_llm_training(args, conf, model, kind, train_conf,
                                 tokenizer, mesh)
        return

    # init params from one batch
    is_gan = args.model in ("hift", "bigvgan", "vits")
    ds = make_dataset(args.train_data, conf.get("data", {}), tokenizer,
                      args.rank, args.world_size, 0,
                      gan=is_gan, with_f0=(args.model == "hift"),
                      data_format=args.data_format)
    first = next(iter(ds))
    from cosyvoice_tpu.train.executor import arrays_only
    b0 = {k: jnp.asarray(v) for k, v in arrays_only(first).items()}
    rng = jax.random.PRNGKey(train_conf.get("seed", 1986))
    if args.model == "llm" and kind == "transformer_lm":
        # v1 LM (llm.py:42-237): spk embedding in the prefix, parquet-style
        # batches carry utt/spk embeddings (processor.py padding :426-429)
        params = model.init(rng, b0["text_token"], b0["text_token_len"],
                            b0["speech_token"], b0["speech_token_len"],
                            b0["embedding"])

        def loss_fn(p, batch, r):
            out = model.apply(p, batch["text_token"], batch["text_token_len"],
                              batch["speech_token"], batch["speech_token_len"],
                              batch["embedding"])
            return out["loss"], {"acc": out["acc"]}

        rules = []
    elif args.model == "llm":
        params = model.init(rng, b0["text_token"], b0["text_token_len"],
                            b0["speech_token"], b0["speech_token_len"])
        loss_fn = llm_loss_fn(model)
        rules = LM_RULES
    elif args.model == "flow":
        params = model.init({"params": rng, "dropout": rng},
                            b0["speech_token"], b0["speech_token_len"],
                            b0["speech_feat"], b0["speech_feat_len"],
                            b0["embedding"], rng)
        loss_fn = flow_loss_fn(model)
        rules = []
    else:  # hift / bigvgan / vits: two-optimizer GAN training
        run_gan_training(args, conf, model, train_conf, tokenizer, rng, b0)
        return

    params, _ = shard_params(params, mesh, rules)
    # LoRA finetune (reference loralib/utils.py:11-223 + the *_lora.yaml
    # recipes): the optimizer state and train step cover ONLY the low-rank
    # overlay; the frozen base is closed over by the wrapped loss.
    lora_conf = conf.get("lora_conf", {})
    use_lora = bool(lora_conf.get("enabled")) or args.lora
    if use_lora:
        from cosyvoice_tpu.train.lora import (LoRAConfig, init_lora,
                                              lora_loss_fn, lora_state_dict)
        pats = lora_conf.get("patterns",
                             ["q_proj", "k_proj", "v_proj", "o_proj"])
        lcfg = LoRAConfig(
            r=int(lora_conf.get("rank", 8)),
            alpha=int(lora_conf.get("alpha", 16)),
            target_patterns=(rf".*/({'|'.join(pats)})/kernel$",))
        base_params = params
        params = init_lora(base_params, lcfg, rng)
        assert params, f"lora patterns matched no kernels: {pats}"
        loss_fn = lora_loss_fn(base_params, loss_fn, lcfg)
        logging.info("LoRA finetune: %d adapters (r=%d alpha=%d)",
                     len(params), lcfg.r, lcfg.alpha)
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
                          args.rank, args.world_size, epoch,
                          data_format=args.data_format)
        cv = (list(make_dataset(args.cv_data, conf.get("data", {}), tokenizer,
                                0, 1, 0, data_format=args.data_format))
              if args.cv_data else None)
        state = ex.train_one_epoch(state, ds, cv_data=cv,
                                   to_device=lambda b: shard_batch(b, mesh))
        if use_lora:
            # deployable adapter export after every epoch: ckpt_resave
            # --lora_npz merges it into the base (W += alpha/r * B @ A)
            np.savez(os.path.join(args.model_dir, "lora.npz"),
                     **lora_state_dict(state.params))


def run_phoneme_llm_training(args, conf, model, kind, train_conf, tokenizer,
                             mesh):
    """Phoneme-conditioned LLM training (round-1 VERDICT missing #3).

    Behavioral spec: reference `bin/train_phoneme_online_codec.py:40-253` +
    `dataset/processor_kaldidata.py:217-380,497+`: spk-json corpus ->
    MFA-duration-aligned truncation -> 4-way factored phoneme ids
    (pho_token [B, T, 4]) -> online codec labels (frozen s3 tokenizer +
    SpeakerEmbedding run on the batch audio every step) -> CE training of
    the Qwen2LM_Phoneme* variants.
    """
    import numpy as np

    from cosyvoice_tpu.tokenizer.phoneme import PhonemeTokenizer
    from cosyvoice_tpu.train.executor import Executor, arrays_only
    from cosyvoice_tpu.train.online_codec import (OnlineCodecLabeler,
                                                  online_codec_epoch)

    dconf = conf.get("data", {})
    pho_tok = PhonemeTokenizer(dconf["phoneme_dict"])
    hop = dconf.get("fbank", {}).get("hop", 480)

    def make_ds(epoch):
        shards = [l.strip() for l in open(args.train_data) if l.strip()]
        shards = pp.shard_list(shards, args.rank, args.world_size, epoch=epoch)
        opener = (pp.spk_json_source if args.data_format == "spk_json"
                  else pp.jsonl_opener)
        if dconf.get("batch_type", "static") == "static":
            batcher = pp.static_batch(
                dconf.get("batch_size", 8),
                drop_last=dconf.get("drop_last", args.world_size > 1))
        else:
            batcher = pp.dynamic_batch(dconf.get("max_frames_in_batch", 2000))
        return pp.Pipeline(shards, opener, *[
            pp.filter_samples(**dconf.get("filter", {})),
            pp.truncate_phoneme_sequence(**dconf.get("truncate_phoneme", {}),
                                         seed=epoch),
            pp.resample(dconf.get("sample_rate", 24000)),
            pp.compute_fbank(**dconf.get("fbank", {})),
            pp.tokenize(tokenizer),
            pp.tokenize_phoneme(pho_tok),
            pp.shuffle(dconf.get("shuffle_buf", 10000), seed=epoch),
            pp.sort_by_feat_len(dconf.get("sort_buf", 500)),
            batcher,
            # gan=hop carries padded batch audio for the online labelers
            pp.padding(gan=hop, static_lens=dconf.get("static_lens")),
        ])

    # frozen label models (reference train_utils.py:434-457)
    s3_conf = dict(conf.get("s3", {"kind": "s3tokenizer"}))
    s3_model, s3_cfg = build_model(s3_conf.pop("kind"), s3_conf)
    if args.s3_ckpt:
        from cosyvoice_tpu.models.s3tokenizer import import_s3tokenizer_onnx
        s3_params = import_s3tokenizer_onnx(args.s3_ckpt, s3_cfg)
    else:
        logging.warning("no --s3_ckpt: online codec labels from RANDOM "
                        "tokenizer weights (smoke/test runs only)")
        mel0 = jnp.zeros((1, 8, s3_cfg.n_mels))
        s3_params = s3_model.init(jax.random.PRNGKey(0), mel0, jnp.asarray([8]))
    spk_model = spk_params = None
    if "speaker" in conf:
        spk_conf = dict(conf["speaker"])
        spk_model, spk_cfg = build_model(spk_conf.pop("kind"), spk_conf)
        if args.spk_ckpt:
            import torch as _torch

            from cosyvoice_tpu.models.speaker import \
                import_speaker_embedding_torch
            spk_params = import_speaker_embedding_torch(
                _torch.load(args.spk_ckpt, map_location="cpu",
                            weights_only=True), spk_cfg)
        else:
            logging.warning("no --spk_ckpt: RANDOM speaker-embedding weights")
            sr = dconf.get("sample_rate", 24000)
            spk_params = spk_model.init(
                {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
                jnp.zeros((1, sr)), jax.random.PRNGKey(3))
    labeler = OnlineCodecLabeler(s3_model=s3_model, s3_params=s3_params,
                                 spk_model=spk_model, spk_params=spk_params,
                                 sample_rate=dconf.get("sample_rate", 24000))

    first = labeler.label_batch(arrays_only(next(iter(make_ds(0)))),
                                np.random.default_rng(0), jax.random.PRNGKey(0))
    b0 = {k: jnp.asarray(v) for k, v in arrays_only(first).items()}
    rng = jax.random.PRNGKey(train_conf.get("seed", 1986))
    params = model.init(rng, b0["text_token"], b0["text_token_len"],
                        b0["pho_token"], b0["pho_token_len"],
                        b0["speech_token"], b0["speech_token_len"],
                        b0["embedding"])
    params, _ = shard_params(params, mesh, LM_RULES)

    def loss_fn(p, batch, r):
        out = model.apply(p, batch["text_token"], batch["text_token_len"],
                          batch["pho_token"], batch["pho_token_len"],
                          batch["speech_token"], batch["speech_token_len"],
                          batch["embedding"], r, deterministic=False,
                          rngs={"dropout": jax.random.fold_in(r, 1)})
        return out["loss"], {"acc": out["acc"]}

    tx, _ = make_optimizer(
        train_conf.get("optim", "adam"), train_conf.get("lr", 1e-3),
        train_conf.get("scheduler", "warmuplr"),
        train_conf.get("scheduler_conf", {"warmup_steps": 25000}),
        grad_clip=train_conf.get("grad_clip", 5.0),
        accum_grad=train_conf.get("accum_grad", 1))
    state = make_train_state(params, tx)
    step = make_train_step(loss_fn, tx)
    if latest_step(args.model_dir) is not None:
        state, at = restore_checkpoint(args.model_dir, state)
        logging.info("resumed from step %d", at)

    ex = Executor(train_step=step, model_dir=args.model_dir,
                  save_per_step=train_conf.get("save_per_step", -1),
                  log_interval=train_conf.get("log_interval", 100))
    ex.step = int(state.step)
    for epoch in range(args.epochs):
        state = online_codec_epoch(
            ex, state, labeler, iter(make_ds(epoch)),
            to_device=lambda b: shard_batch(b, mesh), seed=epoch)


def run_gan_training(args, conf, model, train_conf, tokenizer, rng, b0):
    """Two-optimizer GAN loop for the vocoders.

    Behavioral spec: reference `utils/executor.py:84-140`
    (train_one_epoc_gan: D step then G step per batch) +
    `utils/train_utils.py:166-196` (separate D optimizer/scheduler) +
    `hifigan/hifigan.py:35-103` (loss assembly).
    """
    from cosyvoice_tpu.models.discriminator import (MultiPeriodDiscriminator,
                                                    MultiResolutionDiscriminator,
                                                    MultiScaleDiscriminator,
                                                    MultipleDiscriminator)
    from cosyvoice_tpu.ops.mel import log_mel_spectrogram
    from cosyvoice_tpu.train.checkpoint import latest_step, restore_checkpoint
    from cosyvoice_tpu.train.executor import GanExecutor
    from cosyvoice_tpu.train.gan import (GanLossWeights, make_gan_loss_fns,
                                         make_gan_steps, make_vits_loss_fns)
    from cosyvoice_tpu.train.step import make_train_state

    gan_conf = conf.get("gan_conf", {})
    weights = GanLossWeights(
        mel=gan_conf.get("mel_weight", 45.0),
        feat_match=gan_conf.get("feat_match_weight", 2.0),
        tpr=gan_conf.get("tpr_weight", 1.0),
        tpr_tau=gan_conf.get("tpr_tau", 0.04))
    disc_cls = {"multiple": MultipleDiscriminator,
                "mpd": MultiPeriodDiscriminator,
                "msd": MultiScaleDiscriminator,
                "mrd": MultiResolutionDiscriminator}[
        gan_conf.get("discriminator", "multiple")]
    disc = disc_cls(**{k: tuple(v) if isinstance(v, list) else v
                       for k, v in gan_conf.get("discriminator_conf", {}).items()})
    sr = conf.get("data", {}).get("sample_rate", 24000)
    mel_specs = gan_conf.get("mel_specs", [{}])  # multi-res mel L1 configs
    mel_tfs = [lambda w, d=dict(d): log_mel_spectrogram(w, sr=sr, **d)
               for d in mel_specs]

    k0, k1, k2 = jax.random.split(rng, 3)
    wav0 = b0["speech"][:, :sr]  # 1 s slice is enough to build D params
    d_params = disc.init(k2, wav0, wav0)

    if args.model == "hift":
        g_params = model.init({"params": k0, "noise": k1}, b0["speech_feat"])

        def gen_apply(p, batch, r):
            return model.apply(p, batch["speech_feat"], rngs={"noise": r})

        g_lf, d_lf = make_gan_loss_fns(gen_apply, disc.apply, mel_tfs, weights)
    elif args.model == "bigvgan":
        g_params = model.init(k0, b0["speech_token"], b0["speech_token_len"],
                              b0["embedding"])

        def gen_apply(p, batch, r):
            return model.apply(p, batch["speech_token"],
                               batch["speech_token_len"], batch["embedding"],
                               deterministic=False, rngs={"dropout": r})

        g_lf, d_lf = make_gan_loss_fns(gen_apply, disc.apply, mel_tfs, weights)
    else:  # vits
        from cosyvoice_tpu.models.vits import linear_spectrogram
        vcfg = model.cfg
        n_fft = (vcfg.spec_channels - 1) * 2

        def with_spec(batch, r):
            spec = linear_spectrogram(batch["speech"], n_fft=n_fft,
                                      hop=vcfg.hop_length, win=n_fft)
            spec_len = batch["speech_len"] // vcfg.hop_length
            return spec, spec_len

        spec0, spec_len0 = with_spec(b0, None)
        g_params = model.init(k0, b0["speech_token"], b0["speech_token_len"],
                              spec0, spec_len0, b0["embedding"], k1)

        def gen_apply(p, batch, r):
            spec, spec_len = with_spec(batch, r)
            return model.apply(p, batch["speech_token"],
                               batch["speech_token_len"], spec, spec_len,
                               batch["embedding"], r, deterministic=False,
                               rngs={"dropout": r})

        g_lf, d_lf = make_vits_loss_fns(
            gen_apply, disc.apply, mel_tfs, vcfg.hop_length,
            vcfg.segment_size, weights,
            kl_weight=gan_conf.get("kl_weight", 1.0))

    tx_g, _ = make_optimizer(
        train_conf.get("optim", "adam"), train_conf.get("lr", 2e-4),
        train_conf.get("scheduler", "constantlr"),
        train_conf.get("scheduler_conf", {}),
        grad_clip=train_conf.get("grad_clip", 5.0))
    tx_d, _ = make_optimizer(
        train_conf.get("optim_d", "adam"), train_conf.get("lr_d", 2e-4),
        train_conf.get("scheduler_d", "constantlr"),
        train_conf.get("scheduler_d_conf", {}),
        grad_clip=train_conf.get("grad_clip", 5.0))
    g_step, d_step = make_gan_steps(g_lf, d_lf, tx_g, tx_d)
    g_state = make_train_state(g_params, tx_g)
    d_state = make_train_state(d_params, tx_d)

    if latest_step(args.model_dir) is not None:  # auto-resume both nets
        g_state, at = restore_checkpoint(args.model_dir, g_state)
        logging.info("resumed generator from step %d", at)
        if latest_step(args.model_dir + "_disc") is not None:
            d_state, _ = restore_checkpoint(args.model_dir + "_disc", d_state)

    ex = GanExecutor(train_step=g_step, disc_step=d_step,
                     model_dir=args.model_dir,
                     save_per_step=train_conf.get("save_per_step", -1),
                     log_interval=train_conf.get("log_interval", 100))
    ex.step = int(g_state.step)
    for epoch in range(args.epochs):
        ds = make_dataset(args.train_data, conf.get("data", {}), tokenizer,
                          args.rank, args.world_size, epoch,
                          gan=True, with_f0=(args.model == "hift"),
                          data_format=args.data_format)
        g_state, d_state = ex.train_one_epoch_gan(
            g_state, d_state, ds,
            to_device=lambda b: {k: jnp.asarray(v) for k, v in b.items()})


if __name__ == "__main__":
    main()
