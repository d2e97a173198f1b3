#!/usr/bin/env bash
# CosyVoice2 training driver (TPU).  Mirrors the reference's staged recipe
# (examples/tts_vc/cosyvoice2/bash/run_llm_pho.sh): train each sub-model with
# a retry-forever loop around the entry point (auto-resume picks up the
# latest checkpoint on every restart).
#
# Usage: bash run.sh <stage> <stop_stage>
#   stage 0: llm    stage 1: flow    stage 2: hift (GAN)
set -u
stage=${1:-0}
stop_stage=${2:-2}

conf=conf/cosyvoice2.yaml
train_list=data/train.list       # one jsonl shard path per line
cv_list=data/cv.list
exp=exp

train_forever() {  # $1=model $2=extra args
  local model=$1; shift
  until python -m cosyvoice_tpu.bin.train \
      --config $conf --model $model \
      --train_data $train_list --cv_data $cv_list \
      --model_dir $exp/$model "$@"; do
    echo "$model training crashed (code $?) — resuming from latest ckpt in 15 s"
    sleep 15
  done
}

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  train_forever llm --mesh_data -1 --mesh_model 1
fi
if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  train_forever flow
fi
if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  train_forever hift
fi
