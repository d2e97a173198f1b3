"""Re-head the speech-token LM as a standard HF Qwen2 checkpoint for serving.

Behavioral spec: reference `cosyvoice/bin/vllm_save_newckpt.py:5-45` and
`sglang_save_newckpt.py`: the CosyVoice2 LM is a Qwen2 body with a speech
embedding and an `llm_decoder` head bolted on; for vLLM/sglang serving they
rebuild it as a plain `Qwen2ForCausalLM` whose

  * `model.embed_tokens`  = speech_embedding (text goes in as input_embeds),
  * `lm_head`             = llm_decoder (with bias),
  * vocab padded up to a multiple of 64 (zero rows),
  * config: tie_word_embeddings=False, max_position_embeddings=1024,
    class renamed CosyVoice2ForCausalLM in config.json.

TPU-native framing: the in-repo decode loop (models/llm.py) is the TPU
serving path; this tool is the interchange format so the same trained LM can
be served by any HF-compatible engine (GPU vLLM/sglang included).

Usage:
  python -m cosyvoice_tpu.bin.export_serving_lm \
      --ckpt exp/llm --out exp/llm_hf [--config conf.yaml]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def rehead_state_dict(lm_params: dict, cfg, pad_to: int = 64):
    """Qwen2LM flax params -> (HF state dict, HF config kwargs).

    `cfg` is the LMConfig; the returned dict is keyed with HF
    Qwen2ForCausalLM names and padded to a `pad_to` vocab multiple.
    """
    from cosyvoice_tpu.models.qwen2 import export_qwen2_torch

    p = lm_params["params"] if "params" in lm_params else lm_params
    sd = export_qwen2_torch({"params": p["llm"]}, cfg.qwen)

    vocab = cfg.speech_token_size + 3
    feat = cfg.llm_input_size
    pad_vocab = ((vocab + pad_to - 1) // pad_to) * pad_to

    emb = np.zeros((pad_vocab, feat), np.float32)
    emb[:vocab] = np.asarray(p["speech_embedding"]["embedding"])
    sd["model.embed_tokens.weight"] = emb

    head_w = np.zeros((pad_vocab, cfg.llm_output_size), np.float32)
    head_w[:vocab] = np.asarray(p["llm_decoder"]["kernel"]).T
    head_b = np.zeros((pad_vocab,), np.float32)
    head_b[:vocab] = np.asarray(p["llm_decoder"]["bias"])
    sd["lm_head.weight"] = head_w
    sd["lm_head.bias"] = head_b

    q = cfg.qwen
    hf_cfg = dict(vocab_size=pad_vocab, hidden_size=q.hidden_size,
                  num_hidden_layers=q.num_layers,
                  num_attention_heads=q.num_heads,
                  num_key_value_heads=q.num_kv_heads,
                  intermediate_size=q.intermediate_size,
                  rope_theta=q.rope_theta, rms_norm_eps=q.rms_norm_eps,
                  tie_word_embeddings=False,
                  max_position_embeddings=1024)
    return sd, hf_cfg


def build_hf_model(lm_params: dict, cfg, pad_to: int = 64):
    """Construct a transformers Qwen2ForCausalLM carrying the re-headed
    weights (strict load validates the mapping)."""
    import torch
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    sd, hf_cfg = rehead_state_dict(lm_params, cfg, pad_to)
    model = Qwen2ForCausalLM(HFQwen2Config(**hf_cfg))
    # the llm_decoder head has a bias; stock Qwen2 lm_head does not — swap in
    # a bias Linear like the reference (vllm_save_newckpt.py:15-21) and mark
    # it in the config for the serving-side CosyVoice2ForCausalLM plugin
    model.lm_head = torch.nn.Linear(cfg.llm_output_size,
                                    hf_cfg["vocab_size"], bias=True)
    model.config.use_bias = True
    model.load_state_dict({k: torch.from_numpy(v.copy())
                           for k, v in sd.items()}, strict=True)
    model.eval()
    return model


def export_serving_lm(lm_params: dict, cfg, out_dir: str, pad_to: int = 64):
    model = build_hf_model(lm_params, cfg, pad_to)
    model.save_pretrained(out_dir, safe_serialization=False)
    # rename the architecture like the reference's sed on config.json
    cfg_path = os.path.join(out_dir, "config.json")
    with open(cfg_path) as f:
        conf = json.load(f)
    conf["architectures"] = ["CosyVoice2ForCausalLM"]
    conf.pop("bos_token_id", None)
    conf.pop("eos_token_id", None)
    with open(cfg_path, "w") as f:
        json.dump(conf, f, indent=2)
    return out_dir


def main():
    # pure host-side work; pin to CPU so orbax restore is device-independent
    # (a TPU-saved checkpoint restores fine on CPU, and vice versa)
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax model_dir written by cosyvoice_tpu.bin.train")
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None,
                    help="yaml with an `llm:` section (default: LMConfig())")
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()

    from cosyvoice_tpu.config import build_model, load_config

    if args.config:
        conf = dict(load_config(args.config)["llm"])
        kind = conf.pop("kind", "qwen2lm")
        _, cfg = build_model(kind, conf)
    else:
        from cosyvoice_tpu.models.llm import LMConfig

        cfg = LMConfig()

    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(args.ckpt)) as mgr:
        step = args.step if args.step is not None else mgr.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoint found under {args.ckpt}")
        raw = mgr.restore(step)
    params = raw["params"]          # TrainState field
    if "params" not in params:      # flax collection nesting
        params = {"params": params}
    export_serving_lm(params, cfg, args.out)
    print(f"exported step {step} -> {args.out}")


if __name__ == "__main__":
    main()
