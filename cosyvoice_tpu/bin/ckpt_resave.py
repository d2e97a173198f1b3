"""Assemble / merge full-system checkpoints for deployment.

Behavioral spec: reference `cosyvoice/bin/ckpt_resave.py:432-675` — combine
llm + flow + vocoder + frozen frontend models (speaker encoder / codec) into
one deployable set, with key/size-mismatch-TOLERANT loads (torch strict=False
over a base model: LoRA-only checkpoints overlay a base), LoRA merge, and
per-speaker reference-audio prompt extraction saved alongside the weights
(`speaker_infos`).

TPU-native form: `--out_dir` writes a deployable DIRECTORY that
`runtime.api.from_pretrained` loads directly —
  llm.npz / flow.npz / hift.npz   imported (+ LoRA-merged) param trees
                                  (utils/npz_io flat format; torch-free load)
  campplus.onnx / speech_tokenizer_v2.onnx / CosyVoice-BlankEN/   copied
  spk2info.npz                    per-speaker embeddings extracted from
                                  --ref_audio wavs through the native
                                  CAMPPlus port (reference get_spkemb2)
The legacy `--out_prefix` mode (bare .npz exports) is kept for tooling.
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np

from cosyvoice_tpu.utils.npz_io import flatten_params, save_params_npz


def clean_state_dict(raw, strip_prefix: str = "") -> dict:
    """Unwrap training metadata and normalize keys: accepts bare state dicts,
    {'state_dict': ..., 'version'/'speaker_infos': ...} wrappers (the
    reference resave output, ckpt_resave.py:665-675), and drops non-tensor
    entries (epoch/step/lr bookkeeping)."""
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        if not hasattr(v, "shape"):
            continue
        out[k.removeprefix(strip_prefix)] = v
    return out


def merge_state_dicts(base: dict, update: dict) -> dict:
    """torch load_state_dict(strict=False) equivalent over dicts: keys only
    in `base` keep base values (partial checkpoints — e.g. LoRA-only — work),
    shape mismatches keep base with a warning (the reference's size-mismatch
    tolerance), keys only in `update` are reported and dropped."""
    merged = dict(base)
    for k, v in update.items():
        if k not in base:
            print(f"  [resave] unexpected key dropped: {k}")
            continue
        if tuple(base[k].shape) != tuple(v.shape):
            print(f"  [resave] size mismatch for {k}: "
                  f"ckpt {tuple(v.shape)} vs base {tuple(base[k].shape)} — "
                  f"keeping base")
            continue
        merged[k] = v
    return merged


def load_sub_model(path, base_path=None, strip_prefix: str = ""):
    """Tolerantly load one sub-model state dict (+ optional base overlay)."""
    import torch

    sd = clean_state_dict(
        torch.load(path, map_location="cpu", weights_only=True),
        strip_prefix)
    if base_path:
        base = clean_state_dict(
            torch.load(base_path, map_location="cpu", weights_only=True),
            strip_prefix)
        sd = merge_state_dicts(base, sd)
    return sd


def merge_lora_overlay(params, lora_npz: str, r: int, alpha: int):
    from cosyvoice_tpu.train.lora import LoRAConfig, merge_lora

    data = np.load(lora_npz)
    overlay = {}
    for key in data.files:
        path, kind = key.rsplit(".lora_", 1)
        overlay.setdefault(path, {})["a" if kind == "A" else "b"] = data[key]
    params = merge_lora(params, overlay, LoRAConfig(r=r, alpha=alpha))
    print(f"merged LoRA overlay over {len(overlay)} kernels")
    return params


def extract_spk2info(model_dir: str, ref_audios: dict,
                     campplus_cfg=None) -> dict:
    """spk_id -> {'embedding'} via the native CAMPPlus port (reference
    ckpt_resave get_spkemb2: 16 kHz fbank -> campplus; short files are
    repeat-padded by the chunker there — lengths here are whole-file)."""
    from cosyvoice_tpu.models.campplus import (CAMPPlus, CAMPPlusConfig,
                                               import_campplus_onnx,
                                               make_campplus_frontend_fn)
    from cosyvoice_tpu.utils.audio import read_wav_16k

    ccfg = campplus_cfg or CAMPPlusConfig()
    fn = make_campplus_frontend_fn(
        CAMPPlus(ccfg),
        import_campplus_onnx(os.path.join(model_dir, "campplus.onnx"), ccfg))
    info = {}
    for spk, wav_path in ref_audios.items():
        wav = read_wav_16k(wav_path)
        info[spk] = {"embedding": np.asarray(fn(wav)).reshape(-1)}
        print(f"extracted speaker vector for {spk} from {wav_path}")
    return info


def assemble_dir(out_dir: str,
                 llm_pt=None, flow_pt=None, hift_pt=None,
                 base_llm_pt=None, base_flow_pt=None, base_hift_pt=None,
                 lora_npz=None, lora_r=8, lora_alpha=16,
                 campplus_onnx=None, s3_onnx=None, tokenizer_dir=None,
                 ref_audios=None, lm_cfg=None, flow_cfg=None, hift_cfg=None,
                 campplus_cfg=None) -> str:
    """One command -> one deployable dir that from_pretrained() loads."""
    from cosyvoice_tpu.models.flow import FlowConfig, import_flow_torch
    from cosyvoice_tpu.models.hift import HiFTConfig, import_hift_torch
    from cosyvoice_tpu.models.llm import LMConfig, import_qwen2lm_torch

    os.makedirs(out_dir, exist_ok=True)
    if llm_pt:
        sd = load_sub_model(llm_pt, base_llm_pt)
        params = import_qwen2lm_torch(sd, lm_cfg or LMConfig())
        if lora_npz:
            params = merge_lora_overlay(params, lora_npz, lora_r, lora_alpha)
        save_params_npz(os.path.join(out_dir, "llm.npz"), params)
        print(f"wrote {out_dir}/llm.npz")
    if flow_pt:
        sd = load_sub_model(flow_pt, base_flow_pt)
        save_params_npz(os.path.join(out_dir, "flow.npz"),
                        import_flow_torch(sd, flow_cfg or FlowConfig()))
        print(f"wrote {out_dir}/flow.npz")
    if hift_pt:
        sd = load_sub_model(hift_pt, base_hift_pt, strip_prefix="generator.")
        save_params_npz(os.path.join(out_dir, "hift.npz"),
                        import_hift_torch(sd, hift_cfg or HiFTConfig()))
        print(f"wrote {out_dir}/hift.npz")
    for src, name in ((campplus_onnx, "campplus.onnx"),
                      (s3_onnx, "speech_tokenizer_v2.onnx")):
        if src:
            shutil.copyfile(src, os.path.join(out_dir, name))
            print(f"copied {name}")
    if tokenizer_dir:
        dst = os.path.join(out_dir, "CosyVoice-BlankEN")
        if os.path.abspath(tokenizer_dir) != os.path.abspath(dst):
            shutil.copytree(tokenizer_dir, dst, dirs_exist_ok=True)
            print("copied tokenizer assets")
    if ref_audios:
        info = extract_spk2info(out_dir, ref_audios, campplus_cfg)
        np.savez(os.path.join(out_dir, "spk2info.npz"),
                 **{f"{spk}/{k}": v for spk, d in info.items()
                    for k, v in d.items()})
        print(f"wrote {out_dir}/spk2info.npz ({len(info)} speakers)")
    return out_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--llm_pt", default=None)
    p.add_argument("--flow_pt", default=None)
    p.add_argument("--hift_pt", default=None)
    p.add_argument("--base_llm_pt", default=None,
                   help="base checkpoint filled under a partial --llm_pt "
                        "(strict=False semantics; e.g. LoRA-only ckpts)")
    p.add_argument("--base_flow_pt", default=None)
    p.add_argument("--base_hift_pt", default=None)
    p.add_argument("--lora_npz", default=None, help="LoRA overlay to merge into the llm")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--campplus_onnx", default=None)
    p.add_argument("--s3_onnx", default=None)
    p.add_argument("--tokenizer_dir", default=None)
    p.add_argument("--ref_audio", action="append", default=[],
                   metavar="SPK=WAV", help="extract a speaker embedding from "
                   "WAV and register it as SPK in spk2info.npz (repeatable)")
    p.add_argument("--out_dir", default=None,
                   help="write a deployable model dir (from_pretrained loads it)")
    p.add_argument("--out_prefix", default=None,
                   help="legacy: write bare <prefix>.<model>.npz files")
    args = p.parse_args()
    assert args.out_dir or args.out_prefix, "need --out_dir or --out_prefix"

    if args.out_dir:
        refs = dict(s.split("=", 1) for s in args.ref_audio)
        assemble_dir(args.out_dir, llm_pt=args.llm_pt, flow_pt=args.flow_pt,
                     hift_pt=args.hift_pt, base_llm_pt=args.base_llm_pt,
                     base_flow_pt=args.base_flow_pt,
                     base_hift_pt=args.base_hift_pt, lora_npz=args.lora_npz,
                     lora_r=args.lora_r, lora_alpha=args.lora_alpha,
                     campplus_onnx=args.campplus_onnx, s3_onnx=args.s3_onnx,
                     tokenizer_dir=args.tokenizer_dir, ref_audios=refs)
        return

    from cosyvoice_tpu.models.flow import FlowConfig, import_flow_torch
    from cosyvoice_tpu.models.hift import HiFTConfig, import_hift_torch
    from cosyvoice_tpu.models.llm import LMConfig, import_qwen2lm_torch

    if args.llm_pt:
        params = import_qwen2lm_torch(load_sub_model(args.llm_pt,
                                                     args.base_llm_pt),
                                      LMConfig())
        if args.lora_npz:
            params = merge_lora_overlay(params, args.lora_npz, args.lora_r,
                                        args.lora_alpha)
        np.savez(f"{args.out_prefix}.llm.npz", **flatten_params(params))
        print(f"wrote {args.out_prefix}.llm.npz")
    if args.flow_pt:
        np.savez(f"{args.out_prefix}.flow.npz", **flatten_params(
            import_flow_torch(load_sub_model(args.flow_pt, args.base_flow_pt),
                              FlowConfig())))
        print(f"wrote {args.out_prefix}.flow.npz")
    if args.hift_pt:
        sd = load_sub_model(args.hift_pt, args.base_hift_pt,
                            strip_prefix="generator.")
        np.savez(f"{args.out_prefix}.hift.npz",
                 **flatten_params(import_hift_torch(sd, HiFTConfig())))
        print(f"wrote {args.out_prefix}.hift.npz")


if __name__ == "__main__":
    main()
