"""User-facing CosyVoice2 API.

Behavioral spec: reference `cosyvoice/cli/cosyvoice.py` — CosyVoice2 class
(:128-174): per-mode `inference_*` generators that normalize + split the text
and loop over `model.tts()`, logging RTF per yielded chunk (:74).

Construction here is explicit (models + params + frontend) rather than the
reference's hyperpyyaml side-effect loading; `from_pretrained` assembles the
stack from a checkpoint directory (torch .pt checkpoints are imported through
the per-model importers).
"""
from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from cosyvoice_tpu.runtime.frontend import CosyVoiceFrontEnd
from cosyvoice_tpu.runtime.model import CosyVoice2Model

logger = logging.getLogger(__name__)


@dataclass
class CosyVoice2:
    frontend: CosyVoiceFrontEnd
    model: CosyVoice2Model
    sample_rate: int = 24000

    def list_available_spks(self) -> list[str]:
        return list(self.frontend.spk2info.keys())

    # ------------------------------------------------------------------

    def _run(self, model_input: dict, stream: bool, speed: float,
             rng=None) -> Iterator[dict]:
        text = model_input["text"]
        ptext = model_input.get("prompt_text", np.zeros(0, np.int32))
        full_text = np.concatenate([ptext, text]).astype(np.int32)
        start = time.time()
        for out in self.model.tts(
                text_tokens=full_text,
                prompt_text_len=len(ptext),
                llm_prompt_speech_token=model_input.get(
                    "llm_prompt_speech_token", np.zeros(0, np.int32)),
                flow_prompt_speech_token=model_input.get(
                    "flow_prompt_speech_token", np.zeros(0, np.int32)),
                prompt_speech_feat=model_input.get(
                    "prompt_speech_feat", np.zeros((0, 80), np.float32)),
                flow_embedding=model_input["flow_embedding"],
                stream=stream, speed=speed, rng=rng):
            audio_dur = len(out["tts_speech"]) / self.sample_rate
            rtf = (time.time() - start) / max(audio_dur, 1e-6)
            logger.info("yield speech len %.2f, rtf %f", audio_dur, rtf)
            yield out
            start = time.time()

    # ---- reference API surface (cli/cosyvoice.py:67-174) -------------

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0,
                      text_frontend=True, rng=None):
        for seg in self.frontend.text_normalize(tts_text) if text_frontend else [tts_text]:
            yield from self._run(self.frontend.frontend_sft(seg, spk_id),
                                 stream, speed, rng)

    def inference_zero_shot(self, tts_text, prompt_text, prompt_speech_16k,
                            stream=False, speed=1.0, text_frontend=True, rng=None):
        prompt_text_n = self.frontend.text_normalize(prompt_text, split=False) \
            if text_frontend else prompt_text
        segs = self.frontend.text_normalize(tts_text) if text_frontend else [tts_text]
        for seg in segs:
            if len(seg) < 0.5 * len(prompt_text_n):
                logger.warning("synthesis text %s too short than prompt %s",
                               seg, prompt_text_n)
            yield from self._run(
                self.frontend.frontend_zero_shot(seg, prompt_text_n,
                                                 prompt_speech_16k),
                stream, speed, rng)

    def inference_cross_lingual(self, tts_text, prompt_speech_16k, stream=False,
                                speed=1.0, text_frontend=True, rng=None):
        for seg in self.frontend.text_normalize(tts_text) if text_frontend else [tts_text]:
            yield from self._run(
                self.frontend.frontend_cross_lingual(seg, prompt_speech_16k),
                stream, speed, rng)

    def inference_instruct2(self, tts_text, instruct_text, prompt_speech_16k,
                            stream=False, speed=1.0, text_frontend=True, rng=None):
        for seg in self.frontend.text_normalize(tts_text) if text_frontend else [tts_text]:
            yield from self._run(
                self.frontend.frontend_instruct2(seg, instruct_text,
                                                 prompt_speech_16k),
                stream, speed, rng)

    def inference_vc(self, source_speech_16k, prompt_speech_16k, stream=False,
                     speed=1.0, rng=None):
        mi = self.frontend.frontend_vc(source_speech_16k, prompt_speech_16k)
        session: dict = {"hift": None}
        tokens = mi["source_speech_token"]
        if not stream:
            wav = self.model.token2wav(tokens, mi["flow_prompt_speech_token"],
                                       mi["prompt_speech_feat"],
                                       mi["flow_embedding"], 0, session,
                                       finalize=True, speed=speed)
            yield {"tts_speech": wav}
            return
        hop, la = self.model.token_hop_len, self.model.pre_lookahead_len
        off = 0
        while len(tokens) - off >= hop + la:
            yield {"tts_speech": self.model.token2wav(
                tokens[: off + hop + la], mi["flow_prompt_speech_token"],
                mi["prompt_speech_feat"], mi["flow_embedding"], off, session,
                finalize=False)}
            off += hop
        yield {"tts_speech": self.model.token2wav(
            tokens, mi["flow_prompt_speech_token"], mi["prompt_speech_feat"],
            mi["flow_embedding"], off, session, finalize=True)}


def from_pretrained(model_dir: str, tokenizer_path: Optional[str] = None,
                    max_decode_tokens: int = 1600,
                    fp16: bool = False, quant: str = "none",
                    lm_cfg=None, flow_cfg=None, hift_cfg=None,
                    campplus_cfg=None, s3_cfg=None,
                    reference_noise: bool = True,
                    flow_context_tokens: Optional[int] = None) -> CosyVoice2:
    """Assemble CosyVoice2 from a reference checkpoint directory
    (llm.pt / flow.pt / hift.pt + campplus.onnx + speech_tokenizer_v2.onnx
    + Qwen tokenizer assets), mirroring what `CosyVoice2.__init__` +
    `CosyVoiceFrontEnd.__init__` wire up in the reference
    (cli/cosyvoice.py:128-144, cli/frontend.py:37-66).  The two frozen ONNX
    models are imported into the native JAX ports (models/campplus,
    models/s3tokenizer) via the pure-python onnx reader; if either file is
    missing the frontend is built without it and only modes that need it
    (zero-shot / cross-lingual / instruct2 / vc) will assert.

    fp16=True mirrors the reference's half-precision serving lever
    (cli/cosyvoice.py:30, cli/model.py:43-45): on TPU that means bf16 LM
    params + bf16 flow estimator with the fused-attention fast path.
    quant="int8" additionally stores the LM projection weights int8
    (weight-only, per-channel — utils/quant.py) to halve decode HBM traffic;
    int8 is greedy-agreement-gated vs the fp path (tests/test_llm.py;
    0.94 teacher-forced argmax agreement at the full 0.5B scale, bench.py).
    quant="int4" packs two weight rows per byte and decodes through the
    Pallas dequant matmul (ops/pallas/int4_matmul.py) — EXPERIMENTAL: naive
    RTN at 4 bits measures only 0.15 full-scale greedy agreement and the
    B=1 decode stage is slower than int8 (per-call kernel overhead dominates
    the saved bandwidth); use int8 unless you have validated int4 output
    quality on your own checkpoint.

    The *_cfg keywords override the full-size default model configs (used by
    tests and downsized deployments).
    """
    import dataclasses
    import os

    import torch

    from cosyvoice_tpu.models.flow import (CausalMaskedDiffWithXvec, FlowConfig,
                                           import_flow_torch)
    from cosyvoice_tpu.models.hift import (HiFTConfig, HiFTGenerator,
                                           import_hift_torch)
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, import_qwen2lm_torch
    from cosyvoice_tpu.tokenizer.text import QwenTokenizer

    def load(name):
        return torch.load(os.path.join(model_dir, name), map_location="cpu",
                          weights_only=True)

    def load_params(stem, import_fn):
        """Sub-model params: prefer the native .npz (deployable dirs written
        by bin/ckpt_resave.py --out_dir — no torch needed), fall back to the
        reference-format .pt through the torch importer."""
        npz = os.path.join(model_dir, f"{stem}.npz")
        if os.path.exists(npz):
            from cosyvoice_tpu.utils.npz_io import load_params_npz
            return load_params_npz(npz)
        return import_fn(load(f"{stem}.pt"))

    lm_cfg = lm_cfg or LMConfig()
    flow_cfg = flow_cfg or FlowConfig()
    hift_cfg = hift_cfg or HiFTConfig()
    if fp16:
        import jax

        from cosyvoice_tpu.utils.dtype import to_bf16
        on_tpu = jax.default_backend() == "tpu"
        flow_cfg = dataclasses.replace(flow_cfg, encoder_dtype="bfloat16",
                                       estimator=dataclasses.replace(
            flow_cfg.estimator, dtype="bfloat16", approx_gelu=True,
            fused_attention=on_tpu))
        hift_cfg = dataclasses.replace(hift_cfg, dtype="bfloat16",
                                       approx_sin=True, lane_pack=on_tpu)
        # NOTE: qwen.fused_cache_update (the Pallas decode-attention kernel)
        # stays OFF here — its fixed per-call cost only amortizes at B >= ~8
        # (measured: 654 vs 545 us/step at B=1); the batched serving paths
        # (bench.py, BatchedSynthesizer/ServingEngine callers) enable it.
    if quant in ("int8", "int4"):
        lm_cfg = dataclasses.replace(
            lm_cfg, qwen=dataclasses.replace(lm_cfg.qwen, quant=quant))
    llm = Qwen2LM(lm_cfg)
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    hift = HiFTGenerator(hift_cfg)
    llm_params = load_params("llm", lambda sd: import_qwen2lm_torch(sd, lm_cfg))
    flow_params = load_params("flow", lambda sd: import_flow_torch(sd, flow_cfg))
    hift_params = load_params("hift", lambda sd: import_hift_torch(
        {k.removeprefix("generator."): v for k, v in sd.items()}, hift_cfg))
    if fp16:
        llm_params = to_bf16(llm_params)
        # serving-dtype param subtrees matching the config knobs above: the
        # estimator and the conformer encoder run bf16; the token embedding,
        # projections, and CFM bookkeeping stay fp32
        flow_params = dict(flow_params)
        flow_params["params"] = dict(flow_params["params"])
        flow_params["params"]["decoder"] = dict(flow_params["params"]["decoder"])
        flow_params["params"]["decoder"]["estimator"] = to_bf16(
            flow_params["params"]["decoder"]["estimator"])
        flow_params["params"]["encoder"] = to_bf16(
            flow_params["params"]["encoder"])
    if quant in ("int8", "int4"):  # after the bf16 cast so scales stay f32
        from cosyvoice_tpu.utils.quant import (quantize_qwen_int4,
                                               quantize_qwen_int8)
        llm_params = (quantize_qwen_int8 if quant == "int8"
                      else quantize_qwen_int4)(llm_params)
    if fp16:
        hift_params = to_bf16(hift_params)
    flow_noise = None
    if reference_noise and flow_cfg.output_size == 80:
        # reproduce the reference's seed-0 pinned CFM noise buffer so wav
        # output is allclose to the reference (flow_matching.py:212-213)
        from cosyvoice_tpu.models.flow import reference_rand_noise
        flow_noise = reference_rand_noise(flow_cfg.cfm.noise_frames)
    model = CosyVoice2Model(
        llm=llm, flow=flow, hift=hift,
        llm_params=llm_params,
        flow_params=flow_params,
        hift_params=hift_params,
        max_decode_tokens=max_decode_tokens,
        flow_noise=flow_noise,
        # streaming flow context window (CosyVoice2Model doc): bounds each
        # chunk's flow cost for long streams; None keeps the reference's
        # full-prefix recompute semantics
        flow_context_tokens=flow_context_tokens)
    tok = QwenTokenizer(tokenizer_path or os.path.join(model_dir, "CosyVoice-BlankEN"))
    spk2info = {}
    spk2info_npz = os.path.join(model_dir, "spk2info.npz")
    spk2info_path = os.path.join(model_dir, "spk2info.pt")
    if os.path.exists(spk2info_npz):  # native table (ckpt_resave --ref_audio)
        from cosyvoice_tpu.utils.npz_io import load_params_npz
        spk2info = {k: {"embedding": np.asarray(v["embedding"]).reshape(-1)}
                    for k, v in load_params_npz(spk2info_npz).items()}
    elif os.path.exists(spk2info_path):  # sft speaker table (frontend.py:56)
        raw = torch.load(spk2info_path, map_location="cpu", weights_only=False)
        spk2info = {k: {"embedding": np.asarray(v["embedding"]).reshape(-1)}
                    for k, v in raw.items()}

    # frozen frontend models (cli/frontend.py:50-66): onnx weights -> JAX ports
    spk_embedder = None
    campplus_path = os.path.join(model_dir, "campplus.onnx")
    if os.path.exists(campplus_path):
        from cosyvoice_tpu.models.campplus import (CAMPPlus, CAMPPlusConfig,
                                                   import_campplus_onnx,
                                                   make_campplus_frontend_fn)
        ccfg = campplus_cfg or CAMPPlusConfig()
        spk_embedder = make_campplus_frontend_fn(
            CAMPPlus(ccfg), import_campplus_onnx(campplus_path, ccfg))
    speech_tokenizer = None
    st_path = os.path.join(model_dir, "speech_tokenizer_v2.onnx")
    if os.path.exists(st_path):
        from cosyvoice_tpu.models.s3tokenizer import (S3Config, S3TokenizerV2,
                                                      import_s3tokenizer_onnx,
                                                      make_s3_frontend_fn)
        scfg = s3_cfg or S3Config()
        speech_tokenizer = make_s3_frontend_fn(
            S3TokenizerV2(scfg), import_s3tokenizer_onnx(st_path, scfg))

    frontend = CosyVoiceFrontEnd(tokenizer=tok, spk2info=spk2info,
                                 speech_tokenizer=speech_tokenizer,
                                 spk_embedder=spk_embedder)
    return CosyVoice2(frontend=frontend, model=model)


@dataclass
class CosyVoice:
    """v1 user API (reference cli/cosyvoice.py:24-126): sft / zero-shot /
    cross-lingual / instruct / vc over the v1 streaming engine."""

    frontend: CosyVoiceFrontEnd
    model: object  # runtime.model.CosyVoiceV1Model
    sample_rate: int = 22050

    def list_available_spks(self):
        return list(self.frontend.spk2info.keys())

    def _run(self, mi: dict, stream: bool, speed: float, rng=None):
        text = mi["text"]
        ptext = mi.get("prompt_text", np.zeros(0, np.int32))
        start = time.time()
        for out in self.model.tts(
                text_tokens=np.concatenate([ptext, text]).astype(np.int32),
                prompt_text_len=len(ptext),
                llm_prompt_speech_token=mi.get("llm_prompt_speech_token",
                                               np.zeros(0, np.int32)),
                flow_prompt_speech_token=mi.get("flow_prompt_speech_token",
                                                np.zeros(0, np.int32)),
                prompt_speech_feat=mi.get("prompt_speech_feat",
                                          np.zeros((0, 80), np.float32)),
                flow_embedding=mi["flow_embedding"],
                llm_embedding=mi.get("llm_embedding"),
                stream=stream, speed=speed, rng=rng):
            dur = len(out["tts_speech"]) / self.sample_rate
            logger.info("yield speech len %.2f, rtf %f", dur,
                        (time.time() - start) / max(dur, 1e-6))
            yield out
            start = time.time()

    def inference_sft(self, tts_text, spk_id, stream=False, speed=1.0,
                      text_frontend=True, rng=None):
        for seg in (self.frontend.text_normalize(tts_text) if text_frontend
                    else [tts_text]):
            yield from self._run(self.frontend.frontend_sft(seg, spk_id),
                                 stream, speed, rng)

    def inference_zero_shot(self, tts_text, prompt_text, prompt_speech_16k,
                            stream=False, speed=1.0, text_frontend=True, rng=None):
        ptxt = (self.frontend.text_normalize(prompt_text, split=False)
                if text_frontend else prompt_text)
        for seg in (self.frontend.text_normalize(tts_text) if text_frontend
                    else [tts_text]):
            yield from self._run(
                self.frontend.frontend_zero_shot(seg, ptxt, prompt_speech_16k),
                stream, speed, rng)

    def inference_cross_lingual(self, tts_text, prompt_speech_16k, stream=False,
                                speed=1.0, text_frontend=True, rng=None):
        for seg in (self.frontend.text_normalize(tts_text) if text_frontend
                    else [tts_text]):
            yield from self._run(
                self.frontend.frontend_cross_lingual(seg, prompt_speech_16k),
                stream, speed, rng)

    def inference_instruct(self, tts_text, spk_id, instruct_text, stream=False,
                           speed=1.0, text_frontend=True, rng=None):
        for seg in (self.frontend.text_normalize(tts_text) if text_frontend
                    else [tts_text]):
            yield from self._run(
                self.frontend.frontend_instruct(seg, spk_id, instruct_text),
                stream, speed, rng)

    def inference_vc(self, source_speech_16k, prompt_speech_16k, stream=False,
                     speed=1.0, rng=None):
        mi = self.frontend.frontend_vc(source_speech_16k, prompt_speech_16k)
        session = {"hift": None, "mel_overlap": None, "flow_cache": None}
        tokens = list(mi["source_speech_token"])
        if not stream:
            yield {"tts_speech": self.model.token2wav(
                np.asarray(tokens), mi["flow_prompt_speech_token"],
                mi["prompt_speech_feat"], mi["flow_embedding"], session,
                finalize=True, speed=speed)}
            return
        hop = self.model.token_min_hop_len
        while len(tokens) >= hop + self.model.token_overlap_len:
            chunk = np.asarray(tokens[: hop + self.model.token_overlap_len])
            yield {"tts_speech": self.model.token2wav(
                chunk, mi["flow_prompt_speech_token"], mi["prompt_speech_feat"],
                mi["flow_embedding"], session, finalize=False)}
            tokens = tokens[hop:]
            hop = min(self.model.token_max_hop_len,
                      int(hop * self.model.stream_scale_factor))
        yield {"tts_speech": self.model.token2wav(
            np.asarray(tokens), mi["flow_prompt_speech_token"],
            mi["prompt_speech_feat"], mi["flow_embedding"], session,
            finalize=True)}
