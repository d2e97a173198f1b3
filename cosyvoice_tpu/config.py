"""Typed config system: plain YAML -> dataclass configs -> models.

Replaces the reference's hyperpyyaml object-instantiation configs
(`!new:`/`!ref` tags building torch modules directly, SURVEY.md L5;
e.g. examples/tts_vc/cosyvoice2/conf/cosyvoice.yaml) with a small explicit
registry: YAML holds plain dicts; `build_model(kind, overrides)` maps them
onto the frozen dataclass configs and constructs the matching linen module.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import yaml


def _mk(cls, d: Optional[dict]):
    """Recursively build dataclass `cls` from dict `d` (unknown keys error)."""
    if d is None:
        return cls()
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"{cls.__name__} has no field '{k}'")
        ft = fields[k].type
        sub = _DATACLASS_FIELDS.get((cls.__name__, k))
        if sub is not None and isinstance(v, dict):
            kw[k] = _mk(sub, v)
        elif isinstance(v, list):
            kw[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        else:
            kw[k] = v
    return cls(**kw)


def _registry():
    from cosyvoice_tpu.models.bigvgan import BigVGAN, BigVGANConfig
    from cosyvoice_tpu.models.campplus import CAMPPlus, CAMPPlusConfig
    from cosyvoice_tpu.models.conformer import ConformerConfig
    from cosyvoice_tpu.models.flow import (CFMConfig, CausalMaskedDiffWithXvec,
                                           EstimatorConfig, FlowConfig,
                                           FlowV1Config, MaskedDiffWithXvec,
                                           StreamMaskedDiffWithXvec)
    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.models.llm import (LMConfig, Qwen2LM, SamplingConfig,
                                          TransformerLM, TransformerLMConfig)
    from cosyvoice_tpu.models.llm_multicode import (MultiCodeLMConfig,
                                                    Qwen2LMPhonemeMultiCode)
    from cosyvoice_tpu.models.llm_phoneme import (PhonemeEmbedConfig,
                                                  PhonemeLMConfig,
                                                  Qwen2LMPhoneme,
                                                  Qwen2LMPhonemeSrc,
                                                  Qwen2LMPhonemeSrc2)
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.models.llm_v1_phoneme import (TransformerLMPhoneme,
                                                     TransformerLMPhonemeWithSpk,
                                                     V1PhonemeLMConfig,
                                                     WithSpkConfig)
    from cosyvoice_tpu.models.s3tokenizer import S3Config, S3TokenizerV2
    from cosyvoice_tpu.models.speaker import (SpeakerEmbedding,
                                              SpeakerEmbeddingConfig)
    from cosyvoice_tpu.models.vits import VitsConfig, VitsDecoder

    models = {
        "qwen2lm": (Qwen2LM, LMConfig),
        "transformer_lm": (TransformerLM, TransformerLMConfig),
        "transformer_lm_phoneme": (TransformerLMPhoneme, V1PhonemeLMConfig),
        "transformer_lm_phoneme_with_spk": (TransformerLMPhonemeWithSpk,
                                            WithSpkConfig),
        "qwen2lm_phoneme": (Qwen2LMPhoneme, PhonemeLMConfig),
        "qwen2lm_phoneme_src": (Qwen2LMPhonemeSrc, PhonemeLMConfig),
        "qwen2lm_phoneme_src2": (Qwen2LMPhonemeSrc2, PhonemeLMConfig),
        "qwen2lm_phoneme_multicode": (Qwen2LMPhonemeMultiCode, MultiCodeLMConfig),
        "flow": (CausalMaskedDiffWithXvec, FlowConfig),
        "flow_stream": (StreamMaskedDiffWithXvec, FlowConfig),
        "flow_v1": (MaskedDiffWithXvec, FlowV1Config),
        "hift": (HiFTGenerator, HiFTConfig),
        "bigvgan": (BigVGAN, BigVGANConfig),
        "vits": (VitsDecoder, VitsConfig),
        "campplus": (CAMPPlus, CAMPPlusConfig),
        "speaker_embedding": (SpeakerEmbedding, SpeakerEmbeddingConfig),
        "s3tokenizer": (S3TokenizerV2, S3Config),
    }
    sub = {
        ("LMConfig", "qwen"): Qwen2Config,
        ("LMConfig", "sampling"): SamplingConfig,
        ("TransformerLMConfig", "sampling"): SamplingConfig,
        ("TransformerLMConfig", "text_encoder"): ConformerConfig,
        ("TransformerLMConfig", "llm"): ConformerConfig,
        ("WithSpkConfig", "lm"): V1PhonemeLMConfig,
        ("WithSpkConfig", "spk"): SpeakerEmbeddingConfig,
        ("V1PhonemeLMConfig", "sampling"): SamplingConfig,
        ("V1PhonemeLMConfig", "text_encoder"): ConformerConfig,
        ("V1PhonemeLMConfig", "llm"): ConformerConfig,
        ("V1PhonemeLMConfig", "phoneme"): PhonemeEmbedConfig,
        ("PhonemeLMConfig", "sampling"): SamplingConfig,
        ("PhonemeLMConfig", "phoneme"): PhonemeEmbedConfig,
        ("PhonemeLMConfig", "encoder"): ConformerConfig,
        ("PhonemeLMConfig", "qwen"): Qwen2Config,
        ("MultiCodeLMConfig", "sampling"): SamplingConfig,
        ("MultiCodeLMConfig", "phoneme"): PhonemeEmbedConfig,
        ("MultiCodeLMConfig", "encoder"): ConformerConfig,
        ("MultiCodeLMConfig", "qwen"): Qwen2Config,
        ("FlowConfig", "encoder"): ConformerConfig,
        ("FlowConfig", "cfm"): CFMConfig,
        ("FlowConfig", "estimator"): EstimatorConfig,
        ("FlowV1Config", "encoder"): ConformerConfig,
        ("FlowV1Config", "cfm"): CFMConfig,
        ("FlowV1Config", "estimator"): EstimatorConfig,
        ("BigVGANConfig", "encoder1"): ConformerConfig,
        ("BigVGANConfig", "encoder2"): ConformerConfig,
        ("VitsConfig", "up_enc1"): ConformerConfig,
        ("VitsConfig", "up_enc2"): ConformerConfig,
        ("SpeakerEmbeddingConfig", "campplus"): CAMPPlusConfig,
    }
    return models, sub


_MODELS: dict = {}
_DATACLASS_FIELDS: dict = {}


def build_model(kind: str, overrides: Optional[dict] = None):
    """('qwen2lm', {...}) -> (linen module, config dataclass)."""
    if not _MODELS:
        models, sub = _registry()
        _MODELS.update(models)
        _DATACLASS_FIELDS.update(sub)
    cls, cfg_cls = _MODELS[kind]
    cfg = _mk(cfg_cls, overrides)
    return cls(cfg), cfg


def load_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def build_from_yaml(path: str, section: str):
    """YAML layout: {section: {kind: ..., <config fields>}}."""
    conf = load_config(path)[section]
    kind = conf.pop("kind")
    return build_model(kind, conf)
