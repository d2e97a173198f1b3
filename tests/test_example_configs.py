"""Every shipped example recipe must build its models from plain YAML.

The reference wires models from ~30 hyperpyyaml experiment configs under
examples/tts_vc/*/conf; here the equivalent recipes are plain-dict YAMLs fed
through cosyvoice_tpu.config.build_model.  Construction is validated with
jax.eval_shape (no weight allocation) so the full-size recipes stay cheap.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice_tpu.config import build_model, load_config

ROOT = os.path.join(os.path.dirname(__file__), "..", "examples")
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "tts_vc", "*", "conf", "*.yaml")))

MODEL_SECTIONS = ("llm", "flow", "hift", "bigvgan", "vits", "speaker")


def _build_all(path):
    conf = load_config(path)
    built = {}
    for sec in MODEL_SECTIONS:
        if sec in conf:
            c = dict(conf[sec])
            built[sec] = build_model(c.pop("kind"), c)
    return conf, built


def test_found_example_configs():
    assert len(CONFIGS) >= 5, CONFIGS


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_recipe_builds_and_inits(path):
    conf, built = _build_all(path)
    assert built, f"{path} defines no model sections"
    # every recipe carries the training section the CLI reads
    assert "train_conf" in conf

    k = jax.random.PRNGKey(0)
    for sec, (model, cfg) in built.items():
        if sec == "llm":
            text = jnp.zeros((1, 8), jnp.int32)
            pho = jnp.zeros((1, 8, 4), jnp.int32)
            st_shape = ((1, 10, cfg.codebooknum) if hasattr(cfg, "codebooknum")
                        else (1, 10))
            st = jnp.zeros(st_shape, jnp.int32)
            l1, l2 = jnp.asarray([8]), jnp.asarray([10])
            emb = jnp.zeros((1, getattr(cfg, "spk_embed_dim", 192)))
            kind = type(model).__name__
            if kind == "Qwen2LM":
                shapes = jax.eval_shape(lambda: model.init(k, text, l1, st, l2))
            elif kind == "TransformerLM":
                shapes = jax.eval_shape(
                    lambda: model.init(k, text, l1, st, l2, emb))
            elif kind == "TransformerLMPhoneme":
                # v1 phoneme LM: factored phoneme ids REPLACE the text stream
                shapes = jax.eval_shape(
                    lambda: model.init(k, pho, l1, st, l2, emb))
            else:  # phoneme family: (text, text_len, pho, pho_len, st, st_len, emb)
                shapes = jax.eval_shape(
                    lambda: model.init(k, text, l1, pho, l1, st, l2, emb))
        elif sec == "flow":
            tok = jnp.zeros((1, 10), jnp.int32)
            feat = jnp.zeros((1, 20, cfg.output_size))
            emb = jnp.zeros((1, cfg.spk_embed_dim))
            shapes = jax.eval_shape(lambda: model.init(
                {"params": k, "dropout": k},
                tok, jnp.asarray([10]), feat, jnp.asarray([20]), emb, k))
        elif sec == "hift":
            shapes = jax.eval_shape(lambda: model.init(
                {"params": k, "noise": k}, jnp.zeros((1, 12, cfg.in_channels))))
        elif sec == "bigvgan":
            tok = jnp.zeros((1, 12), jnp.int32)
            emb = jnp.zeros((1, cfg.speaker_embedding_dim))
            shapes = jax.eval_shape(lambda: model.init(
                k, tok, jnp.asarray([12]), emb))
        elif sec == "vits":
            tok = jnp.zeros((1, 12), jnp.int32)
            spec = jnp.zeros((1, 40, cfg.spec_channels))
            emb = jnp.zeros((1, cfg.gin_channels))
            shapes = jax.eval_shape(lambda: model.init(
                k, tok, jnp.asarray([12]), spec, jnp.asarray([40]), emb, k))
        elif sec == "speaker":
            fbank = jnp.zeros((1, 50, 80))
            spec = jnp.zeros((1, 40, cfg.spec_channels))
            shapes = jax.eval_shape(lambda: model.init(
                k, fbank, spec, jnp.asarray([40]), k))
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        assert n > 0, (path, sec)


def test_v2_recipe_matches_reference_constants():
    """Spot-check load-bearing constants (SURVEY.md appendix) in the base v2
    recipe: conf/cosyvoice.yaml:20,25-29,36-40,60-78,80-102,120-128."""
    conf = load_config(os.path.join(
        ROOT, "tts_vc", "cosyvoice2", "conf", "cosyvoice2.yaml"))
    assert conf["llm"]["speech_token_size"] == 6561
    assert conf["llm"]["sampling"] == dict(method="ras", top_p=0.8, top_k=25,
                                           win_size=10, tau_r=0.1)
    f = conf["flow"]
    assert (f["input_frame_rate"], f["token_mel_ratio"], f["pre_lookahead_len"]) == (25, 2, 3)
    assert f["cfm"]["n_timesteps"] == 10 and f["cfm"]["inference_cfg_rate"] == 0.7
    h = conf["hift"]
    assert list(h["upsample_rates"]) == [8, 5, 3] and h["istft_hop_len"] == 4
    fb = conf["data"]["fbank"]
    assert (fb["n_fft"], fb["hop"], fb["n_mels"], fb["fmax"]) == (1920, 480, 80, 8000)
    g = conf["gan_conf"]
    assert (g["mel_weight"], g["feat_match_weight"], g["tpr_weight"]) == (45.0, 2.0, 1.0)
