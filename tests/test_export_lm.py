"""Serving-LM re-head export (bin/export_serving_lm, reference
bin/vllm_save_newckpt.py:5-45): the exported HF Qwen2ForCausalLM must produce
the same speech-token logits as the in-repo Qwen2LM decode path."""
import json
import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.models.qwen2 import Qwen2Config, causal_prefill_bias

SMALL = LMConfig(
    qwen=Qwen2Config(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                     num_kv_heads=2, head_dim=8, intermediate_size=48),
    llm_input_size=32, llm_output_size=32, speech_token_size=20)


def _init_lm(rng):
    m = Qwen2LM(SMALL)
    p = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32),
               jnp.asarray([4]), jnp.zeros((1, 6), jnp.int32),
               jnp.asarray([6]))
    return m, p


def test_rehead_logits_match(rng):
    from cosyvoice_tpu.bin.export_serving_lm import build_hf_model

    m, p = _init_lm(rng)
    hf = build_hf_model(p, SMALL)
    vocab = SMALL.speech_token_size + 3          # 23
    assert hf.config.vocab_size == 64            # padded to 64 multiple

    B, T = 2, 7
    tok = rng.integers(0, vocab, (B, T))
    with torch.no_grad():
        logits_hf = hf(input_ids=torch.from_numpy(tok)).logits.numpy()

    # in-repo path: speech_embedding -> qwen body (causal) -> llm_decoder
    emb = m.apply(p, jnp.asarray(tok), method=Qwen2LM.speech_emb)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    bias = causal_prefill_bias(T, T, batch=B)
    hidden, _ = m.apply(p, emb, pos, bias, method=Qwen2LM.forward_hidden)
    logits_j = np.asarray(m.apply(p, hidden, method=Qwen2LM.decode_logits))

    np.testing.assert_allclose(logits_hf[..., :vocab], logits_j,
                               atol=2e-4, rtol=1e-3)
    # padded vocab rows are dead: zero weight + zero bias
    assert np.abs(logits_hf[..., vocab:]).max() == 0.0


def test_export_serving_lm_cli(tmp_path, rng, monkeypatch):
    """Full CLI: orbax checkpoint -> HF directory with renamed architecture."""
    import optax
    import yaml

    from cosyvoice_tpu.bin import export_serving_lm as cli
    from cosyvoice_tpu.train.checkpoint import save_checkpoint
    from cosyvoice_tpu.train.step import make_train_state

    _, p = _init_lm(rng)
    tx = optax.adam(1e-4)
    state = make_train_state(p, tx)
    ckpt_dir = str(tmp_path / "exp_llm")
    save_checkpoint(ckpt_dir, state, 3)

    conf = {"llm": {"kind": "qwen2lm",
                    "qwen": {"vocab_size": 64, "hidden_size": 32,
                             "num_layers": 2, "num_heads": 4,
                             "num_kv_heads": 2, "head_dim": 8,
                             "intermediate_size": 48},
                    "llm_input_size": 32, "llm_output_size": 32,
                    "speech_token_size": 20}}
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))
    out_dir = str(tmp_path / "hf_out")

    monkeypatch.setattr(sys, "argv", [
        "export_serving_lm", "--ckpt", ckpt_dir, "--out", out_dir,
        "--config", str(cfg_path)])
    cli.main()

    hf_conf = json.load(open(os.path.join(out_dir, "config.json")))
    assert hf_conf["architectures"] == ["CosyVoice2ForCausalLM"]
    assert hf_conf["vocab_size"] == 64
    assert hf_conf["tie_word_embeddings"] is False
    assert hf_conf["max_position_embeddings"] == 1024
    assert "bos_token_id" not in hf_conf
    assert any(f.startswith("pytorch_model") for f in os.listdir(out_dir))
