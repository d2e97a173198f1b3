"""Golden-dump harness (round-1 VERDICT missing #4 / next-round #6).

tools/dump_reference.py runs the torch reference flow + HiFT per stage on
CPU and dumps tokens/mel/wav plus the reference's pinned seed-0 CFM noise.
These tests consume the dump: the committed noise asset guards the torch
draw across versions, and the E2E test asserts our CosyVoice2Model
synthesis is wav-allclose (atol 1e-2, the BASELINE.md target) against the
reference when the noise is pinned through the production `flow_noise` hook.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(REPO, "cosyvoice_tpu", "assets", "reference_noise_512.npz")


def test_reference_noise_matches_committed_asset():
    """reference_rand_noise must reproduce the committed torch-seed-0 dump
    bit-for-bit (guards torch RNG stability across versions)."""
    from cosyvoice_tpu.models.flow import reference_rand_noise

    asset = np.load(ASSET)["rand_noise_80xT"]        # [1, 80, 512]
    ours = reference_rand_noise(512)                 # [1, 512, 80]
    np.testing.assert_array_equal(ours, asset.transpose(0, 2, 1))


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    out = tmp_path_factory.mktemp("golden") / "golden.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dump_reference.py"),
         "--out", str(out), "--n_tokens", "16", "--seed", "0"],
        env=env, cwd=REPO, capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-3000:]
    return np.load(out)


def test_e2e_wav_allclose_with_pinned_noise(golden):
    """tokens -> flow -> HiFT through OUR CosyVoice2Model orchestrator
    (padded-bucket flow, production noise hook, deterministic vocoder) must
    be allclose to the torch reference's per-stage dump."""
    import jax.numpy as jnp
    import torch

    from cosyvoice_tpu.models.flow import (CausalMaskedDiffWithXvec,
                                           import_flow_torch,
                                           reference_rand_noise)
    from cosyvoice_tpu.models.hift import HiFTGenerator, import_hift_torch
    from cosyvoice_tpu.runtime.model import CosyVoice2Model
    from tests.test_from_pretrained import (FLOW_CFG, HIFT_CFG, LM_CFG,
                                            _ref_flow_sd, _ref_hift_sd)
    from cosyvoice_tpu.models.llm import Qwen2LM

    # the dump used seeded random reference weights; rebuild identically
    flow_sd = _ref_flow_sd()
    hift_sd = {k.removeprefix("generator."): v
               for k, v in _ref_hift_sd().items()}
    flow = CausalMaskedDiffWithXvec(FLOW_CFG)
    hift = HiFTGenerator(HIFT_CFG, deterministic=True)
    flow_params = import_flow_torch(flow_sd, FLOW_CFG)
    hift_params = import_hift_torch(hift_sd, HIFT_CFG)

    model = CosyVoice2Model(
        llm=Qwen2LM(LM_CFG), flow=flow, hift=hift,
        llm_params={}, flow_params=flow_params, hift_params=hift_params,
        max_decode_tokens=64, flow_noise=reference_rand_noise(512))

    tokens = golden["tokens"]
    session = {"hift": None}
    wav = model.token2wav(tokens[4:], tokens[:4], golden["prompt_feat"][0],
                          golden["embedding"][0], 0, session, finalize=True)
    want = golden["wav"][0]
    assert wav.shape == want.shape, (wav.shape, want.shape)
    np.testing.assert_allclose(wav, want, atol=1e-2, rtol=0)
    # and the mel stage itself
    mel = model._flow_chunk(tokens[4:], tokens[:4], golden["prompt_feat"][0],
                            golden["embedding"][0], 0, streaming=False)
    np.testing.assert_allclose(mel.T, golden["mel_80xT"][0], atol=2e-3,
                               rtol=1e-2)
