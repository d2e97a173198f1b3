"""Per-stage golden-dump harness (SURVEY.md section 7 / round-1 VERDICT #6).

Runs the PyTorch reference flow + HiFT on CPU and dumps stage tensors
(tokens -> mel -> wav) plus the reference's pinned seed-0 CFM noise buffer
into an .npz, so E2E wav-allclose tests (and production parity audits) can
consume them without re-running torch.

Usage:
  python tools/dump_reference.py --out /tmp/golden.npz           # tiny random
  python tools/dump_reference.py --out g.npz --model_dir <ckpt>  # real weights
  python tools/dump_reference.py --noise-only --frames 512 \
      --out cosyvoice_tpu/assets/reference_noise_512.npz         # guard asset

With --model_dir the reference flow.pt / hift.pt checkpoints are loaded and
the dump is a true production golden; without it, seeded random weights are
used (the same construction as tests/test_from_pretrained.py) — still a
valid cross-framework oracle because both sides import identical weights.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def dump_noise(frames: int) -> dict:
    import torch

    g = torch.Generator().manual_seed(0)
    buf = torch.randn([1, 80, 15000], generator=g)[:, :, :frames]
    return {"rand_noise_80xT": buf.numpy()}


def dump_stages(model_dir: str | None, n_tokens: int, seed: int) -> dict:
    """tokens -> flow mel -> HiFT wav through the torch reference on CPU."""
    import torch

    from tests.reference_util import ref_state_dict  # noqa: F401 (stubs)
    from tests.test_from_pretrained import (_ref_flow_sd, _ref_hift_sd,
                                            FLOW_CFG, HIFT_CFG, SPEECH_VOCAB)
    from tests import test_from_pretrained as F

    torch.manual_seed(seed)
    # rebuild the reference modules (random weights unless --model_dir)
    import importlib

    flow_sd = _ref_flow_sd()
    hift_sd = {k.removeprefix("generator."): v for k, v in _ref_hift_sd().items()}
    if model_dir:
        flow_sd = torch.load(f"{model_dir}/flow.pt", map_location="cpu",
                             weights_only=True)
        hift_sd = {k.removeprefix("generator."): v for k, v in torch.load(
            f"{model_dir}/hift.pt", map_location="cpu", weights_only=True).items()}

    # deterministic HiFT source: zero the SineGen phase/noise draws so the
    # wav dump is reproducible (tests/test_hift.py applies the same rule)
    import cosyvoice.hifigan.generator as rg

    class _ZeroUniform:
        def __init__(self, low, high):
            pass

        def sample(self, sample_shape):
            return torch.zeros(*sample_shape)

    rg.Uniform = _ZeroUniform
    torch.randn_like = lambda t: torch.zeros_like(t)

    from cosyvoice.flow.decoder import ConditionalDecoder as RefEst
    from cosyvoice.flow.flow import CausalMaskedDiffWithXvec as RefFlow
    from cosyvoice.flow.flow_matching import CausalConditionalCFM as RefCFM
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as RefF0
    from cosyvoice.hifigan.generator import HiFTGenerator as RefHiFT
    from cosyvoice.transformer.upsample_encoder import \
        UpsampleConformerEncoder as RefEnc
    from omegaconf import DictConfig

    enc = RefEnc(input_size=512, output_size=512, attention_heads=8,
                 linear_units=64, num_blocks=1, dropout_rate=0.0,
                 positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                 input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
                 selfattention_layer_type="rel_selfattn",
                 use_cnn_module=False, macaron_style=False)
    est = RefEst(in_channels=320, out_channels=80, causal=True, channels=[64],
                 dropout=0.0, attention_head_dim=32, n_blocks=1,
                 num_mid_blocks=1, num_heads=2, act_fn="gelu")
    cfm = RefCFM(in_channels=240, cfm_params=DictConfig(
        {"sigma_min": 1e-6, "solver": "euler", "t_scheduler": "cosine",
         "training_cfg_rate": 0.2, "inference_cfg_rate": 0.7,
         "reg_loss_type": "l1"}), n_spks=1, spk_emb_dim=80, estimator=est)
    flow = RefFlow(input_size=512, output_size=80, spk_embed_dim=F.SPK_DIM,
                   vocab_size=SPEECH_VOCAB + 3, input_frame_rate=25,
                   token_mel_ratio=2, pre_lookahead_len=3, encoder=enc,
                   decoder=cfm).eval()
    # production chunk-masks the flow encoder (cli/model.py:314)
    enc.static_chunk_size = 50
    flow.load_state_dict({k: torch.as_tensor(np.asarray(v))
                          for k, v in flow_sd.items()})
    c = HIFT_CFG
    hift = RefHiFT(in_channels=c.in_channels, base_channels=c.base_channels,
                   nb_harmonics=c.nb_harmonics, sampling_rate=c.sampling_rate,
                   upsample_rates=list(c.upsample_rates),
                   upsample_kernel_sizes=list(c.upsample_kernel_sizes),
                   istft_params={"n_fft": c.istft_n_fft, "hop_len": c.istft_hop_len},
                   resblock_kernel_sizes=list(c.resblock_kernel_sizes),
                   resblock_dilation_sizes=[list(d) for d in c.resblock_dilation_sizes],
                   source_resblock_kernel_sizes=list(c.source_resblock_kernel_sizes),
                   source_resblock_dilation_sizes=[list(d) for d in c.source_resblock_dilation_sizes],
                   f0_predictor=RefF0(in_channels=c.in_channels,
                                      cond_channels=c.f0_cond_channels)).eval()
    hift.load_state_dict({k: torch.as_tensor(np.asarray(v))
                          for k, v in hift_sd.items()}, strict=False)

    rng = np.random.default_rng(seed)
    n_prompt = 4
    tokens = rng.integers(0, SPEECH_VOCAB, n_prompt + n_tokens).astype(np.int64)
    prompt_feat = (rng.standard_normal((1, 2 * n_prompt, 80)) * 0.3).astype(np.float32)
    emb = rng.standard_normal((1, F.SPK_DIM)).astype(np.float32)
    with torch.no_grad():
        mel, _ = flow.inference(
            token=torch.from_numpy(tokens[None, n_prompt:]),
            token_len=torch.tensor([n_tokens]),
            prompt_token=torch.from_numpy(tokens[None, :n_prompt]),
            prompt_token_len=torch.tensor([n_prompt]),
            prompt_feat=torch.from_numpy(prompt_feat),
            prompt_feat_len=torch.tensor([2 * n_prompt]),
            embedding=torch.from_numpy(emb))
        wav, _ = hift.inference(speech_feat=mel)
    return {"tokens": tokens, "prompt_feat": prompt_feat, "embedding": emb,
            "mel_80xT": mel.numpy(), "wav": wav.numpy(),
            **dump_noise(2 * (n_prompt + n_tokens))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--noise-only", action="store_true")
    ap.add_argument("--frames", type=int, default=15000)
    ap.add_argument("--n_tokens", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    data = (dump_noise(args.frames) if args.noise_only
            else dump_stages(args.model_dir, args.n_tokens, args.seed))
    np.savez(args.out, **data)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}{v.shape}" for k, v in data.items()))


if __name__ == "__main__":
    main()
