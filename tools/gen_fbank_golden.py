"""Generate the kaldi-fbank golden fixture (tests/data/fbank_golden.npz).

torchaudio is not installed in this environment, so the golden comes from an
INDEPENDENT pure-torch transcription of the torchaudio.compliance.kaldi.fbank
algorithm (the function the reference calls, CAMPPlus.py:333 /
frontend.py:93-96) with the reference's arguments (num_mel_bins=80,
sample_frequency=16000, dither=0) and kaldi defaults: snip_edges strided
frames, per-frame DC removal, raw preemphasis 0.97 with the first-sample
duplicate, povey window (periodic=False hann ** 0.85), 512-point power
spectrum, HTK-mel triangular banks low=20 Hz high=Nyquist computed in mel
space over the 256 non-Nyquist fft bins, natural log floored at fp32 eps.

This is transcribed from the published kaldi/torchaudio algorithm — it shares
no code with cosyvoice_tpu/ops/kaldi.py (torch strided ops + torch.fft vs
jnp gather + jnp.fft; bank construction loops differ), so agreement is real
evidence, though not equivalent to running the released torchaudio binary
(PARITY.md records that caveat).  Run:  python tools/gen_fbank_golden.py
"""
import os

import numpy as np
import torch

SR, NMEL = 16000, 80


def kaldi_fbank_torch(wav: torch.Tensor, num_mel_bins: int = NMEL,
                      sr: int = SR) -> torch.Tensor:
    """wav [S] float32 (kaldi int16 scale) -> [T, num_mel_bins]."""
    window_size = int(sr * 0.025)          # 400
    window_shift = int(sr * 0.010)         # 160
    padded = 512                           # next pow2 (round_to_power_of_two)
    S = wav.numel()
    m = 1 + (S - window_size) // window_shift   # snip_edges frame count
    frames = wav.unfold(0, window_size, window_shift)[:m].clone()
    # remove_dc_offset
    frames = frames - frames.mean(dim=1, keepdim=True)
    # preemphasis 0.97 against the previous sample (first duplicated)
    offset = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
    frames = frames - 0.97 * offset
    # povey window: non-periodic hann ** 0.85
    n = torch.arange(window_size, dtype=torch.float64)
    hann = 0.5 - 0.5 * torch.cos(2 * torch.pi * n / (window_size - 1))
    frames = frames * (hann ** 0.85).to(frames.dtype)
    frames = torch.nn.functional.pad(frames, (0, padded - window_size))
    power = torch.fft.rfft(frames).abs() ** 2       # [m, 257]
    # mel banks over the 256 non-Nyquist bins (torchaudio get_mel_banks),
    # slopes computed in mel space
    num_fft_bins = padded // 2
    low_freq, high_freq = 20.0, sr / 2.0
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f) / 700.0)
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    delta = (mel_high - mel_low) / (num_mel_bins + 1)
    fft_freqs = np.arange(num_fft_bins) * sr / padded
    mel_f = mel(fft_freqs)
    banks = np.zeros((num_mel_bins, num_fft_bins))
    for b in range(num_mel_bins):
        left = mel_low + b * delta
        center, right = left + delta, left + 2 * delta
        up = (mel_f - left) / (center - left)
        down = (right - mel_f) / (right - center)
        banks[b] = np.clip(np.minimum(up, down), 0.0, None)
    banks = np.concatenate([banks, np.zeros((num_mel_bins, 1))], axis=1)
    feats = power @ torch.from_numpy(banks).to(power.dtype).T
    eps = torch.finfo(torch.float32).eps
    return torch.log(torch.clamp(feats, min=eps))


def main():
    rng = np.random.default_rng(0)
    t = np.arange(SR) / SR
    # deterministic broadband test signal: 3 tones + a chirp + noise, in the
    # kaldi int16 scale the JAX op applies internally
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1333 * t + 0.7)
           + 0.1 * np.sin(2 * np.pi * 6100 * t)
           + 0.2 * np.sin(2 * np.pi * (200 + 3000 * t) * t)
           + 0.05 * rng.standard_normal(SR)).astype(np.float32)
    golden = kaldi_fbank_torch(torch.from_numpy(wav * 32768.0)).numpy()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "fbank_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, wav=wav, fbank=golden.astype(np.float32))
    print(f"wrote {out}: wav {wav.shape}, fbank {golden.shape}")


if __name__ == "__main__":
    main()
