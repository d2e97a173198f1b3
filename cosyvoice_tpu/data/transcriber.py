"""On-the-fly ASR transcription for untranscribed training audio.

Behavioral spec: reference `cosyvoice/dataset/transcriber.py:3-30` (lazy
funasr paraformer singleton) and `dataset/processor_kaldidata.py:143`
(`transcribe` pipeline stage: fills sample['txt'] from audio when the kaldi
dir has no text).  funasr is an optional heavy dependency; everything here
is import-gated so the rest of the data pipeline works without it.
"""
from __future__ import annotations

from typing import Callable, Optional

_MODEL = None


def available() -> bool:
    try:
        import funasr  # noqa: F401
        return True
    except ImportError:
        return False


def get_transcriber(model: str = "paraformer-zh",
                    device: str = "cpu") -> Callable[[object, int], str]:
    """Lazy singleton (reference transcriber.py:10-21): returns
    fn(waveform, sample_rate) -> text."""
    global _MODEL
    if _MODEL is None:
        try:
            from funasr import AutoModel
        except ImportError as e:  # pragma: no cover - funasr not in image
            raise RuntimeError(
                "funasr is required for on-the-fly transcription; install it "
                "or provide transcripts in the data dir") from e
        _MODEL = AutoModel(model=model, device=device, disable_update=True)

    def transcribe(wav, sr: int) -> str:
        res = _MODEL.generate(input=wav, fs=sr)
        return res[0]["text"] if res else ""

    return transcribe


def transcribe_stage(model: str = "paraformer-zh", device: str = "cpu",
                     transcriber: Optional[Callable] = None):
    """Pipeline stage: fill missing sample['txt'] by ASR
    (processor_kaldidata.py:143-160).  `transcriber` injectable for tests."""

    def stage(it):
        fn = transcriber
        for sample in it:
            if not sample.get("txt"):
                if fn is None:
                    fn = get_transcriber(model, device)
                sample["txt"] = fn(sample["speech"], sample["sample_rate"])
            yield sample

    return stage
