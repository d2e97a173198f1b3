"""Text tokenizers for the speech LLMs.

Behavioral spec: reference `cosyvoice/tokenizer/tokenizer.py` —
QwenTokenizer (:241-275, HF AutoTokenizer with eos/pad and
`<|endofprompt|>` special token) and the whisper-style multilingual tiktoken
tokenizer (:11-239, custom vocab file + ~100 language specials).  The vocab
assets ship with model checkpoints, so both classes take explicit paths.
"""
from __future__ import annotations

import os
from functools import cached_property
from typing import Protocol


class TextTokenizer(Protocol):
    def encode(self, text: str, **kwargs) -> list[int]: ...

    def decode(self, tokens: list[int]) -> str: ...


class QwenTokenizer:
    """HF tokenizer dir -> ids (CosyVoice2 default; tokenizer.py:241-275)."""

    def __init__(self, token_path: str, skip_special_tokens: bool = True):
        from transformers import AutoTokenizer

        special_tokens = {
            "eos_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
            "additional_special_tokens": [
                "<|im_start|>", "<|im_end|>", "<|endofprompt|>",
                "[breath]", "<strong>", "</strong>", "[noise]",
                "[laughter]", "[cough]", "[clucking]", "[accent]",
                "[quick_breath]", "[hissing]", "[sigh]", "[vocalized-noise]",
                "[lipsmack]", "[mn]",
            ],
        }
        self.tokenizer = AutoTokenizer.from_pretrained(token_path)
        self.tokenizer.add_special_tokens(special_tokens)
        self.skip_special_tokens = skip_special_tokens

    def encode(self, text: str, **kwargs) -> list[int]:
        return self.tokenizer([text], return_tensors="np")["input_ids"][0].tolist()

    def decode(self, tokens) -> str:
        return self.tokenizer.batch_decode(
            [tokens], skip_special_tokens=self.skip_special_tokens)[0]


class WhisperTiktokenTokenizer:
    """CosyVoice-v1 multilingual tokenizer from a tiktoken vocab file
    (tokenizer.py:11-239).  `vocab_path` = the *.tiktoken asset from the
    model release; specials mirror the reference list."""

    LANGUAGES = ("en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr",
                 "pl", "ca", "nl", "ar", "sv", "it", "id", "hi", "fi", "vi")

    def __init__(self, vocab_path: str, num_languages: int = 100):
        import base64

        import tiktoken

        with open(vocab_path, "rb") as f:
            ranks = {
                base64.b64decode(tok): int(rank)
                for tok, rank in (line.split() for line in f if line.strip())
            }
        n_vocab = len(ranks)
        specials = ["<|endoftext|>", "<|startoftranscript|>"]
        specials += [f"<|lang{i}|>" for i in range(num_languages)]
        specials += ["<|translate|>", "<|transcribe|>", "<|startoflm|>",
                     "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]
        specials += [f"<|{i * 0.02:.2f}|>" for i in range(1501)]
        specials += ["<|endofprompt|>"]
        special_tokens = {tok: n_vocab + i for i, tok in enumerate(specials)}
        self.allowed_special = set(special_tokens)
        self.encoding = tiktoken.Encoding(
            name=os.path.basename(vocab_path),
            explicit_n_vocab=n_vocab + len(special_tokens),
            pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
            mergeable_ranks=ranks,
            special_tokens=special_tokens,
        )

    def encode(self, text: str, **kwargs) -> list[int]:
        return self.encoding.encode(text, allowed_special=self.allowed_special)

    def decode(self, tokens) -> str:
        return self.encoding.decode([t for t in tokens if t < self.encoding.n_vocab])


class ByteTokenizer:
    """Dependency-free fallback (tests / smoke runs): UTF-8 bytes + 256=eos."""

    vocab_size = 257

    def encode(self, text: str, **kwargs) -> list[int]:
        return list(text.encode("utf-8"))

    def decode(self, tokens) -> str:
        return bytes(t for t in tokens if t < 256).decode("utf-8", "ignore")
