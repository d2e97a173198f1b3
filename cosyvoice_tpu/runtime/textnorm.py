"""Text normalization + sentence packing for the TTS frontend.

Behavioral spec: reference `cosyvoice/utils/frontend_utils.py` (regex cleanup,
split_paragraph sentence packing bounded by token counts) and
`cosyvoice/cli/frontend.py:108-133` (text_normalize pipeline).  The reference
optionally calls external normalizers (ttsfrd / WeTextProcessing / inflect);
none are available here, so this module provides self-contained equivalents:
the same regex cleanups, a built-in English number speller, and the same
punctuation-driven paragraph splitter.  Heavier normalizers can be plugged in
through `CosyVoiceFrontEnd(text_normalizer=...)`.
"""
from __future__ import annotations

import re
from typing import Callable, Iterable

_CHINESE = re.compile(r"[一-鿿]")


def contains_chinese(text: str) -> bool:
    return bool(_CHINESE.search(text))


def replace_corner_mark(text: str) -> str:
    return text.replace("²", "平方").replace("³", "立方")


def remove_bracket(text: str) -> str:
    for ch in ("（", "）", "【", "】", "`"):
        text = text.replace(ch, "")
    return text.replace("——", " ")


def replace_blank(text: str) -> str:
    """Drop spaces unless flanked by ascii (keeps 'a b', drops '中 文')."""
    out = []
    for i, c in enumerate(text):
        if c == " ":
            prev_ok = i > 0 and text[i - 1].isascii() and text[i - 1] != " "
            next_ok = i + 1 < len(text) and text[i + 1].isascii() and text[i + 1] != " "
            if prev_ok and next_ok:
                out.append(c)
        else:
            out.append(c)
    return "".join(out)


_PUNCT_ONLY = re.compile(r"^[\W_]*$", re.UNICODE)


def is_only_punctuation(text: str) -> bool:
    return bool(_PUNCT_ONLY.fullmatch(text))


_UNITS = ["zero", "one", "two", "three", "four", "five", "six", "seven",
          "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
          "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALES = [(10 ** 12, "trillion"), (10 ** 9, "billion"), (10 ** 6, "million"),
           (10 ** 3, "thousand"), (100, "hundred")]


def number_to_words(num_str: str) -> str:
    """Spell an unsigned integer/decimal string in English (inflect-like)."""
    if "." in num_str:
        intp, frac = num_str.split(".", 1)
        tail = " point " + " ".join(_UNITS[int(d)] for d in frac if d.isdigit())
        return (number_to_words(intp) if intp else "zero") + tail
    n = int(num_str)
    if n < 20:
        return _UNITS[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + ("-" + _UNITS[r] if r else "")
    for scale, name in _SCALES:
        if n >= scale:
            head, rest = divmod(n, scale)
            out = number_to_words(str(head)) + " " + name
            if rest:
                joiner = " and " if rest < 100 and scale == 100 else " "
                out += joiner + number_to_words(str(rest))
            return out
    return _UNITS[0]


def spell_out_number(text: str) -> str:
    return re.sub(r"\d+(?:\.\d+)?", lambda m: number_to_words(m.group()), text)


def split_paragraph(text: str, tokenize: Callable[[str], list], lang: str = "zh",
                    token_max_n: int = 80, token_min_n: int = 60,
                    merge_len: int = 20, comma_split: bool = False) -> list[str]:
    """Pack sentences into ~token_max_n-token utterances (frontend_utils.py:65-120)."""

    def utt_len(t: str) -> int:
        return len(t) if lang == "zh" else len(tokenize(t))

    pounc = (["。", "？", "！", "；", "：", "、", ".", "?", "!", ";"]
             if lang == "zh" else [".", "?", "!", ";", ":"])
    if comma_split:
        pounc += ["，", ","]
    if not text:
        return []
    if text[-1] not in pounc:
        text += "。" if lang == "zh" else "."

    utts, st = [], 0
    for i, c in enumerate(text):
        if c in pounc:
            if len(text[st:i]) > 0:
                utts.append(text[st:i] + c)
            if i + 1 < len(text) and text[i + 1] in ['"', "”"]:
                utts[-1] = utts[-1] + text[i + 1]
                st = i + 2
            else:
                st = i + 1

    final, cur = [], ""
    for utt in utts:
        if utt_len(cur + utt) > token_max_n and utt_len(cur) > token_min_n:
            final.append(cur)
            cur = ""
        cur = cur + utt
    if cur:
        if utt_len(cur) < merge_len and final:
            final[-1] += cur
        else:
            final.append(cur)
    return final


def basic_normalize(text: str, tokenize: Callable[[str], list],
                    split: bool = True):
    """Default normalize pipeline (frontend.py:108-133 minus external TN models)."""
    text = text.strip()
    if contains_chinese(text):
        text = text.replace("\n", "")
        text = replace_blank(text)
        text = replace_corner_mark(text)
        text = text.replace(".", "。").replace(" - ", "，")
        text = remove_bracket(text)
        text = re.sub(r"[，,、]+$", "。", text)
        texts = split_paragraph(text, tokenize, "zh", 80, 60, 20)
    else:
        text = spell_out_number(text)
        texts = split_paragraph(text, tokenize, "en", 80, 60, 20)
    texts = [t for t in texts if not is_only_punctuation(t)]
    return texts if split else "".join(texts)
