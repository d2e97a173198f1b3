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


# ---------------------------------------------------------------- zh numbers
#
# The reference normalizes Chinese text with WeTextProcessing / ttsfrd
# (frontend.py:113-121) — neither ships in this image.  This is a
# self-contained normalizer for the high-frequency cases (cardinals,
# decimals, percents, years, phone-like digit strings).  DOCUMENTED GAPS vs
# WeTextProcessing (plug a full TN model via CosyVoiceFrontEnd
# text_normalizer= for production zh):
#   * measure words/units (5km, 3kg), currency symbols (¥100)
#   * full date/time grammar (12:30, 2024-05-01), fractions (3/4)
#   * polyphone disambiguation and erhua/retroflex handling

_ZH_DIG = "零一二三四五六七八九"
_ZH_UNITS = ["", "十", "百", "千"]
_ZH_GROUPS = ["", "万", "亿", "万亿"]


def _zh_group4(n: int) -> str:
    """0 < n < 10000 -> Chinese reading (no leading-zero handling)."""
    out = []
    zero_pending = False
    for pos in range(3, -1, -1):
        d = (n // 10 ** pos) % 10
        if d == 0:
            if out:
                zero_pending = True
            continue
        if zero_pending:
            out.append("零")
            zero_pending = False
        out.append(_ZH_DIG[d] + _ZH_UNITS[pos])
    return "".join(out)


def zh_cardinal(num_str: str) -> str:
    """Unsigned integer string -> Chinese cardinal (一千二百三十四)."""
    n = int(num_str)
    if n == 0:
        return "零"
    groups = []
    gi = 0
    while n > 0:
        n, g = divmod(n, 10000)
        if g:
            txt = _zh_group4(g) + _ZH_GROUPS[gi]
            if g < 1000 and n > 0:
                # leading zeros inside this 4-digit slot: 10086 -> 一万零八十六
                txt = "零" + txt
            groups.append(txt)
        gi += 1
    out = "".join(reversed(groups))
    if out.startswith("一十"):          # 13 -> 十三, not 一十三
        out = out[1:]
    return out


def zh_digits(num_str: str) -> str:
    """Digit-by-digit reading (years, phone numbers): 2024 -> 二零二四."""
    return "".join(_ZH_DIG[int(d)] for d in num_str if d.isdigit())


def zh_spell_numbers(text: str) -> str:
    """Normalize digits inside Chinese text (the WeTextProcessing subset
    above; reference frontend.py:117 zh_tn_model.normalize)."""
    # percents: 50% / 3.5% -> 百分之五十 / 百分之三点五
    def pct(m):
        return "百分之" + zh_spell_numbers(m.group(1))

    text = re.sub(r"(\d+(?:\.\d+)?)%", pct, text)
    # 4-digit years before 年 read digit-by-digit
    text = re.sub(r"(\d{4})(?=年)", lambda m: zh_digits(m.group(1)), text)
    # phone-like long digit strings read digit-by-digit
    text = re.sub(r"\d{10,}", lambda m: zh_digits(m.group()), text)
    # decimals: 3.14 -> 三点一四
    text = re.sub(r"(\d+)\.(\d+)",
                  lambda m: zh_cardinal(m.group(1)) + "点" + zh_digits(m.group(2)),
                  text)
    # remaining integers -> cardinals (负 for a leading minus sign)
    text = re.sub(r"-?\d+",
                  lambda m: ("负" if m.group().startswith("-") else "")
                  + zh_cardinal(m.group().lstrip("-")), text)
    return text


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
        text = zh_spell_numbers(text)
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
