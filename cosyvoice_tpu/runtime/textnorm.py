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
# self-contained normalizer for the high-frequency cases: cardinals,
# decimals (incl. negatives), percents, fractions, currency (¥/$/€/元),
# measure words/units (km, kg, °C, ...), dates (2024-05-01, 2024年5月1日),
# clock times (12:30, 12:30:05), years, phone-like digit strings, and the
# idiomatic 两/二 rules (两千/两万/两亿, 两点 hours, 2+measure-word -> 两个).
# DOCUMENTED GAPS vs WeTextProcessing (plug a full TN model via
# CosyVoiceFrontEnd text_normalizer= for production zh):
#   * polyphone disambiguation and erhua/retroflex handling: a word-context
#     lexicon FLOOR for the ~20 highest-frequency polyphones now ships in
#     tokenizer/polyphone.py (fix_polyphones / make_polyphone_g2p, golden-
#     tested); full coverage still needs a learned g2p / pronunciation
#     lexicon, which this image does not ship

_ZH_DIG = "零一二三四五六七八九"
_ZH_UNITS = ["", "十", "百", "千"]
_ZH_GROUPS = ["", "万", "亿", "万亿", "亿亿"]


def _zh_group4(n: int) -> str:
    """0 < n < 10000 -> Chinese reading (no leading-zero handling).
    Idiomatic 两: digit 2 at the 千 position reads 两千 (2345 ->
    两千三百四十五), matching WeTextProcessing's cardinal verbalizer;
    二十/二百 keep 二."""
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
        dig = "两" if (d == 2 and pos == 3) else _ZH_DIG[d]
        out.append(dig + _ZH_UNITS[pos])
    return "".join(out)


def zh_cardinal(num_str: str) -> str:
    """Unsigned integer string -> Chinese cardinal (一千二百三十四).
    Numbers past 万亿亿 (1e20) fall back to digit-by-digit reading."""
    n = int(num_str)
    if n == 0:
        return "零"
    if n >= 10 ** (4 * len(_ZH_GROUPS)):
        return zh_digits(num_str)
    groups = []
    gi = 0
    while n > 0:
        n, g = divmod(n, 10000)
        if g:
            # a whole group of exactly 2 before 万/亿 reads 两 (两万, 两亿)
            body = "两" if (g == 2 and gi > 0) else _zh_group4(g)
            txt = body + _ZH_GROUPS[gi]
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


def _zh_number(num_str: str) -> str:
    """Signed integer/decimal string -> Chinese (负三点一四)."""
    sign = "负" if num_str.startswith("-") else ""
    num_str = num_str.lstrip("-")
    if "." in num_str:
        intp, frac = num_str.split(".", 1)
        return sign + zh_cardinal(intp or "0") + "点" + zh_digits(frac)
    return sign + zh_cardinal(num_str)


# measure words / units after a number (longest-match first)
_ZH_UNIT_WORDS = [
    ("km/h", "公里每小时"), ("m/s", "米每秒"), ("km²", "平方公里"),
    ("m²", "平方米"), ("km", "公里"), ("cm", "厘米"), ("mm", "毫米"),
    ("kg", "千克"), ("mg", "毫克"), ("ml", "毫升"), ("°C", "摄氏度"),
    ("℃", "摄氏度"), ("GB", "吉字节"), ("MB", "兆字节"), ("TB", "太字节"),
    ("Hz", "赫兹"), ("kW", "千瓦"), ("m", "米"), ("g", "克"), ("L", "升"),
    ("t", "吨"), ("W", "瓦"),
]
_ZH_UNIT_RE = "|".join(re.escape(u) for u, _ in _ZH_UNIT_WORDS)
_ZH_CURRENCY = {"¥": "元", "￥": "元", "$": "美元", "€": "欧元", "£": "英镑"}
# measure words that turn a bare count of 2 into 两 (两个/两张/两天...)
_ZH_MEASURE = set("个只条张本位次件名岁层间家辆瓶杯台倍天年月周块根座对双份"
                  "颗粒句段页行排组批幅首门节课顿棵株封盒袋箱截面项分秒"
                  "千万亿")  # mixed-script magnitudes: 2万 -> 两万, 2亿 -> 两亿


def _zh_count(num_str: str) -> str:
    """Count reading before a measure word / unit: bare 2 -> 两."""
    return "两" if num_str == "2" else _zh_number(num_str)


def zh_spell_numbers(text: str) -> str:
    """Normalize digits inside Chinese text (the WeTextProcessing subset
    above; reference frontend.py:117 zh_tn_model.normalize).  Golden strings
    in tests/test_runtime.py::test_zh_textnorm_golden."""
    num = r"-?\d+(?:\.\d+)?"
    # dates: 2024-05-01 / 2024/5/1 -> 二零二四年五月一日
    def date(m):
        y, mo, d = m.group(1), int(m.group(2)), int(m.group(3))
        return f"{zh_digits(y)}年{zh_cardinal(str(mo))}月{zh_cardinal(str(d))}日"

    text = re.sub(r"(\d{4})[-/](\d{1,2})[-/](\d{1,2})(?!\d)", date, text)
    # clock times: 12:30 / 12:30:05 -> 十二点三十分 / ...零五秒; :00 -> 点整
    def clock(m):
        h, mi = int(m.group(1)), int(m.group(2))
        # idiomatic hour-2: 2:30 reads 两点三十分, never 二点
        out = ("两" if h == 2 else zh_cardinal(str(h))) + "点"
        out += ("整" if mi == 0 and not m.group(3)
                else zh_cardinal(str(mi)) + "分")
        if m.group(3):
            s = int(m.group(3))
            out += ("零" if s < 10 else "") + zh_cardinal(str(s)) + "秒"
        return out

    text = re.sub(r"(?<![\d:])([01]?\d|2[0-3]):([0-5]\d)(?::([0-5]\d))?(?![\d:])",
                  clock, text)
    # percents: 50% / -3.5% -> 百分之五十 / 负百分之三点五
    def pct(m):
        n = m.group(1)
        sign = "负" if n.startswith("-") else ""
        return sign + "百分之" + _zh_number(n.lstrip("-"))

    text = re.sub(rf"({num})%", pct, text)
    # fractions: 3/4 -> 四分之三 (dates already consumed above)
    text = re.sub(r"(?<![\d./])(\d{1,6})/(\d{1,6})(?![\d./])",
                  lambda m: zh_cardinal(m.group(2)) + "分之" + zh_cardinal(m.group(1)),
                  text)
    # currency: ¥100 / $5.5 -> 一百元 / 五点五美元
    def cur(m):
        return _zh_count(m.group(2)) + _ZH_CURRENCY[m.group(1)]

    text = re.sub(rf"([¥￥$€£])({num})", cur, text)
    # measure words/units: 5km -> 五公里, -3°C -> 负三摄氏度, 2km -> 两公里
    text = re.sub(rf"({num})({_ZH_UNIT_RE})(?![A-Za-z])",
                  lambda m: _zh_count(m.group(1))
                  + dict(_ZH_UNIT_WORDS)[m.group(2)], text)
    # 4-digit years before 年 read digit-by-digit
    text = re.sub(r"(\d{4})(?=年)", lambda m: zh_digits(m.group(1)), text)
    # phone-like long digit strings read digit-by-digit
    text = re.sub(r"\d{10,}", lambda m: zh_digits(m.group()), text)
    # decimals (signed): -3.14 -> 负三点一四
    text = re.sub(r"-?\d+\.\d+", lambda m: _zh_number(m.group()), text)
    # remaining integers -> cardinals (负 for a leading minus sign); a bare
    # count of 2 before a measure word reads 两 (WeTextProcessing's
    # classifier rule: 2个月 -> 两个月, never 二个月)
    def integer(m):
        if m.group() == "2" and m.string[m.end(): m.end() + 1] in _ZH_MEASURE:
            return "两"
        return _zh_number(m.group())

    text = re.sub(r"-?\d+", integer, text)
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
