"""High-frequency zh polyphone disambiguation floor.

The reference resolves polyphones inside its proprietary ttsfrd frontend /
WeTextProcessing (cosyvoice/cli/frontend.py:113-121); neither ships here, so
deployments that plug a naive dictionary g2p into
PhonemeTokenizer.encode_text mispronounce the most common polyphonic
characters.  This module is the documented floor for that gap
(runtime/textnorm.py gap note): a word-context lexicon for the highest-
frequency polyphones, applied as a post-pass over ANY g2p's per-character
pinyin output.

Pinyin format: lowercase syllable + tone digit 1-5 (5 = neutral), the same
convention the reference's phoneme assets use.  Rules are word-lexicon
first (longest context match wins), then the per-character default — the
standard polyphone-floor recipe when no learned disambiguator is available.
This is NOT a replacement for a full g2p model; it bounds the error on the
characters that dominate real zh text (的/地/得/了/着/行/重/长/还/乐/都/
为/发/中/会/只/觉/教/便/间).
"""
from __future__ import annotations

from typing import Optional, Sequence

# char -> (default pinyin, {context word: pinyin-for-this-char}).
# Context keys are 2- or 3-char words containing the character; values give
# the char's reading inside that word.  Longest match anywhere in a +-2 char
# window wins; ties prefer the match whose word starts earliest.
ZH_POLYPHONES: dict = {
    "的": ("de5", {"的确": "di2", "目的": "di4", "标的": "di4",
                   "众矢之的": "di4", "打的": "di1", "的士": "di1"}),
    "地": ("di4", {"慢慢地": "de5", "悄悄地": "de5", "渐渐地": "de5",
                   "好好地": "de5", "默默地": "de5", "轻轻地": "de5",
                   "简单地": "de5", "飞快地": "de5", "不停地": "de5",
                   "狠狠地": "de5"}),
    "得": ("de5", {"得到": "de2", "获得": "de2", "取得": "de2",
                   "值得": "de2", "得意": "de2", "觉得": "de5",
                   "记得": "de5", "懂得": "de5", "得分": "de2",
                   "心得": "de2", "不得不": "de2", "得出": "de2",
                   "得奖": "de2", "得罪": "de2", "得先": "dei3",
                   "得去": "dei3", "总得": "dei3", "非得": "dei3"}),
    "了": ("le5", {"了解": "liao3", "了不起": "liao3", "了结": "liao3",
                   "一目了然": "liao3", "不得了": "liao3", "受不了": "liao3",
                   "了如指掌": "liao3", "没完没了": "liao3"}),
    "着": ("zhe5", {"着急": "zhao2", "着火": "zhao2", "睡着": "zhao2",
                    "着凉": "zhao2", "着迷": "zhao2", "着手": "zhuo2",
                    "着装": "zhuo2", "沉着": "zhuo2", "执着": "zhuo2",
                    "着陆": "zhuo2", "高着": "zhao1"}),
    "行": ("xing2", {"银行": "hang2", "行业": "hang2", "行列": "hang2",
                     "一行": "hang2", "行情": "hang2", "外行": "hang2",
                     "内行": "hang2", "同行业": "hang2", "各行各业": "hang2",
                     "分行": "hang2", "支行": "hang2"}),
    "重": ("zhong4", {"重新": "chong2", "重复": "chong2", "重来": "chong2",
                      "重庆": "chong2", "重叠": "chong2", "重申": "chong2",
                      "重建": "chong2", "重启": "chong2", "重组": "chong2",
                      "双重": "chong2", "重温": "chong2"}),
    "长": ("chang2", {"成长": "zhang3", "长大": "zhang3", "校长": "zhang3",
                      "组长": "zhang3", "市长": "zhang3", "生长": "zhang3",
                      "长辈": "zhang3", "队长": "zhang3", "部长": "zhang3",
                      "增长": "zhang3", "董事长": "zhang3", "家长": "zhang3",
                      "长官": "zhang3", "首长": "zhang3"}),
    "还": ("hai2", {"还钱": "huan2", "归还": "huan2", "还给": "huan2",
                    "偿还": "huan2", "还款": "huan2", "还清": "huan2",
                    "退还": "huan2", "还本": "huan2"}),
    "乐": ("le4", {"音乐": "yue4", "乐器": "yue4", "乐队": "yue4",
                   "乐曲": "yue4", "声乐": "yue4", "乐谱": "yue4",
                   "交响乐": "yue4"}),
    "都": ("dou1", {"首都": "du1", "都市": "du1", "成都": "du1",
                    "都城": "du1", "古都": "du1"}),
    "为": ("wei2", {"因为": "wei4", "为了": "wei4", "为什么": "wei4",
                    "为何": "wei4", "为此": "wei4"}),
    "发": ("fa1", {"头发": "fa4", "理发": "fa4", "发型": "fa4",
                   "毛发": "fa4", "白发": "fa4", "假发": "fa4"}),
    "中": ("zhong1", {"中奖": "zhong4", "中毒": "zhong4", "击中": "zhong4",
                      "命中": "zhong4", "中暑": "zhong4", "猜中": "zhong4"}),
    "会": ("hui4", {"会计": "kuai4", "财会": "kuai4"}),
    "只": ("zhi3", {"一只": "zhi1", "两只": "zhi1", "几只": "zhi1",
                    "三只": "zhi1", "只身": "zhi1"}),
    "觉": ("jue2", {"睡觉": "jiao4", "午觉": "jiao4", "一觉": "jiao4"}),
    "教": ("jiao4", {"教书": "jiao1", "教给": "jiao1", "教会他": "jiao1"}),
    "便": ("bian4", {"便宜": "pian2"}),
    "间": ("jian1", {"间接": "jian4", "间隔": "jian4", "离间": "jian4",
                     "间断": "jian4", "黑白相间": "jian4"}),
}


def match_polyphone_word(text: str, i: int, words: dict) -> Optional[str]:
    """Longest lexicon word covering text position i -> that char's reading,
    or None when no context word matches.  Ties between equal-length words
    prefer the match whose word starts EARLIEST (compare (len, -start) —
    ADVICE r4: the old strict len comparison silently kept dict insertion
    order on equal lengths)."""
    best = None                       # (len, -start, pron)
    for w, pron in words.items():
        # ascending start scan: the first hit for a word is its earliest
        # start (largest -s), so per-word break keeps the best candidate
        for s in range(max(0, i - len(w) + 1), i + 1):
            if text[s: s + len(w)] == w:
                key = (len(w), -s)
                if best is None or key > best[:2]:
                    best = (len(w), -s, pron)
                break
    return best[2] if best is not None else None


def fix_polyphones(chars: Sequence[str], pinyins: Sequence[str],
                   lexicon: Optional[dict] = None) -> list:
    """Override per-character pinyins for known polyphones by word context.

    chars: per-character text (as produced by remove_word_boundary);
    pinyins: the g2p's per-character pinyin (non-zh entries pass through
    untouched).  Returns a new pinyin list.  For each polyphonic char, every
    lexicon word containing it is matched against the surrounding window;
    the LONGEST match wins (earliest start on ties), else the character
    default applies — this function is the floor for a NAIVE per-character
    g2p, so the lexicon default always replaces the input reading.
    """
    lex = ZH_POLYPHONES if lexicon is None else lexicon
    text = "".join(c if len(c) == 1 else "\x00" for c in chars)
    out = list(pinyins)
    for i, c in enumerate(chars):
        if c not in lex:
            continue
        default, words = lex[c]
        pron = match_polyphone_word(text, i, words)
        out[i] = pron if pron is not None else default
    return out


def make_polyphone_g2p(base_g2p, lexicon: Optional[dict] = None,
                       char_default: bool = False):
    """Wrap an external g2p frontend (the PhonemeTokenizer.encode_text /
    phoneme_frontend pipeline input) so its per-word pinyin 'symbols' get
    the polyphone floor applied.  Works on the reference result layout
    ({'words','symbols',...}) for single-char zh word entries — multi-char
    words keep the base g2p's reading (it had word context there).

    A single-char symbol is replaced only when a lexicon CONTEXT WORD
    actually matches around it; with no match the base g2p's reading stands
    (ADVICE r4: unconditionally applying the lexicon default downgraded
    base g2ps that already disambiguate by context/tone).  Pass
    char_default=True to also apply the per-character default on no-match —
    the right setting over a naive dictionary g2p."""

    def g2p(texts):
        result = base_g2p(texts)
        flat = "".join(w.strip() for w in result["words"])
        lex = lexicon or ZH_POLYPHONES
        pos = 0
        for wi, word in enumerate(result["words"]):
            word = word.strip()
            if len(word) == 1 and word in lex:
                default, words = lex[word]
                pron = match_polyphone_word(flat, pos, words)
                if pron is not None:
                    result["symbols"][wi] = pron
                elif char_default:
                    result["symbols"][wi] = default
            pos += len(word)
        return result

    return g2p
