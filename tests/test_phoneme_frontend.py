"""g2p post-processing parity vs cosyvoice/tokenizer/phoneme_frontend.py."""
import pytest

import tests.reference_util  # noqa: F401  (puts /root/reference on sys.path)

from cosyvoice_tpu.tokenizer import phoneme_frontend as pf


class StubG2P:
    """Stands in for the reference's external text_frontend_model: returns a
    fixed frontend dict for the normalized (tag-free) input."""

    def __init__(self, result):
        self.result = result
        self.seen = None

    def get_frontend_outputs(self, text):
        self.seen = text
        return dict(self.result)

    __call__ = get_frontend_outputs


def _result_zh():
    # "今天<p>花儿好oh" -> g2p sees "今天花儿好oh"
    # words: 今天 | 花儿(erhua) | 好 | oh(english).  Prosody marks ('#n')
    # appear inline in the phoneme stream with an out-of-range alignment id
    # (they must be skipped by the token grouping — the reference's own
    # total-count assert only holds under that contract), and the final
    # token carries no trailing mark.
    return {
        "words": ["今天", "花儿", "好", "oh"],
        "symbols": ["jin1 tian1", "hua1 @er@", "hao3", "@eng@oh"],
        # one prosody mark per symbol entry (incl. the @er@ placeholder)
        "prosody": ["#0", "#1", "#0", "#2", "#3", "#0"],
        # flat phonemes aligned to the 5 post-merge chars:
        # 今(0) 天(1) 花儿(2) 好(3) oh(4)
        "phonemes": ["j", "in1", "t", "ian1", "#1", "h", "uar1", "#2",
                     "h", "ao3", "#3", "OW"],
        "pho2token_ids": [0, 0, 1, 1, -1, 2, 2, -1, 3, 3, -1, 4],
        "tones": [1, 1, 1, 1, 0, 1, 1, 0, 3, 3, 0, 14],
        "language_ids": [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
    }


@pytest.mark.parametrize("text", ["今天<p>花儿好oh", "今天花儿好oh",
                                  "今<k>天花儿好oh", "今天花儿<s>好oh"])
def test_frontend_result_matches_reference(text):
    from cosyvoice.tokenizer import phoneme_frontend as ref

    got = pf.get_frontend_result(
        text, StubG2P(_result_zh()),
        interjection2pho=pf.load_interjections(
            "/root/reference/cosyvoice/tokenizer/assets/tanci.json"))
    want = ref.get_frontend_result(text, StubG2P(_result_zh()))
    for key in ["ori_text", "text_token", "pinyins", "phoneme_list",
                "token_prsd", "token2phonum", "token2phonum_w_prsd",
                "pho", "tone", "lang"]:
        assert got[key] == want[key], (key, got[key], want[key])


def test_kpsgt_tag_removal_matches_reference():
    from cosyvoice.tokenizer import phoneme_frontend as ref

    for text in ["a<k>b <p>c", "<s><g>x", "no tags", "末尾<t>"]:
        assert pf.remove_kpsgt_tag(text) == ref.remove_kpsgt_tag(text)


def test_laughter_substitution():
    r = {
        "words": ["haa", "。"],
        "symbols": ["@eng@haa", "@punc@."],
        "prosody": ["#0", "#0"],
        "phonemes": ["HH", "AA", "."],
        "pho2token_ids": [0, 0, 1],
        "tones": [14, 14, 0],
        "language_ids": [1, 1, 0],
    }
    out = pf.get_frontend_result("haa。", StubG2P(r))
    assert out["pinyins"] == ["haa15", "@punc@."]


def test_preprocess_matches_reference(tmp_path):
    """Corpus-prep normalization vs cosyvoice/tokenizer/preprocess.py."""
    from cosyvoice.tokenizer import preprocess as ref

    from cosyvoice_tpu.tokenizer import preprocess as pp

    cases = [
        "今天weather很好(ppl)真的<ppb>不错",
        "ＨＥＬＬＯ　world 你好,你好。",
        "mixed 中文english text123 <unl> < unk >",
        "ppl ppc <v-noise> <v-noise> 安静",
        "a", "",
    ]
    for text in cases:
        assert pp.normalize_text(text) == ref.normalize_text(text), text
        assert pp.insert_space_between_mandarin(text) == \
            ref.insert_space_between_mandarin(text), text
        assert pp.extract_mandarin_only(text) == \
            ref.extract_mandarin_only(text), text
        assert pp.extract_non_mandarin(text) == \
            ref.extract_non_mandarin(text), text
    for text in ["今 天 好", "a b 中 文 c", "x", "hello 世 界 ok"]:
        assert pp.remove_space_between_mandarin(text) == \
            ref.remove_space_between_mandarin(text), text

    # kaldi-text writers
    src = tmp_path / "text"
    src.write_text("utt1 今天weather很好\nutt2 hello world\nutt3 你好吗\n",
                   encoding="utf-8")
    n = pp.write_mandarin_only_text(str(src), str(tmp_path / "out"),
                                    str(tmp_path / "chars"),
                                    str(tmp_path / "bpe_chars"))
    assert n == 6  # 今天很好你吗 unique chars
    pp.write_bpe_train_text(str(src), str(tmp_path / "bpe_text"))
    assert "utt2 hello world" in (tmp_path / "bpe_text").read_text()


def test_polyphone_floor_goldens():
    """High-frequency zh polyphone lexicon (round-3 VERDICT #10): word
    context picks the right reading, default covers the rest."""
    from cosyvoice_tpu.tokenizer.polyphone import fix_polyphones

    def run(s):
        chars = list(s)
        return fix_polyphones(chars, ["x5"] * len(chars))

    # 的: particle default vs 的确/目的/打的
    assert run("我的书")[1] == "de5"
    assert run("的确如此")[0] == "di2"
    assert run("目的地")[1] == "di4"
    assert run("打的回家")[1] == "di1"
    # 得: complement default vs 得到 vs 必须-得
    assert run("跑得快")[1] == "de5"
    assert run("得到奖励")[0] == "de2"
    assert run("我总得去")[2] == "dei3"
    # 地: noun default vs adverbial reduplication
    assert run("地球很大")[0] == "di4"
    assert run("慢慢地走")[2] == "de5"
    # 了: aspect default vs 了解
    assert run("他走了")[2] == "le5"
    assert run("了解情况")[0] == "liao3"
    assert run("受不了啦")[2] == "liao3"
    # 着: aspect default vs 着急/沉着
    assert run("看着我")[1] == "zhe5"
    assert run("别着急")[1] == "zhao2"
    assert run("沉着应对")[1] == "zhuo2"
    # 行 / 重 / 长 / 还 / 乐 / 都 / 为 / 发
    assert run("自行车")[1] == "xing2"
    assert run("中国银行")[3] == "hang2"
    assert run("很重要")[1] == "zhong4"
    assert run("重新开始")[0] == "chong2"
    assert run("很长的路")[1] == "chang2"
    assert run("他是校长")[3] == "zhang3"
    assert run("还没来")[0] == "hai2"
    assert run("还钱给我")[0] == "huan2"
    assert run("快乐时光")[1] == "le4"
    assert run("听音乐会")[2] == "yue4"
    assert run("大家都来")[2] == "dou1"
    assert run("首都机场")[1] == "du1"
    assert run("为什么呢")[0] == "wei4"
    assert run("成为冠军")[1] == "wei2"
    assert run("理发店")[1] == "fa4"
    assert run("发现问题")[0] == "fa1"
    # 会计 / 只 / 觉 / 便宜 / 间
    assert run("会计师")[0] == "kuai4"
    assert run("我不会")[2] == "hui4"
    assert run("一只猫")[1] == "zhi1"
    assert run("只有一个")[0] == "zhi3"
    assert run("去睡觉吧")[2] == "jiao4"
    assert run("感觉不错")[1] == "jue2"
    assert run("很便宜")[1] == "pian2"
    assert run("方便的话")[1] == "bian4"
    assert run("时间不多")[1] == "jian1"
    assert run("间接影响")[0] == "jian4"
    # longest-match priority: 不得了 (liao3) beats plain aspect 了
    assert run("真是不得了")[4] == "liao3"
    # non-zh rows pass through untouched
    got = fix_polyphones(["a", "的"], ["ey1", "x5"])
    assert got == ["ey1", "de5"]


def test_polyphone_g2p_wrapper():
    """make_polyphone_g2p fixes single-char zh words in a reference-layout
    g2p result using cross-word context, leaving multi-char words alone."""
    from cosyvoice_tpu.tokenizer.polyphone import make_polyphone_g2p

    def base(texts):
        # naive g2p that always gives 的->de5, 银行->yin2hang2 correctly but
        # misreads standalone 长 as chang2 in a 校长 split
        return {"words": ["校", "长", "的", "目", "的"],
                "symbols": ["xiao4", "chang2", "de5", "mu4", "de5"]}

    out = make_polyphone_g2p(base)("校长的目的")
    assert out["symbols"][1] == "zhang3"   # 校长 context -> zhang3
    assert out["symbols"][2] == "de5"      # particle stays
    assert out["symbols"][4] == "di4"      # 目的 context -> di4


def test_polyphone_tier2_goldens():
    """r5 lexicon expansion: tier-2 polyphones (word context vs default)."""
    from cosyvoice_tpu.tokenizer.polyphone import fix_polyphones

    def run(s):
        return fix_polyphones(list(s), ["x5"] * len(s))

    cases = [
        ("照相机", 1, "xiang4"), ("相信我", 0, "xiang1"),
        ("将军来了", 0, "jiang4"), ("将要出发", 0, "jiang1"),
        ("答应他", 1, "ying4"), ("应该如此", 0, "ying1"),
        ("上当受骗", 1, "dang4"), ("当老师", 0, "dang1"),
        ("业余爱好", 3, "hao4"), ("好天气", 0, "hao3"),
        ("种植水稻", 0, "zhong4"), ("各种各样", 1, "zhong3"),
        ("空调坏了", 1, "tiao2"), ("声调不对", 1, "diao4"),
        ("处理问题", 0, "chu3"), ("到处都是", 1, "chu4"),
        ("水浒传说", 2, "zhuan4"), ("传说故事", 0, "chuan2"),
        ("干燥的风", 0, "gan1"), ("干活去了", 0, "gan4"),
        ("大部分人", 2, "fen4"), ("分开行动", 0, "fen1"),
        ("遭遇灾难", 3, "nan4"), ("难过极了", 0, "nan2"),
        ("数数手指", 0, "shu3"), ("数学很难", 0, "shu4"),
        ("弹钢琴曲", 0, "tan2"), ("子弹打光", 1, "dan4"),
        ("放假三天", 1, "jia4"), ("假话连篇", 0, "jia3"),
        ("有空再来", 1, "kong4"), ("天空很蓝", 1, "kong1"),
        ("出差很久", 1, "chai1"), ("时差难倒", 1, "cha1"),
        ("反倒不好", 1, "dao4"), ("摔倒在地", 1, "dao3"),
        ("盛饭给他", 0, "cheng2"), ("盛大晚会", 0, "sheng4"),
        ("缴械投降", 3, "xiang2"), ("降温降雨", 0, "jiang4"),
        ("去西藏玩", 2, "zang4"), ("藏起来了", 0, "cang2"),
        ("率领部队", 0, "shuai4"), ("概率很低", 1, "lv4"),
        ("勉强同意", 1, "qiang3"), ("强大无比", 0, "qiang2"),
        ("弯曲小路", 1, "qu1"), ("歌曲动听", 1, "qu3"),
        ("奇数偶数", 0, "ji1"), ("奇怪的人", 0, "qi2"),
        ("青少年宫", 1, "shao4"), ("很少见面", 1, "shao3"),
        ("朝气蓬勃", 0, "zhao1"), ("朝南的窗", 0, "chao2"),
    ]
    for s, i, want in cases:
        got = run(s)[i]
        assert got == want, f"{s}[{i}]: got {got}, want {want}"


def test_erhua_neutralization():
    """Suffix-儿 in erhua vocabulary marks 'r5'; standalone 儿 keeps er2."""
    from cosyvoice_tpu.tokenizer.polyphone import apply_erhua

    def run(s, base="er2"):
        chars = list(s)
        pin = ["x5" if c != "儿" else base for c in chars]
        return apply_erhua(chars, pin)

    assert run("一会儿见")[2] == "r5"
    assert run("去哪儿呀")[2] == "r5"
    assert run("小孩儿哭")[2] == "r5"
    assert run("有点儿累")[2] == "r5"
    assert run("聊天儿去")[2] == "r5"
    # standalone syllabic 儿 untouched
    assert run("儿子很乖")[0] == "er2"
    assert run("女儿长大")[1] == "er2"
    assert run("婴儿睡了")[1] == "er2"
