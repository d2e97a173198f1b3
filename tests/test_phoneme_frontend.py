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
