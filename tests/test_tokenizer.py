"""WordPiece tokenizer fidelity tests.

Cross-checks our tokenizer against the reference's HuggingFace-lineage
tokenizer (``code/lxmert/src/lxrt/tokenization.py``), loaded straight from
the mounted reference repo, over a battery of realistic and adversarial
strings on the real 21,128-entry vocab.
"""

import importlib.util
import sys
import types

import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import FullTokenizer

CASES = [
    "sen department of lace sling dress women",
    "2019 new summer women's wear",
    "Baby High Waisted  drop-resistance CUTE cup!!",
    "café crème naïve fiancée",
    "中文 查询 词 mixed with english",
    "红色连衣裙",
    "a" * 250,  # longer than max_input_chars_per_word
    "token-with-hyphens and (parens), plus $5.99 price",
    "\x00weird�chars\tand\nnewlines",
    "ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ",
    "ZHANG'S   multiple   spaces",
    "ZqXv unknownword qqqqqqzzzzzz",
    "[CLS] literal specials [SEP]",
    "ａｂｃ１２３",
    "日本語のテキストとカタカナ",
    "an_underscore_word",
    "",
    "   ",
    "mão-de-obra ünïcödé",
]


def _load_reference_hf_tokenizer(reference_dir, vocab_path):
    """Import the reference lxmert tokenizer with its file_utils stubbed out."""
    pkg = types.ModuleType("lxrt")
    pkg.__path__ = [str(reference_dir / "code/lxmert/src/lxrt")]
    sys.modules["lxrt"] = pkg
    fu = types.ModuleType("lxrt.file_utils")
    fu.cached_path = lambda p, cache_dir=None: p
    sys.modules["lxrt.file_utils"] = fu
    spec = importlib.util.spec_from_file_location(
        "lxrt.tokenization", reference_dir / "code/lxmert/src/lxrt/tokenization.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["lxrt.tokenization"] = mod
    spec.loader.exec_module(mod)
    return mod.BertTokenizer(str(vocab_path), do_lower_case=True)


@pytest.fixture(scope="module")
def ref_tokenizer(reference_dir, vocab_path):
    try:
        return _load_reference_hf_tokenizer(reference_dir, vocab_path)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference tokenizer unimportable: {e}")


@pytest.fixture(scope="module")
def ours_hf(vocab_path):
    return FullTokenizer.hf_style(vocab_path)


@pytest.fixture(scope="module")
def ours_google(vocab_path):
    return FullTokenizer.google_style(vocab_path)


@pytest.mark.parametrize("text", CASES)
def test_matches_reference_hf_tokenizer(ref_tokenizer, ours_hf, text):
    assert ours_hf.tokenize(text) == ref_tokenizer.tokenize(text)


@pytest.mark.parametrize("text", CASES)
def test_ids_roundtrip(ours_google, text):
    toks = ours_google.tokenize(text)
    ids = ours_google.convert_tokens_to_ids(toks)
    assert ours_google.convert_ids_to_tokens(ids) == toks


def test_google_vs_hf_agree_on_plain_queries(ours_google, ours_hf):
    # The two reference stacks use different tokenizer lineages but must agree
    # on ordinary product queries (no never_split specials, words < 100 chars).
    for text in CASES[:6]:
        assert ours_google.tokenize(text) == ours_hf.tokenize(text)


def test_encode_query_layout(ours_google):
    ids = ours_google.encode_query("red dress", max_len=20)
    cls_id = ours_google.vocab["[CLS]"]
    sep_id = ours_google.vocab["[SEP]"]
    assert ids[0] == cls_id and ids[-1] == sep_id and len(ids) <= 20


def test_long_query_truncation(ours_google):
    # 30 words -> more than 20 pieces; reference seq_padding keeps first 20,
    # cutting [SEP] (load_data_pred.py:74).
    q = " ".join(["dress"] * 30)
    ids = ours_google.encode_query(q, max_len=20)
    assert len(ids) == 20
    assert ids[-1] != ours_google.vocab["[SEP]"]


def test_vocab_size(ours_google):
    assert len(ours_google.vocab) == 21128
