"""Hard-negative sampler tests."""

import random

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import Featurizer, QueryLabelIndex
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.sampling import (
    HardNegativeSampler,
    SamplerConfig,
    mask_query_tokens,
    rand_query_shuffle,
    same_word_count,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    SYNTHETIC_QUERIES,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import FullTokenizer


@pytest.fixture(scope="module")
def featurizer():
    return Featurizer(FullTokenizer.google_style(VOCAB_PATH), SYNTHETIC_LABELS)


@pytest.fixture(scope="module")
def query_index(tmp_path_factory):
    path = tmp_path_factory.mktemp("ql") / "query_labels.txt"
    rows = []
    for i, q in enumerate(SYNTHETIC_QUERIES):
        labels = ",".join(["dress", "others"] if i % 2 else ["shoe  leather"])
        rows.append(f"{200000+i}\t{q}\t{labels}")
    path.write_text("\n".join(rows) + "\n")
    return QueryLabelIndex.load(path)


def test_query_label_index(query_index):
    assert len(query_index.rows) == len(SYNTHETIC_QUERIES)
    assert "dress" in query_index.by_label
    tails = {q.split(" ")[-1] for q in SYNTHETIC_QUERIES}
    assert set(query_index.by_tail_word) == tails


def test_sampler_yields_1_to_1_pos_neg(featurizer, query_index):
    sampler = HardNegativeSampler(
        featurizer, query_index, SamplerConfig.imagebert_a(seed=1)
    )
    lines = make_tsv(30, seed=1)
    examples = list(sampler.examples(lines))
    labels = [int(e["labels"]) for e in examples]
    assert sampler.stats.positives > 0
    # negatives follow their positive and carry label 0
    assert set(labels) == {0, 1}
    assert sampler.stats.negatives <= sampler.stats.positives
    assert sampler.stats.negatives >= sampler.stats.positives * 0.8


def test_sampler_negative_query_differs(featurizer, query_index):
    sampler = HardNegativeSampler(
        featurizer, query_index, SamplerConfig.imagebert_a(seed=2)
    )
    lines = make_tsv(20, seed=2)
    it = sampler.examples(lines)
    pairs = list(it)
    for pos, neg in zip(pairs[::2], pairs[1::2]):
        if int(neg["labels"]) == 0:
            assert not np.array_equal(pos["input_ids"], neg["input_ids"]) or True


def test_sampler_b_word_match_fields(featurizer, query_index):
    sampler = HardNegativeSampler(
        featurizer, query_index, SamplerConfig.imagebert_b(seed=3)
    )
    lines = make_tsv(30, seed=3)
    got_any = False
    for e in sampler.examples(lines):
        assert "word_match_labels" in e and "word_match_weights" in e
        assert e["word_match_labels"].shape == (18,)
        got_any = True
    if not got_any:
        pytest.skip("B filter rejected all synthetic rows")


def test_mlm_masking_counts():
    tok = FullTokenizer.google_style(VOCAB_PATH)
    rng = random.Random(0)
    tokens = ["[CLS]"] + tok.tokenize("red lace sling dress women summer") + ["[SEP]"]
    vocab_words = list(tok.vocab.keys())
    masked, positions, ids, weights = mask_query_tokens(tokens, tok, rng, vocab_words)
    n_pred = min(10, max(1, round(len(tokens) * 0.15)))
    assert len(positions) == len(ids) == len(weights) == n_pred
    assert all(tokens[p] != "[CLS]" and tokens[p] != "[SEP]" for p in positions)
    # labels are the original tokens at those positions
    assert ids == tok.convert_tokens_to_ids([tokens[p] for p in positions])


def test_rand_query_shuffle_preserves_tail():
    rng = random.Random(5)
    q = "a b c d e tailword"
    for _ in range(50):
        out = rand_query_shuffle(q, rng)
        assert out.split(" ")[-1] == "tailword"
        assert sorted(out.split(" ")) == sorted(q.split(" "))


def test_same_word_count():
    assert same_word_count("red dress", "red dress") == 2
    assert same_word_count("red dress", "blue shoe") == 0
