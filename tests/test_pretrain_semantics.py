"""Pin the rebuilt pretrain-sampler semantics against the ACTUAL reference
TFRecord instance builder (``imagebert_zk/generate_data.py:90-362``), round-3
verdict item 6.

The reference builder is pure Python + its own tokenizer; it is imported
untouched via the tf_ref_harness TF1 proxy and executed here. Three
behaviours are pinned:

1. MLM masking is TRACE-IDENTICAL: ``mask_query_tokens`` consumes the same
   ``random.Random`` stream as ``create_masked_lm_predictions`` (shuffle ->
   per-index 0.8 / 0.5 draws -> randint), so with equal seeds the outputs
   match exactly (``generate_data.py:565-643``; the lds training loader
   carries the same function, ``load_data_v4.py:391-465``).
2. The mask-count formula and the 80/10/10 replacement mix.
3. Product-keyed negative pairing: the reference draws the NSP negative from
   a different product_id (``generate_data.py:316-323``, ``random_product_id
   != product_id``), one negative per positive, alternating. The rebuilt
   sampler keeps the product-keyed constraint and the 1:1 ratio.

Reference quirk documented, not copied: the reference's negative instance
carries the *random* product's image AND its own query (the zip at
``generate_data.py:330-332`` pairs ``RandomIDfeature`` with
``Randomquerytokens``), i.e. a self-consistent pair labelled 0. The rebuild
pairs the CURRENT image with the other product's query -- the stated intent
(SURVEY 2.1: "random query from another product = negative") and what the
shipped fine-tune loaders actually do (``load_data_v4.py:245-295``). The
test asserts the reference's draw is product-keyed and that ours keeps the
same keying; it does not reproduce the image-side mislabeling.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.sampling import (
    HardNegativeSampler,
    SamplerConfig,
    mask_query_tokens,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
    Featurizer,
    QueryLabelIndex,
    load_multimodal_labels,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    make_row,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
    FullTokenizer,
)

REF_ZK = Path("/root/reference/code/imagebert_zk")

QUERIES = [
    "red lace sling dress women summer",
    "men leather shoe breathable",
    "student school bag large capacity",
    "chandelier living room lamp modern",
    "2019 new white shirt",
    "casual trousers loose",
    "fisherman hat sun protection",
    "watch strap stainless steel",
    "children early education machine",
    "sweet wind dress",
    "thin section trousers men",
    "large capacity hand bag",
]


@pytest.fixture(scope="module")
def ref(tmp_path_factory):
    """The untouched reference generate_data module (+ its tokenizer).

    Module-scoped: generate_data registers absl flags at import, which can
    only happen once per process.
    """
    if not REF_ZK.exists():
        pytest.skip("reference tree unavailable")
    from tf_ref_harness import reference_tf_modules

    with reference_tf_modules(
        ("tokenization", str(REF_ZK / "tokenization.py")),
        ("generate_data", str(REF_ZK / "generate_data.py")),
    ) as mods:
        gd = mods["generate_data"]
        gd.FLAGS.mark_as_parsed()
        assert gd.FLAGS.do_whole_word_mask is False  # reference default
        yield mods


@pytest.fixture(scope="module")
def our_tok():
    return FullTokenizer.google_style(VOCAB_PATH)


def test_mlm_masking_trace_identical(ref, our_tok):
    """Same rng seed, same tokens -> byte-identical masking decisions."""
    gd = ref["generate_data"]
    vocab_words = list(our_tok.vocab.keys())
    checked_positions = 0
    for qi, query in enumerate(QUERIES):
        tokens = ["[CLS]"] + our_tok.tokenize(query) + ["[SEP]"]
        for seed in range(8):
            want_tokens, want_pos, want_labels = gd.create_masked_lm_predictions(
                list(tokens), 0.15, 10, vocab_words, random.Random(1000 * qi + seed)
            )
            got_tokens, got_pos, got_ids, got_w = mask_query_tokens(
                list(tokens), our_tok, random.Random(1000 * qi + seed), vocab_words
            )
            assert got_tokens == want_tokens
            assert got_pos == list(want_pos)
            assert got_ids == our_tok.convert_tokens_to_ids(want_labels)
            assert got_w == [1.0] * len(want_pos)
            checked_positions += len(want_pos)
    assert checked_positions > 100  # the comparison actually exercised masks


def test_mask_count_formula_and_replacement_mix(our_tok):
    """num_to_predict = min(cap, max(1, round(len * 0.15)))
    (generate_data.py:592-593) and the 80/10/10 [MASK]/keep/random mix
    (:615-625), measured over a deterministic stream."""
    # sentinel vocab disjoint from the query tokens -> replacement source
    # is unambiguous when classifying the mix
    vocab_words = [f"zz{i}" for i in range(50)]
    rng = random.Random(42)
    n_mask = n_keep = n_rand = 0
    for rep in range(400):
        query = QUERIES[rep % len(QUERIES)]
        tokens = ["[CLS]"] + our_tok.tokenize(query) + ["[SEP]"]
        out, positions, ids, _ = mask_query_tokens(tokens, our_tok, rng, vocab_words)
        assert len(positions) == min(10, max(1, int(round(len(tokens) * 0.15))))
        for p in positions:
            if out[p] == "[MASK]":
                n_mask += 1
            elif out[p] == tokens[p]:
                n_keep += 1
            else:
                assert out[p].startswith("zz")
                n_rand += 1
    total = n_mask + n_keep + n_rand
    assert total >= 600  # ~1.75 masks per short query over 400 queries
    assert abs(n_mask / total - 0.8) < 0.035
    assert abs(n_keep / total - 0.1) < 0.035
    assert abs(n_rand / total - 0.1) < 0.035
    # short queries still mask at least one token (max(1, ...))
    short = ["[CLS]"] + our_tok.tokenize("hat") + ["[SEP]"]
    assert int(round(len(short) * 0.15)) <= 1
    out, positions, _, _ = mask_query_tokens(
        short, our_tok, random.Random(0), vocab_words
    )
    assert len(positions) == 1


def _ref_tsv(tmp_path, n_products=8, rows_per_product=2):
    """Synthetic rows in the reference's on-disk format, multiple queries
    per product (generate_data keys its instance builder by product_id)."""
    rng = np.random.default_rng(11)
    lines = ["product_id\timage_h\timage_w\tnum_boxes\tboxes\tfeatures\tlabels\tquery\tquery_id"]
    qid = 0
    row_products = {}
    for p in range(n_products):
        for _ in range(rows_per_product):
            q = QUERIES[qid % len(QUERIES)]
            lines.append(
                make_row(rng, product_id=p, query_id=qid, query=q, num_boxes=3)
            )
            row_products[qid] = p
            qid += 1
    path = tmp_path / "ref_pretrain.tsv"
    path.write_text("\n".join(lines) + "\n")
    return path, row_products


def test_reference_negative_pairing_is_product_keyed(ref, tmp_path):
    """Execute the reference builder per product (unshuffled) and pin its
    negative-pairing semantics: one negative per positive, alternating
    (negative, positive), negative drawn from a DIFFERENT product_id."""
    gd = ref["generate_data"]
    tok = ref["tokenization"].FullTokenizer(
        vocab_file=str(VOCAB_PATH), do_lower_case=True
    )
    path, row_products = _ref_tsv(tmp_path)

    # replicate create_training_instances' ingest (:245-283) so we can call
    # the per-product builder (:287) without the final shuffle hiding which
    # product each instance came from
    product_ids = {}
    with open(path) as f:
        lines = f.readlines()
    for line in lines[1:]:  # :260 iterates range(1, length): header skipped
        pid, h, w, nb, boxes, feats, labels, query, qid = (
            line.strip().split("\t")
        )
        feat = [int(h), int(w), int(nb), boxes, str(gd.convert_base64(feats)),
                labels, query, int(qid)]
        toks = tok.tokenize(query)
        product_ids.setdefault(int(pid), []).append([feat, toks])

    vocab_words = list(tok.vocab.keys())
    random.seed(3)  # global `choice` draws the random product (:317)
    rng = random.Random(12345)
    for pid in product_ids:
        instances = gd.create_instances_from_document_key(
            product_ids, pid, 30, 0.1, 0.15, 10, vocab_words, rng
        )
        own_qids = {f[0][7] for f in product_ids[pid]}
        assert len(instances) == 2 * len(product_ids[pid])
        for i, inst in enumerate(instances):
            if i % 2 == 0:  # negative first (zip order, :330-332)
                assert inst.is_random_next is True
                # product-keyed: the draw rejects the current product (:320)
                assert row_products[inst.query_id] != pid
            else:
                assert inst.is_random_next is False
                assert inst.query_id in own_qids


def test_rebuilt_sampler_matches_reference_pairing_invariants(tmp_path):
    """The rebuilt sampler keeps the pinned invariants on the same rows:
    1:1 positive:negative, alternating labels 1 then 0, and the negative
    query never from the positive's own product (nor equal to its query)."""
    rng = np.random.default_rng(11)
    rows, qlabel_lines = [], []
    for p in range(8):
        for j in range(2):
            # unique query text per row so query -> product is unambiguous
            q = f"{QUERIES[(2 * p + j) % len(QUERIES)]} style {2 * p + j}"
            rows.append(make_row(rng, product_id=p, query_id=2 * p + j,
                                 query=q, num_boxes=3))
            qlabel_lines.append(f"{p}\t{q}\tdress,others")
    qlabels = tmp_path / "query_labels.txt"
    qlabels.write_text("\n".join(qlabel_lines) + "\n")

    tok = FullTokenizer.google_style(VOCAB_PATH)
    featurizer = Featurizer(tok, dict(SYNTHETIC_LABELS))
    index = QueryLabelIndex.load(qlabels)
    query_to_product = {}
    for line in qlabel_lines:
        pid, q, _ = line.split("\t")
        query_to_product.setdefault(q.strip(), set()).add(int(pid))

    sampler = HardNegativeSampler(
        featurizer, index, SamplerConfig.imagebert_a(seed=5)
    )
    stream = list(sampler.examples(iter(rows)))
    assert sampler.stats.positives == sampler.stats.negatives == len(rows)
    labels = [int(ex["labels"]) for ex in stream]
    assert labels == [1, 0] * len(rows)

    # direct check of the mining constraint over many draws
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.tsv import parse_line

    for line in rows:
        ex = parse_line(line)
        for _ in range(10):
            neg_q = sampler.mine_negative(ex, ["dress", "others"])
            assert neg_q is not None
            assert neg_q.strip() != ex.query.strip()
            assert ex.product_id not in query_to_product[neg_q.strip()]
