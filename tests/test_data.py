"""Data-layer tests: TSV parsing, box geometry, layouts, pipeline."""

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
    Featurizer,
    PipelineStats,
    batches_from_files,
    iter_batches,
    parse_line,
    rewrite_sen2forest,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    make_row,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import FullTokenizer


@pytest.fixture(scope="module")
def tok():
    return FullTokenizer.google_style(VOCAB_PATH)


@pytest.fixture(scope="module")
def featurizer(tok):
    return Featurizer(tok, SYNTHETIC_LABELS)


def test_parse_roundtrip():
    rng = np.random.default_rng(0)
    line = make_row(rng, product_id=42, query_id=7, query="red dress", num_boxes=4)
    ex = parse_line(line)
    assert ex.product_id == 42 and ex.query_id == 7
    assert ex.boxes.shape == (4, 4) and ex.features.shape == (4, 2048)
    assert ex.class_labels.shape == (4,) and ex.query == "red dress"


def test_boxes5_matches_reference_math():
    # Reference: load_data_pred.py:101-105.
    rng = np.random.default_rng(1)
    ex = parse_line(make_row(rng, 1, 1, num_boxes=3, image_h=640, image_w=480))
    b5 = ex.boxes_5()
    ref = np.zeros((3, 5), dtype=np.float32)
    ref[:, :4] = ex.boxes / [640, 480, 640, 480]
    ref[:, 4] = (ex.boxes[:, 2] - ex.boxes[:, 0]) * (ex.boxes[:, 3] - ex.boxes[:, 1]) / (480 * 640)
    np.testing.assert_allclose(b5, ref, rtol=1e-6)


def test_imagebert_a_layout(featurizer):
    rng = np.random.default_rng(2)
    ex = parse_line(make_row(rng, 1, 1, query="red lace dress", num_boxes=10))
    f = featurizer.imagebert_a(ex)
    assert f["input_ids"].shape == (20,) and f["input_ids"].dtype == np.int32
    assert f["boxes"].shape == (10, 5)
    assert f["features"].shape == (10, 2048)
    assert f["label_ids"].shape == (10, 8)
    # CLS first, SEP after last query piece
    assert f["input_ids"][0] == featurizer.tokenizer.vocab["[CLS]"]


def test_box_truncation_keeps_first_10(featurizer):
    rng = np.random.default_rng(3)
    line = make_row(rng, 1, 1, num_boxes=15)
    ex = parse_line(line)
    f = featurizer.imagebert_a(ex)
    np.testing.assert_allclose(f["features"], ex.features[:10])


def test_imagebert_b_layout_and_masks(featurizer):
    rng = np.random.default_rng(4)
    ex = parse_line(make_row(rng, 1, 1, query="chandelier lamp", num_boxes=6))
    f = featurizer.imagebert_b(ex)
    assert f["segment_ids"].tolist() == [0] * 20 + [1] * 10
    assert f["num_boxes"] == 6
    assert f["len_query"] == len(
        featurizer.tokenizer.encode_query("chandelier lamp")
    )


def test_sen2forest_rewrite(tok):
    assert (
        rewrite_sen2forest("sen department of sweet dress")
        == "forest style sweet dress"
    )
    fc = Featurizer(tok, SYNTHETIC_LABELS, sen2forest=True)
    fb = Featurizer(tok, SYNTHETIC_LABELS, sen2forest=False)
    rng = np.random.default_rng(5)
    ex = parse_line(make_row(rng, 1, 1, query="sen department of sweet dress"))
    a = fc.imagebert_b(ex)["input_ids"]
    b = fb.imagebert_b(ex)["input_ids"]
    assert not np.array_equal(a, b)


def test_lxmert_layout(featurizer):
    rng = np.random.default_rng(6)
    ex = parse_line(make_row(rng, 1, 1, query="student school bag", num_boxes=3))
    f = featurizer.lxmert(ex)
    assert f["input_ids"].shape == (23,)
    assert f["boxes"].shape == (10, 4)
    assert f["feats_mask"].tolist() == [1, 1, 1] + [0] * 7
    assert f["label_mask"].shape == (10, 8)
    # Padded box rows have all-zero label masks.
    assert f["label_mask"][3:].sum() == 0


def test_iter_batches_pads_tail(featurizer):
    lines = make_tsv(7, seed=7)
    stats = PipelineStats()
    batches = list(iter_batches(lines, featurizer.imagebert_a, 4, stats=stats))
    assert len(batches) == 2
    assert stats.parsed == 7 and stats.errors == 0
    assert batches[0]["valid"].all()
    assert batches[1]["valid"].tolist() == [True, True, True, False]
    assert batches[1]["input_ids"].shape == (4, 20)


def test_pipeline_counts_errors(featurizer):
    lines = make_tsv(3, seed=8) + ["garbage\tline\n"]
    stats = PipelineStats()
    list(iter_batches(lines, featurizer.imagebert_a, 2, stats=stats))
    assert stats.errors == 1 and stats.parsed == 3


def test_prefetch_matches_sync(featurizer, tmp_path):
    lines = make_tsv(10, seed=9)
    p = tmp_path / "t.tsv"
    p.write_text("\n".join(lines) + "\n")
    sync = list(iter_batches(lines, featurizer.imagebert_a, 3))
    pre = list(batches_from_files([p], featurizer.imagebert_a, 3, prefetch=2))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_planted_rows_differ_only_in_features():
    """make_row(planted=...) adds a query-text-keyed direction to the RoI
    features and changes NOTHING else for the same seed: boxes, labels,
    query, and ids stay byte-identical, so planted sets are drop-in twins
    of the throughput-bench sets."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        query_direction,
    )

    a = parse_line(make_row(np.random.default_rng(9), 5, 3, num_boxes=4))
    b = parse_line(
        make_row(np.random.default_rng(9), 5, 3, num_boxes=4, planted=6.0)
    )
    np.testing.assert_array_equal(a.boxes, b.boxes)
    np.testing.assert_array_equal(a.class_labels, b.class_labels)
    assert a.query == b.query and a.product_id == b.product_id
    d = query_direction(a.query)
    np.testing.assert_allclose(
        b.features - a.features, np.tile(6.0 * d, (4, 1)), rtol=1e-5, atol=1e-5
    )
    # text-keyed, deterministic, unit-norm: same text -> same direction
    np.testing.assert_array_equal(d, query_direction(a.query))
    assert abs(float(np.linalg.norm(d)) - 1.0) < 1e-5
    assert not np.allclose(d, query_direction("another query"))


def test_planted_signal_is_linearly_separable():
    """The planted direction must be recoverable from the features by a
    linear probe -- the property the distillation fidelity demo relies on
    (a trained teacher can only produce a learnable score surface if
    query<->feature alignment is real)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        query_direction,
    )

    lines = make_tsv(64, seed=13, n_queries=4, planted=6.0)
    pos, neg = [], []
    for ln in lines[1:]:
        ex = parse_line(ln)
        own = float(ex.features.mean(0) @ query_direction(ex.query))
        other = float(ex.features.mean(0) @ query_direction("unrelated text"))
        pos.append(own)
        neg.append(other)
    # own-query projection carries the planted offset, cross-query does not
    assert np.mean(pos) > 5.0
    assert abs(np.mean(neg)) < 1.0


def test_make_eval_tsv_ground_truth():
    """make_eval_tsv rows carry the planted direction the answers say they
    do: matching products project onto their query's direction, mismatched
    ones onto some other query's."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        make_eval_tsv,
        query_direction,
    )

    lines, answers = make_eval_tsv(80, seed=3, planted=6.0, mismatch_rate=0.5)
    assert answers and all(v for v in answers.values())
    truth = {p for pids in answers.values() for p in pids}
    n_match = 0
    for ln in lines[1:]:
        ex = parse_line(ln)
        proj = float(ex.features.mean(0) @ query_direction(ex.query))
        if ex.product_id in truth:
            assert proj > 4.0  # own direction planted
            n_match += 1
        else:
            assert proj < 2.0  # another query's direction planted
    assert 0 < n_match < 79  # both classes present
