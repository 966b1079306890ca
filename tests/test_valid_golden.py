"""Valid-set golden test: nDCG + rerank math on REAL score distributions.

The reference ships the per-pair ImageBERT-A scores it measured on the
14,720-pair valid set (``code/imagebert_lds/src/validscore_imagebert.txt``,
written by ``run_pretraining_evaluate.py:585-589``) plus the ground truth
(``code/imagebert_lds/valid_answer.json``), and its report (kdd-report
p.3 section 3) pins what the postprocessing does to them:

    raw 0.7098 -> product-argmax 0.7486 -> gap filter 0.8352

Running our single nDCG implementation + the ``dedup_filter`` rerank over
those committed files must land on the report's numbers EXACTLY -- the
only golden-based check of the rerank math on real (not synthetic, not
testB-fusion) score distributions. Two details recovered by measurement:

* raw 0.7098 equals the report's Table-5 "ImageBERT A + MS-loss" row, so
  the committed file is that model's valid run;
* the report's 0.8352 corresponds to a gap threshold of **0.9**; the
  shipped ``code/main.py:81`` uses 0.92 (re-tuned for the testB ensemble),
  which on this file gives 0.8371. Both are asserted.
"""

import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble import (
    dedup_filter,
    load_tsv_scores,
    single_model_fusion,
    top5_rows,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
    evaluate_scores,
    evaluate_submission,
    load_answers,
)


@pytest.fixture(scope="module")
def valid_golden(reference_dir):
    score_path = (
        reference_dir / "code" / "imagebert_lds" / "src" / "validscore_imagebert.txt"
    )
    answer_path = reference_dir / "code" / "imagebert_lds" / "valid_answer.json"
    for p in (score_path, answer_path):
        if not p.exists():
            pytest.skip(f"golden file missing: {p}")
    return load_tsv_scores(score_path), load_answers(answer_path)


def test_valid_file_shape(valid_golden):
    scores, answers = valid_golden
    assert sum(len(r) for r in scores.values()) == 14720  # evaluate.py:580
    assert set(scores) == set(answers)
    assert len(scores) == 496


def test_raw_ndcg_matches_report_table5(valid_golden):
    scores, answers = valid_golden
    # kdd-report p.2 Table 5: ImageBERT A + MS-loss, valid nDCG@5 = 0.7098
    assert round(evaluate_scores(scores, answers), 4) == 0.7098


def test_product_argmax_matches_report(valid_golden):
    scores, answers = valid_golden
    fus = single_model_fusion(scores)
    # gap=0 disables the gap drop (scores sorted desc: a[0]-a[1] >= 0),
    # leaving the keep-at-argmax-query-only rule (main.py:83-86)
    argmax_only = dedup_filter(fus, gap=0.0)
    # kdd-report p.3 section 3: "0.7486" for the product-argmax postproc
    assert round(evaluate_scores(argmax_only, answers), 4) == 0.7486


def test_gap_filter_matches_report(valid_golden):
    scores, answers = valid_golden
    fus = single_model_fusion(scores)
    # the report's 0.8352 is the gap filter at threshold 0.9
    assert round(evaluate_scores(dedup_filter(fus, gap=0.9), answers), 4) == 0.8352
    # at the shipped main.py:81 threshold (0.92, re-tuned on testB) the
    # same file gives 0.8371 -- pin it so the rerank math can't drift
    assert round(evaluate_scores(dedup_filter(fus), answers), 4) == 0.8371


def test_top5_fallback_on_real_distribution(valid_golden):
    """The <5-survivors fallback (main.py:101-104) engages on this file
    (exactly one query) and the resulting submission rows still evaluate
    above the filtered-table number."""
    scores, answers = valid_golden
    fus = single_model_fusion(scores)
    filtered = dedup_filter(fus)
    short = [q for q, r in filtered.items() if len(r) < 5]
    assert len(short) == 1
    rows = top5_rows(filtered, fus.merge)
    assert set(rows) == set(scores)
    assert all(len(r) == 5 for r in rows.values())
    assert round(evaluate_submission(rows, answers), 4) == 0.8385
