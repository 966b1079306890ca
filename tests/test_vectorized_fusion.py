"""Vectorised (jnp segment-op) fusion must equal the dict implementation."""

import pytest

jax = pytest.importorskip("jax")

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble import (
    build_submission,
    load_csv_scores,
    load_tsv_scores,
    read_submission,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble.vectorized import (
    build_submission_vectorized,
)


def test_vectorized_matches_dict_on_goldens(reference_dir):
    pr = reference_dir / "prediction_result"
    b = load_tsv_scores(pr / "testB_result_match_keyword_valid_finetune_251.txt")
    c = load_tsv_scores(
        pr / "testB_result_match_keyword_valid_finetune_251_sen_to_forest.txt"
    )
    a = load_tsv_scores(pr / "testBscore_imagebert.txt")
    l = load_csv_scores(pr / "testB_score_lxmert.csv")

    vec = build_submission_vectorized(b, c, a, l)
    golden = read_submission(pr / "submission.csv")
    assert set(vec) == set(golden)
    mismatch = {q for q in golden if vec[q] != golden[q]}
    assert not mismatch, f"{len(mismatch)} mismatches, e.g. {list(mismatch)[:3]}"


def test_vectorized_synthetic_small():
    b = {"1": {"p1": 0.9, "p2": 0.1}, "2": {"p1": 0.2, "p3": 0.8}}
    rows_dict = build_submission_from_tables(b)
    rows_vec = build_submission_vectorized(b, b, b, b)
    assert rows_dict == rows_vec


def build_submission_from_tables(t):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble.fusion import (
        dedup_filter,
        fuse,
        top5_rows,
    )

    f = fuse(t, t, t, t)
    return top5_rows(dedup_filter(f), f.merge)
