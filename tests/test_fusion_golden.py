"""End-to-end fusion test against the reference's committed golden outputs.

The reference repo ships the four per-model testB score files AND the final
``submission.csv`` produced from them by ``code/main.py``. Running our fusion
stage over the same four inputs must reproduce the exact query -> top-5
mapping for all 994 queries (row order differs: py2 dict hash order).
"""

import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble import (
    build_submission,
    read_submission,
)


@pytest.fixture(scope="module")
def golden_paths(reference_dir):
    pr = reference_dir / "prediction_result"
    paths = {
        "b": pr / "testB_result_match_keyword_valid_finetune_251.txt",
        "c": pr / "testB_result_match_keyword_valid_finetune_251_sen_to_forest.txt",
        "a": pr / "testBscore_imagebert.txt",
        "lxmert": pr / "testB_score_lxmert.csv",
        "submission": pr / "submission.csv",
    }
    for p in paths.values():
        if not p.exists():
            pytest.skip(f"golden file missing: {p}")
    return paths


def test_submission_matches_golden(golden_paths, tmp_path):
    out = tmp_path / "submission.csv"
    rows = build_submission(
        golden_paths["b"],
        golden_paths["c"],
        golden_paths["a"],
        golden_paths["lxmert"],
        out_path=out,
    )
    golden = read_submission(golden_paths["submission"])
    assert set(rows) == set(golden)
    mismatches = {q: (rows[q], golden[q]) for q in golden if rows[q] != golden[q]}
    assert not mismatches, f"{len(mismatches)} mismatching queries: {list(mismatches.items())[:3]}"
    # and the file we wrote roundtrips
    assert read_submission(out) == rows


def test_row_and_query_counts(golden_paths):
    rows = build_submission(
        golden_paths["b"],
        golden_paths["c"],
        golden_paths["a"],
        golden_paths["lxmert"],
    )
    golden = read_submission(golden_paths["submission"])
    assert len(rows) == len(golden)
    for q, products in rows.items():
        assert len(products) == 5 and len(set(products)) == 5


def test_single_model_top5():
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble import (
        single_model_top5,
    )

    scores = {"1": {"a": 0.1, "b": 0.9, "c": 0.5, "d": 0.2, "e": 0.8, "f": 0.3}}
    rows = single_model_top5(scores)
    assert rows["1"] == ["b", "e", "c", "f", "d"]
