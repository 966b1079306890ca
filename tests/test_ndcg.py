"""nDCG@5 tests, cross-checked against the reference metric code."""

import importlib.util
import sys

import numpy as np
import pytest

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval import (
    dcg_at_k,
    evaluate_scores,
    evaluate_submission,
    ndcg_at_k,
)


def _load_ref_evaluation(reference_dir):
    if not hasattr(np, "asfarray"):  # removed in numpy 2.x; the py2-era ref uses it
        np.asfarray = lambda a: np.asarray(a, dtype=np.float64)
    spec = importlib.util.spec_from_file_location(
        "ref_eval", reference_dir / "code/imagebert_zk/evaluate_function.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_eval"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_dcg_basics():
    assert dcg_at_k([1, 1, 1], 5) == pytest.approx(1 + 1 / np.log2(3) + 1 / np.log2(4))
    assert dcg_at_k([], 5) == 0.0
    assert ndcg_at_k([1, 0, 0], [1], 5) == 1.0
    assert ndcg_at_k([0, 0, 0], [1], 5) == 0.0


def test_matches_reference_dcg(reference_dir):
    try:
        ref = _load_ref_evaluation(reference_dir)
    except Exception as e:
        pytest.skip(f"reference metric unimportable: {e}")
    rng = np.random.default_rng(0)
    for _ in range(20):
        r = rng.integers(0, 2, size=rng.integers(1, 8)).tolist()
        assert dcg_at_k(r, 5) == pytest.approx(ref.dcg_at_k(r, 5))
        ideal = [1] * int(rng.integers(1, 6))
        assert ndcg_at_k(r, ideal, 5) == pytest.approx(ref.get_ndcg(r, ideal, 5))


def test_evaluate_scores_perfect_ranking():
    scores = {"1": {"a": 0.9, "b": 0.8, "c": 0.1}}
    answers = {"1": ["a", "b"]}
    assert evaluate_scores(scores, answers) == 1.0


def test_evaluate_submission_missing_query_counts_zero():
    rows = {"1": ["a", "b", "c", "d", "e"]}
    answers = {"1": ["a"], "2": ["z"]}
    assert evaluate_submission(rows, answers) == pytest.approx(0.5)
