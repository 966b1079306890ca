"""True end-to-end pipeline test: synthetic testB -> native parser ->
ScoringEngine -> score files for ALL FOUR models -> fusion -> submission.

Mirrors the reference's full inference pipeline (``code/main.py`` +
the four scorer drivers) at 1/10 testB scale (2,883 rows vs 28,830 --
``run_pretraining_predict.py:578``), via the real CLI surfaces in
subprocesses. Count integrity is enforced with ``--expect-pairs``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
N_ROWS = 2883  # 1/10 of the reference's asserted testB pair count

TINY_ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "JAX_PLATFORM_NAME": "cpu",
    # persistent compile cache: subprocesses skip recompiles across runs
    "JAX_COMPILATION_CACHE_DIR": str(REPO / ".jax_cache"),
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
    "KMR_CONFIG_OVERRIDES": json.dumps(
        {
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 37,
        }
    ),
}


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=TINY_ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def testb(tmp_path_factory):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        SYNTHETIC_LABELS,
        make_tsv,
    )

    d = tmp_path_factory.mktemp("testb")
    (d / "testB.tsv").write_text("\n".join(make_tsv(N_ROWS, seed=42)) + "\n")
    (d / "labels.txt").write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )
    return d


def test_full_pipeline_all_models_to_submission(testb, tmp_path):
    score_files = {}
    for model in ("imagebert_b", "imagebert_c", "imagebert_a", "lxmert"):
        out = tmp_path / f"testBscore_{model}.txt"
        r = _run(
            [
                "scripts/score.py",
                "--model", model,
                "--tsv", str(testb / "testB.tsv"),
                "--labels", str(testb / "labels.txt"),
                "--out", str(out),
                "--batch-size", "256",
                "--expect-pairs", str(N_ROWS),
            ]
        )
        assert r.returncode == 0, f"{model}: {r.stderr[-2000:]}"
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["pairs"] == N_ROWS
        assert stats["parse_errors"] == 0
        # score files carry every pair exactly once
        n_lines = len(out.read_text().splitlines())
        assert n_lines == N_ROWS + (1 if model == "lxmert" else 0)  # csv header
        score_files[model] = out

    submission = tmp_path / "submission.csv"
    r = _run(
        [
            "scripts/submission.py",
            "--scores-b", str(score_files["imagebert_b"]),
            "--scores-c", str(score_files["imagebert_c"]),
            "--scores-a", str(score_files["imagebert_a"]),
            "--scores-lxmert", str(score_files["lxmert"]),
            "--out", str(submission),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # submission covers every query, only candidate products, <=5 per query
    candidates: dict[str, set[str]] = {}
    for line in (testb / "testB.tsv").read_text().splitlines()[1:]:
        cols = line.split("\t")
        candidates.setdefault(cols[-1], set()).add(cols[0])
    lines = submission.read_text().splitlines()
    assert lines[0].startswith("query-id,product1")
    rows = {l.split(",")[0]: [p for p in l.split(",")[1:] if p] for l in lines[1:]}
    assert sorted(rows) == sorted(candidates)
    for q, prods in rows.items():
        assert 1 <= len(prods) <= 5
        assert len(set(prods)) == len(prods)  # no duplicates within a query
        assert set(prods) <= candidates[q]


def test_expect_pairs_refuses_short_output(testb, tmp_path):
    out = tmp_path / "short.txt"
    r = _run(
        [
            "scripts/score.py",
            "--model", "imagebert_a",
            "--tsv", str(testb / "testB.tsv"),
            "--labels", str(testb / "labels.txt"),
            "--out", str(out),
            "--batch-size", "256",
            "--expect-pairs", str(N_ROWS + 1),
        ]
    )
    assert r.returncode == 3
    assert "refusing to write" in r.stderr
    assert not out.exists()
