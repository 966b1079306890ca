"""Two-tower training + recall -> cross-encoder cascade (VERDICT item 10).

Runs the real CLIs end-to-end on synthetic data at tiny config: train the
dual encoder with in-batch InfoNCE, then cascade recall into a cross-encoder
rerank and check the recall@K / nDCG metric plumbing.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

TINY = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 37,
}
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "JAX_PLATFORM_NAME": "cpu",
    "KMR_CONFIG_OVERRIDES": json.dumps(TINY),
    "KMR_TOWER_CONFIG_OVERRIDES": json.dumps(
        {"bert": TINY, "embed_dim": 16, "temperature": 0.1}
    ),
}


def _run(args, timeout=480):
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=ENV, capture_output=True,
        text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        SYNTHETIC_LABELS,
        SYNTHETIC_QUERIES,
        make_row,
    )

    d = tmp_path_factory.mktemp("cascade")
    rng = np.random.default_rng(7)
    rows, answers = [], {}
    # 32 distinct queries (unique text per row, so in-batch InfoNCE has no
    # false negatives), one product each
    for i in range(32):
        qid, pid = i, 500000 + i
        query = f"{SYNTHETIC_QUERIES[i % len(SYNTHETIC_QUERIES)]} style {i}"
        rows.append(make_row(rng, product_id=pid, query_id=qid, query=query))
        answers[str(qid)] = [pid]
    (d / "pairs.tsv").write_text("\n".join(rows) + "\n")
    (d / "answers.json").write_text(json.dumps(answers))
    (d / "labels.txt").write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )
    return d


@pytest.fixture(scope="module")
def tower_run(data_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("tower_run")
    r = _run(
        [
            "scripts/train.py",
            "--model", "two_tower",
            "--train-tsv", str(data_dir / "pairs.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--steps", "80",
            "--batch-size", "16",  # divisible by the 8-device CPU mesh
            "--lr", "1e-3",  # 3e-3 collapses the tiny towers to the
            "--warmup-steps", "0",  # uniform-logit saddle; 1e-3 -> acc 1.0
            "--checkpoint-every", "80",
            "--out", str(out),
            # valid loop at the final step: regression for the two_tower
            # featurizer lookup in ScoringEngine (layout, not model name)
            "--valid-tsv", str(data_dir / "pairs.tsv"),
            "--answers", str(data_dir / "answers.json"),
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = [
        json.loads(line)
        for line in (out / "metrics.jsonl").read_text().splitlines()
    ]
    ndcgs = [m["valid_ndcg5"] for m in metrics if "valid_ndcg5" in m]
    assert ndcgs and 0.0 <= ndcgs[-1] <= 1.0
    return out


def test_tower_training_learns(tower_run):
    metrics = [
        json.loads(line)
        for line in (tower_run / "metrics.jsonl").read_text().splitlines()
    ]
    losses = [m["loss"] for m in metrics if "loss" in m]
    accs = [m["in_batch_accuracy"] for m in metrics if "in_batch_accuracy" in m]
    assert len(losses) >= 2
    assert np.isfinite(losses).all()
    # 80 steps over 32 distinct rows: in-batch retrieval must become much
    # better than the 1/16 random-chance start
    assert losses[-1] < losses[0]
    assert accs[-1] > 0.5, accs


def test_cascade_cli(data_dir, tower_run, tmp_path):
    out = tmp_path / "cascade.csv"
    r = _run(
        [
            "scripts/cascade.py",
            "--queries", str(data_dir / "pairs.tsv"),
            "--catalog", str(data_dir / "pairs.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--tower-checkpoint", str(tower_run / "step_80"),
            "--cross-model", "imagebert_b",
            "--k-recall", "40",  # >= catalog size -> recall@K must be 1.0
            "--out", str(out),
            "--answers", str(data_dir / "answers.json"),
            "--batch-size", "16",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["recall_at_k"] == 1.0
    assert 0.0 <= metrics["cascade_ndcg5"] <= 1.0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("query-id,product1")
    assert len(lines) == 33  # header + 32 queries
    # every emitted product must come from the recall stage's candidate set
    for line in lines[1:]:
        cells = line.split(",")
        assert len(cells) == 6  # exactly k_out product columns (empty-padded)
        for pid in cells[1:]:
            if pid:
                assert 500000 <= int(pid) < 500032


def test_cascade_cli_packed_catalog(data_dir, tower_run, tmp_path):
    """The 3M-regime path: recall.py build --packed --store-features once,
    then cascade straight off the memmapped catalog (no re-embed, no RAM
    feature dicts). Same invariants as the TSV-catalog run."""
    cat = tmp_path / "cat"
    r = _run(
        [
            "scripts/recall.py", "build",
            "--tsv", str(data_dir / "pairs.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--checkpoint", str(tower_run / "step_80"),
            "--out", str(cat), "--packed", "--store-features",
            "--shard-size", "10",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = tmp_path / "cascade_packed.csv"
    r = _run(
        [
            "scripts/cascade.py",
            "--queries", str(data_dir / "pairs.tsv"),
            "--catalog", str(cat),
            "--labels", str(data_dir / "labels.txt"),
            "--tower-checkpoint", str(tower_run / "step_80"),
            "--cross-model", "imagebert_b",
            "--k-recall", "40",
            "--chunk-rows", "13",  # multiple chunks, ragged tail
            "--out", str(out),
            "--answers", str(data_dir / "answers.json"),
            "--batch-size", "16",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["recall_at_k"] == 1.0
    assert 0.0 <= metrics["cascade_ndcg5"] <= 1.0
    lines = out.read_text().splitlines()
    assert len(lines) == 33
    for line in lines[1:]:
        cells = line.split(",")
        assert len(cells) == 6
        for pid in cells[1:]:
            if pid:
                assert 500000 <= int(pid) < 500032


def test_cascade_narrow_recall(data_dir, tower_run, tmp_path):
    """K=5 of 32: the trained tower must pull recall@K well above the 5/32
    random baseline (its in-batch accuracy is >0.5 after training)."""
    out = tmp_path / "cascade5.csv"
    r = _run(
        [
            "scripts/cascade.py",
            "--queries", str(data_dir / "pairs.tsv"),
            "--catalog", str(data_dir / "pairs.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--tower-checkpoint", str(tower_run / "step_80"),
            "--cross-model", "imagebert_b",
            "--k-recall", "5",
            "--out", str(out),
            "--answers", str(data_dir / "answers.json"),
            "--batch-size", "16",
        ]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["k"] == 5
    assert metrics["recall_at_k"] > 0.4, metrics  # random would be ~0.16
