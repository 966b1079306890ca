"""End-to-end CLI smoke tests (tiny config via KMR_CONFIG_OVERRIDES)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

TINY_ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "JAX_PLATFORM_NAME": "cpu",
    "KMR_CONFIG_OVERRIDES": json.dumps(
        {
            "hidden_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "intermediate_size": 37,
        }
    ),
}


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        SYNTHETIC_LABELS,
        SYNTHETIC_QUERIES,
        make_tsv,
    )

    d = tmp_path_factory.mktemp("clidata")
    (d / "test.tsv").write_text("\n".join(make_tsv(12, seed=21)) + "\n")
    (d / "labels.txt").write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )
    (d / "query_labels.txt").write_text(
        "\n".join(
            f"{300000+i}\t{q}\tdress,others" for i, q in enumerate(SYNTHETIC_QUERIES)
        )
        + "\n"
    )
    return d


def _run(args, timeout=480):
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=TINY_ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_score_cli(data_dir, tmp_path):
    out = tmp_path / "scores.txt"
    r = _run(
        [
            "scripts/score.py",
            "--model", "imagebert_a",
            "--tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--out", str(out),
            "--batch-size", "8",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["pairs"] == 12
    assert len(out.read_text().splitlines()) == 12


def test_submission_cli(data_dir, tmp_path):
    # score once, then fuse four copies of the same file
    scores = tmp_path / "s.txt"
    r = _run(
        [
            "scripts/score.py",
            "--model", "imagebert_a",
            "--tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--out", str(scores),
            "--batch-size", "8",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    csv = tmp_path / "s.csv"
    csv.write_text(
        "query-id,product-id,score\n"
        + "".join(
            ",".join(line.split("\t")) + "\n"
            for line in scores.read_text().splitlines()
        )
    )
    out = tmp_path / "submission.csv"
    r = _run(
        [
            "scripts/submission.py",
            "--scores-b", str(scores),
            "--scores-c", str(scores),
            "--scores-a", str(scores),
            "--scores-lxmert", str(csv),
            "--out", str(out),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
    assert out.read_text().startswith("query-id,product1")


def test_submission_cli_single_model(tmp_path):
    """testA direct-submission flow: one score file -> top-5, no fusion
    (run_pretraining_predict.py:585-598)."""
    scores = tmp_path / "testA.txt"
    scores.write_text(
        "".join(
            f"q1\tp{i}\t{0.1 * i:.2f}\n" for i in range(8)
        )
        + "q2\tp0\t0.9\nq2\tp1\t0.1\n"  # <5 products: emitted as-is, no fallback
    )
    out = tmp_path / "single.csv"
    r = _run(["scripts/submission.py", "--single", str(scores), "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text().splitlines()
    assert lines[0].startswith("query-id,product1")
    rows = {ln.split(",")[0]: ln.strip().split(",")[1:] for ln in lines[1:]}
    assert rows["q1"] == ["p7", "p6", "p5", "p4", "p3"]
    assert rows["q2"] == ["p0", "p1"]

    # four-file mode still demands all four score files
    r = _run(["scripts/submission.py", "--scores-b", str(scores), "--out", str(out)])
    assert r.returncode != 0 and "missing" in r.stderr


def test_train_cli(data_dir, tmp_path):
    out_dir = tmp_path / "run"
    r = _run(
        [
            "scripts/train.py",
            "--model", "imagebert_b",
            "--train-tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--query-labels", str(data_dir / "query_labels.txt"),
            "--steps", "2",
            "--batch-size", "8",
            "--out", str(out_dir),
            "--checkpoint-every", "2",
        ],
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "metrics.jsonl").exists()
    metrics = [json.loads(l) for l in (out_dir / "metrics.jsonl").read_text().splitlines()]
    assert metrics and "loss" in metrics[0]
    assert (out_dir / "step_2").exists()


def test_train_cli_valid_loop(data_dir, tmp_path):
    """--valid-tsv/--answers: training-time nDCG@5 + best-checkpoint
    selection (the reference's finetune_valid workflow)."""
    # ground truth: every product each query appears with in the tsv
    answers: dict[str, list[int]] = {}
    for line in (data_dir / "test.tsv").read_text().splitlines()[1:]:
        cols = line.split("\t")
        answers.setdefault(cols[-1], []).append(int(cols[0]))
    answers_path = tmp_path / "valid_answer.json"
    answers_path.write_text(json.dumps(answers))

    out_dir = tmp_path / "run"
    r = _run(
        [
            "scripts/train.py",
            "--model", "imagebert_b",
            "--train-tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--query-labels", str(data_dir / "query_labels.txt"),
            "--steps", "2",
            "--batch-size", "8",
            "--out", str(out_dir),
            "--checkpoint-every", "2",
            "--valid-tsv", str(data_dir / "test.tsv"),
            "--answers", str(answers_path),
            "--valid-every", "1",
        ],
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = [
        json.loads(l) for l in (out_dir / "metrics.jsonl").read_text().splitlines()
    ]
    ndcgs = [m["valid_ndcg5"] for m in metrics if "valid_ndcg5" in m]
    assert len(ndcgs) == 2  # evaluated at both steps
    assert all(0.0 <= v <= 1.0 for v in ndcgs)
    assert (out_dir / "best").exists()
    meta = json.loads((out_dir / "best_metadata.json").read_text())
    assert meta["valid_ndcg5"] == pytest.approx(max(ndcgs))


def test_recall_cli(data_dir, tmp_path):
    catalog = tmp_path / "catalog.npz"
    r = _run(
        [
            "scripts/recall.py", "build",
            "--tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--out", str(catalog),
        ],
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "recall.tsv"
    r = _run(
        [
            "scripts/recall.py", "query",
            "--tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--catalog", str(catalog),
            "--out", str(out),
            "--k", "3",
        ],
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = out.read_text().splitlines()
    assert len(rows) == 12
    assert all(len(row.split("\t")[1].split(",")) == 3 for row in rows)


def test_train_resume(data_dir, tmp_path):
    out_dir = tmp_path / "run"
    base = [
        "scripts/train.py",
        "--model", "imagebert_b",
        "--train-tsv", str(data_dir / "test.tsv"),
        "--labels", str(data_dir / "labels.txt"),
        "--query-labels", str(data_dir / "query_labels.txt"),
        "--batch-size", "8",
        "--out", str(out_dir),
        "--checkpoint-every", "2",
    ]
    r = _run([*base, "--steps", "2"], timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "state_2").exists()
    r = _run([*base, "--steps", "2", "--resume", str(out_dir / "state_2")], timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resumed from" in r.stdout and "at step 2" in r.stdout


def test_main_cli_one_shot_submission(data_dir, tmp_path):
    """The reference code/main.py equivalent: one command, four scorers,
    fused submission."""
    out = tmp_path / "pred"
    r = _run(
        [
            "scripts/main.py",
            "--tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--workdir", str(out),
            "--batch-size", "8",
            "--expect-pairs", "12",
            "--workers", "1",  # pass-through to each scorer's loader
        ],
        timeout=580,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    sub = Path(summary["submission"])
    assert sub.exists()
    lines = sub.read_text().splitlines()
    assert lines[0].startswith("query-id,product1")
    assert summary["queries"] == len(lines) - 1 > 0
    # wall-clock breakdown: one entry per scorer + fusion, engine window
    # bounded by the subprocess wall
    bd = summary["breakdown"]
    assert set(bd) == {"imagebert_a", "imagebert_b", "imagebert_c",
                       "lxmert", "fusion"}
    for model in ("imagebert_a", "imagebert_b", "lxmert"):
        assert bd[model]["scored_pairs"] == 12
        assert 0 < bd[model]["engine_s"] <= bd[model]["wall_s"]
    assert bd["imagebert_c"]["scored_pairs"] <= 12  # delta pass
    assert summary["total_wall_s"] >= bd["fusion"]["wall_s"]
    # all four intermediate score files landed in the workdir
    assert sorted(p.name for p in out.iterdir() if "score" in p.name) == [
        "testB_score_a.txt", "testB_score_b.txt", "testB_score_c.txt",
        "testB_score_lxmert.csv",
    ]


def _score(model, tsv, labels, out, extra=()):
    r = _run(
        [
            "scripts/score.py",
            "--model", model,
            "--tsv", str(tsv),
            "--labels", str(labels),
            "--out", str(out),
            "--batch-size", "8",
            *extra,
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_c_delta_pass_bit_identical(data_dir, tmp_path):
    """C-as-delta guard (round-3 verdict next-step 3): scoring only the
    sen2forest-rewritten rows and copying B's scores for the rest must give
    a score file bit-identical to the full C pass.  C is B's checkpoint plus
    a data-layer query rewrite (imagebert_zk/load_data_v4.py:153-154), so
    unaffected rows ARE B's scores by construction."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        SYNTHETIC_QUERIES,
        make_row,
    )
    import numpy as np

    rng = np.random.default_rng(7)
    # deterministic mix: rows 2, 5, 9 carry the rewrite trigger
    rows = []
    for i in range(12):
        q = (
            "sen department of sweet dress"
            if i in (2, 5, 9)
            else SYNTHETIC_QUERIES[i % 4 * 2]  # skip the sen query slot
        )
        assert (("sen department of" in q) == (i in (2, 5, 9)))
        rows.append(make_row(rng, product_id=100 + i, query_id=500 + i, query=q))
    tsv = tmp_path / "mix.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    labels = data_dir / "labels.txt"

    b_file = tmp_path / "b.txt"
    _score("imagebert_b", tsv, labels, b_file)
    c_full = tmp_path / "c_full.txt"
    _score("imagebert_c", tsv, labels, c_full)
    c_delta = tmp_path / "c_delta.txt"
    stats = _score(
        "imagebert_c", tsv, labels, c_delta, extra=("--delta-from", str(b_file))
    )
    assert stats["scored_pairs"] == 3, "only the 3 rewritten rows hit the device"
    assert stats["pairs"] == 12
    assert c_delta.read_text() == c_full.read_text()
    # rewritten rows must genuinely differ from B (the rewrite changes them)
    assert c_delta.read_text() != b_file.read_text()


def test_c_delta_no_trigger_rows_skips_device(data_dir, tmp_path):
    """With no 'sen department of' queries, the delta pass copies B's file
    verbatim and never loads params or compiles."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        make_row,
    )
    import numpy as np

    rng = np.random.default_rng(8)
    rows = [
        make_row(rng, product_id=200 + i, query_id=600 + i,
                 query="men leather shoe breathable")
        for i in range(6)
    ]
    tsv = tmp_path / "nosen.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    labels = data_dir / "labels.txt"

    b_file = tmp_path / "b.txt"
    _score("imagebert_b", tsv, labels, b_file)
    c_full = tmp_path / "c_full.txt"
    _score("imagebert_c", tsv, labels, c_full)
    c_delta = tmp_path / "c_delta.txt"
    stats = _score(
        "imagebert_c", tsv, labels, c_delta,
        extra=("--delta-from", str(b_file), "--expect-pairs", "6"),
    )
    assert stats["scored_pairs"] == 0
    assert c_delta.read_text() == c_full.read_text() == b_file.read_text()


def test_c_delta_rejects_mismatched_base(data_dir, tmp_path):
    """A B file from a DIFFERENT tsv must be refused, not silently merged."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
        make_row,
    )
    import numpy as np

    rng = np.random.default_rng(9)
    tsv = tmp_path / "sen.tsv"
    tsv.write_text(
        make_row(rng, product_id=1, query_id=1,
                 query="sen department of sweet dress") + "\n"
    )
    wrong_b = tmp_path / "wrong_b.txt"
    wrong_b.write_text("999\t999\t0.5\n")
    r = _run(
        [
            "scripts/score.py",
            "--model", "imagebert_c",
            "--tsv", str(tsv),
            "--labels", str(data_dir / "labels.txt"),
            "--out", str(tmp_path / "c.txt"),
            "--batch-size", "8",
            "--delta-from", str(wrong_b),
        ]
    )
    assert r.returncode == 4
    assert "absent from" in r.stderr


def test_score_fidelity_cli(tmp_path):
    """scripts/score_fidelity.py: hand-built tables with known rank metrics.

    q1 identical, q2 has its top-2 swapped (1 discordant pair of 15), q3 is
    missing from the candidate entirely.  Candidate is a .csv to exercise
    the LXMERT-format loader against the reference-format .txt."""
    ref = tmp_path / "teacher.txt"
    cand = tmp_path / "student.csv"
    pids = [f"p{i}" for i in range(6)]
    ref_rows, cand_rows = [], ["query-id,product-id,score"]
    for qid in ("q1", "q2", "q3"):
        for i, pid in enumerate(pids):
            ref_rows.append(f"{qid}\t{pid}\t{0.9 - 0.1 * i}")
    for qid in ("q1", "q2"):
        for i, pid in enumerate(pids):
            s = 0.9 - 0.1 * i
            if qid == "q2" and i in (0, 1):  # swap top-2 scores
                s = 0.9 - 0.1 * (1 - i)
            cand_rows.append(f"{qid},{pid},{s}")
    ref.write_text("\n".join(ref_rows) + "\n")
    cand.write_text("\n".join(cand_rows) + "\n")

    r = _run(
        [
            "scripts/score_fidelity.py",
            "--reference", str(ref),
            "--candidate", str(cand),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_queries"] == 2
    assert out["n_pairs"] == 12
    assert out["missing_queries"] == 1
    assert out["missing_pairs"] == 0
    assert out["kendall_tau_min"] == pytest.approx(13 / 15, abs=1e-4)
    assert out["kendall_tau_mean"] == pytest.approx((1 + 13 / 15) / 2, abs=1e-4)
    # the swap stays inside the top-5 set, so overlap and nDCG are unhurt
    assert out["topk_overlap_min"] == 1.0
    assert out["ndcg_delta"] == 0.0


def test_train_cli_init_from_grows_depth(data_dir, tmp_path):
    """--init-from with a SHALLOWER checkpoint: progressive-stacking growth
    (each source layer duplicated), the from-scratch escape hatch for deep
    Post-LN stacks. The loaded tree is depth-mapped, optimizer state fresh."""

    def run_depth(layers, extra):
        env = dict(TINY_ENV)
        env["KMR_CONFIG_OVERRIDES"] = json.dumps(
            {**json.loads(TINY_ENV["KMR_CONFIG_OVERRIDES"]),
             "num_hidden_layers": layers}
        )
        base = [
            "scripts/train.py",
            "--model", "imagebert_b",
            "--train-tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--query-labels", str(data_dir / "query_labels.txt"),
            "--steps", "2", "--batch-size", "8",
            "--checkpoint-every", "2",
        ]
        return subprocess.run(
            [sys.executable, *base, *extra], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=540,
        )

    shallow = tmp_path / "shallow"
    r = run_depth(1, ["--out", str(shallow)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert (shallow / "step_2").exists()

    deep = tmp_path / "deep"
    r = run_depth(2, ["--out", str(deep),
                      "--init-from", str(shallow / "step_2")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "depth-mapped" in r.stdout
    assert (deep / "step_2").exists()


def test_train_cli_online_distillation(data_dir, tmp_path):
    """--distill-from: the teacher scores every sampler batch on device and
    the student blends soft CE with the hard loss -- the online counterpart
    of scripts/distill.py's offline transfer-set flow."""
    teacher = tmp_path / "teacher"
    r = _run(
        [
            "scripts/train.py",
            "--model", "imagebert_b",
            "--train-tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--query-labels", str(data_dir / "query_labels.txt"),
            "--steps", "2", "--batch-size", "8",
            "--out", str(teacher), "--checkpoint-every", "2",
        ],
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    student = tmp_path / "student"
    r = _run(
        [
            "scripts/train.py",
            "--model", "imagebert_b",
            "--train-tsv", str(data_dir / "test.tsv"),
            "--labels", str(data_dir / "labels.txt"),
            "--query-labels", str(data_dir / "query_labels.txt"),
            "--steps", "2", "--batch-size", "8",
            "--out", str(student), "--checkpoint-every", "2",
            "--layers", "1",
            "--init-from", str(teacher / "step_2"),
            "--distill-from", str(teacher / "step_2"),
        ],
        timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "online distillation" in r.stdout
    metrics = [
        json.loads(l) for l in (student / "metrics.jsonl").read_text().splitlines()
    ]
    assert metrics and "distill_loss" in metrics[0]
    assert "loss" in metrics[0]  # hard loss still blended (default 0.5)
    # the sidecar lets score.py/export.py rebuild the 1-layer student spec
    sidecar = json.loads((student / "student_config.json").read_text())
    assert sidecar["overrides"]["num_hidden_layers"] == 1
