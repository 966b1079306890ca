"""Distillation tests: soft-CE math, layer mapping, student init,
serving-mode log-odds consistency, offline end-to-end learning, and the
CLI round-trip (distill -> score with auto student_config pickup).

No reference counterpart (the reference serves the full 4-model ensemble);
the capability compresses the ensemble into one shallow student
(train/distill.py, scripts/distill.py).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
    Featurizer,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.pipeline import (
    iter_batches,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS,
    make_tsv,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
    Precision,
    get_model,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
    FullTokenizer,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import (
    LiveTeacher,
    TeacherScores,
    TrainConfig,
    Trainer,
    distill_soft_ce,
    evenly_spaced_layers,
    init_student_from_teacher,
    stacking_layer_map,
    match_logodds,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train.distill import (
    model_batch_of,
)

REPO = Path(__file__).resolve().parents[1]

TINY = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "intermediate_size": 37,
}


def _tau(qids, a, b) -> float:
    qids, a, b = np.asarray(qids), np.asarray(a), np.asarray(b)
    taus = []
    for q in np.unique(qids):
        m = qids == q
        if m.sum() < 2:
            continue
        ii, jj = np.triu_indices(int(m.sum()), k=1)
        taus.append(
            float(np.mean(np.sign(a[m][ii] - a[m][jj]) * np.sign(b[m][ii] - b[m][jj])))
        )
    return float(np.mean(taus))


# ---------------------------------------------------------------------------
# unit: loss math / layer maps / init
# ---------------------------------------------------------------------------


def test_distill_soft_ce_matches_numpy():
    rng = np.random.default_rng(0)
    s = rng.standard_normal(64).astype(np.float32) * 3
    p = rng.uniform(0.01, 0.99, 64).astype(np.float32)
    for T in (1.0, 2.0, 4.0):
        t = np.log(p / (1 - p))
        x = s / T
        pT = 1 / (1 + np.exp(-t / T))
        want = np.mean((np.logaddexp(0, x) - pT * x) * T * T)
        got = float(distill_soft_ce(jnp.asarray(s), jnp.asarray(p), T))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_distill_soft_ce_minimised_at_teacher():
    # gradient wrt the student log-odds vanishes where student == teacher
    p = jnp.asarray([0.2, 0.7, 0.95], jnp.float32)
    t = jnp.log(p / (1 - p))
    for T in (1.0, 3.0):
        g = jax.grad(lambda s: distill_soft_ce(s, p, T))(t)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)
        # and pushes toward the teacher from either side
        g_lo = jax.grad(lambda s: distill_soft_ce(s, p, T))(t - 1.0)
        g_hi = jax.grad(lambda s: distill_soft_ce(s, p, T))(t + 1.0)
        assert (np.asarray(g_lo) < 0).all() and (np.asarray(g_hi) > 0).all()


def test_distill_soft_ce_weights_mask_rows():
    s = jnp.asarray([0.0, 100.0], jnp.float32)
    p = jnp.asarray([0.5, 0.01], jnp.float32)
    w = jnp.asarray([1.0, 0.0], jnp.float32)
    masked = float(distill_soft_ce(s, p, 1.0, w))
    only_first = float(distill_soft_ce(s[:1], p[:1], 1.0))
    np.testing.assert_allclose(masked, only_first, rtol=1e-6)


def test_evenly_spaced_layers():
    assert evenly_spaced_layers(4, 12) == (2, 5, 8, 11)
    assert evenly_spaced_layers(1, 12) == (11,)
    assert evenly_spaced_layers(12, 12) == tuple(range(12))
    assert evenly_spaced_layers(2, 9) == (3, 8)
    with pytest.raises(ValueError):
        evenly_spaced_layers(5, 4)


def test_stacking_layer_map():
    assert stacking_layer_map(12, 6) == (0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5)
    assert stacking_layer_map(4, 4) == (0, 1, 2, 3)
    assert stacking_layer_map(5, 2) == (0, 0, 0, 1, 1)
    assert stacking_layer_map(3, 1) == (0, 0, 0)
    with pytest.raises(ValueError):
        stacking_layer_map(4, 5)


def test_init_deeper_student_grows_by_stacking():
    """Progressive stacking: a DEEPER fresh model initialised from a
    shallower checkpoint duplicates each source layer into a contiguous
    run (Gong et al. 2019) -- the escape hatch for from-scratch Post-LN
    12x768 runs that pin at the trivial basin (measured on this rig)."""
    shallow = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 2})
    deep = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 4})
    pt = shallow.init_params(jax.random.key(0))
    pd = deep.init_params(jax.random.key(1))
    merged = init_student_from_teacher(pd, pt)
    idx = stacking_layer_map(4, 2)  # (0, 0, 1, 1)
    t_q = np.asarray(pt["bert"]["encoder"]["attention"]["query"]["kernel"])
    m_q = np.asarray(merged["bert"]["encoder"]["attention"]["query"]["kernel"])
    assert m_q.shape[0] == 4
    np.testing.assert_array_equal(m_q, t_q[list(idx)])
    np.testing.assert_array_equal(
        np.asarray(merged["bert"]["embeddings"]["word_embeddings"]),
        np.asarray(pt["bert"]["embeddings"]["word_embeddings"]),
    )


def test_init_student_from_teacher_slices_encoder():
    teacher = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 4})
    student = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 2})
    pt = teacher.init_params(jax.random.key(0))
    ps = student.init_params(jax.random.key(1))
    merged = init_student_from_teacher(ps, pt)
    idx = evenly_spaced_layers(2, 4)  # (1, 3)
    t_q = np.asarray(pt["bert"]["encoder"]["attention"]["query"]["kernel"])
    m_q = np.asarray(merged["bert"]["encoder"]["attention"]["query"]["kernel"])
    assert m_q.shape[0] == 2
    np.testing.assert_array_equal(m_q, t_q[list(idx)])
    # non-stacked leaves copy verbatim from the teacher
    np.testing.assert_array_equal(
        np.asarray(merged["bert"]["embeddings"]["word_embeddings"]),
        np.asarray(pt["bert"]["embeddings"]["word_embeddings"]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["cls"]["seq_relationship"]["am_kernel"]),
        np.asarray(pt["cls"]["seq_relationship"]["am_kernel"]),
    )


def test_init_student_keeps_mismatched_width():
    # a narrower student can't take teacher weights: fresh init is kept
    teacher = get_model("imagebert_b", overrides=TINY)
    student = get_model(
        "imagebert_b", overrides={**TINY, "hidden_size": 16, "num_attention_heads": 2}
    )
    pt = teacher.init_params(jax.random.key(0))
    ps = student.init_params(jax.random.key(1))
    merged = init_student_from_teacher(ps, pt)
    np.testing.assert_array_equal(
        np.asarray(merged["bert"]["embeddings"]["word_embeddings"]),
        np.asarray(ps["bert"]["embeddings"]["word_embeddings"]),
    )


# ---------------------------------------------------------------------------
# serving-mode log-odds
# ---------------------------------------------------------------------------


def _batches(n_rows, model_name, batch_size, seed=3):
    tok = (
        FullTokenizer.hf_style(VOCAB_PATH)
        if model_name == "lxmert"
        else FullTokenizer.google_style(VOCAB_PATH)
    )
    feat = Featurizer(tok, {str(k): v for k, v in SYNTHETIC_LABELS.items()})
    lines = make_tsv(n_rows, seed=seed, n_queries=max(2, n_rows // 4))
    return list(iter_batches(iter(lines), feat.for_model(model_name), batch_size))


@pytest.mark.parametrize("name", ["imagebert_a", "imagebert_b", "lxmert"])
def test_match_logodds_sigmoid_equals_serving_score(name):
    spec = get_model(
        name,
        overrides=(
            {**TINY, "l_layers": 2, "x_layers": 1, "r_layers": 1}
            if name == "lxmert"
            else TINY
        ),
    )
    params = spec.init_params(jax.random.key(0))
    (batch,) = _batches(8, name, 8)
    mb = model_batch_of(batch)
    if "labels" in mb:
        mb["labels"] = np.ones_like(mb["labels"])  # serving convention
    out = spec.apply(params, mb, spec.config, Precision.f32())
    s = match_logodds(name, params, out, mb)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(s)), np.asarray(out["score"]), rtol=2e-5, atol=2e-6
    )


# ---------------------------------------------------------------------------
# teacher sources
# ---------------------------------------------------------------------------


def test_teacher_scores_from_files_weighted(tmp_path):
    f1 = tmp_path / "a.txt"
    f2 = tmp_path / "l.csv"
    f1.write_text("1\t10\t0.8\n1\t11\t0.2\n")
    f2.write_text("query-id,product-id,score\n1,10,0.4\n1,11,0.6\n")
    ts = TeacherScores.from_files([str(f1), str(f2)], [0.75, 0.25])
    assert ts.probs[("1", "10")] == pytest.approx(0.75 * 0.8 + 0.25 * 0.4)
    assert ts.probs[("1", "11")] == pytest.approx(0.75 * 0.2 + 0.25 * 0.6)
    f3 = tmp_path / "short.txt"
    f3.write_text("1\t10\t0.5\n")
    with pytest.raises(KeyError, match="missing"):
        TeacherScores.from_files([str(f1), str(f3)])


def test_teacher_scores_attach_and_missing(tmp_path):
    (batch,) = _batches(6, "imagebert_b", 8)  # padded tail batch
    pairs = {
        (str(int(q)), str(int(p))): 0.25
        for q, p, v in zip(batch["query_id"], batch["product_id"], batch["valid"])
        if v
    }
    ts = TeacherScores(dict(pairs))
    out = ts.attach(batch)
    assert out["teacher_prob"].shape == out["teacher_weight"].shape
    np.testing.assert_array_equal(out["teacher_weight"], batch["valid"].astype(np.float32))
    assert (out["teacher_prob"][batch["valid"]] == 0.25).all()
    ts_short = TeacherScores({k: v for k, v in list(pairs.items())[1:]})
    with pytest.raises(KeyError, match="no teacher score"):
        ts_short.attach(batch)


def test_ensemble_teacher_matches_reference_fusion(reference_dir):
    """The ensemble teacher built from the reference's REAL committed score
    files equals code/main.py's merge (backfill + LXMERT pair universe)."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble.fusion import (
        fuse,
        load_csv_scores,
        load_tsv_scores,
    )

    pr = reference_dir / "prediction_result"
    paths = [
        pr / "testB_result_match_keyword_valid_finetune_251.txt",
        pr / "testB_result_match_keyword_valid_finetune_251_sen_to_forest.txt",
        pr / "testBscore_imagebert.txt",
        pr / "testB_score_lxmert.csv",
    ]
    for p in paths:
        if not p.exists():
            pytest.skip(f"golden file missing: {p}")
    ts = TeacherScores.from_ensemble_files(*paths)
    fusion = fuse(
        load_tsv_scores(paths[0]),
        load_tsv_scores(paths[1]),
        load_tsv_scores(paths[2]),
        load_csv_scores(paths[3]),
    )
    n_pairs = sum(len(r) for r in fusion.merge.values())
    assert len(ts) == n_pairs == 29005  # testB size incl. backfilled pairs
    for qid, row in list(fusion.merge.items())[:50]:
        for pid, s in row.items():
            assert ts.probs[(qid, pid)] == s


def test_live_teacher_forces_serving_label():
    spec = get_model("imagebert_b", overrides=TINY)
    params = spec.init_params(jax.random.key(0))
    (batch,) = _batches(8, "imagebert_b", 8)
    batch = dict(batch)
    batch["labels"] = np.zeros_like(batch["labels"])  # sampler hard negatives
    lt = LiveTeacher(spec, params, precision=Precision.f32())
    out = lt.attach(batch)
    mb = model_batch_of(batch)
    mb["labels"] = np.ones_like(mb["labels"])
    want = np.asarray(spec.apply(params, mb, spec.config, Precision.f32())["score"])
    # jit vs eager op ordering wiggles the last few ulps
    np.testing.assert_allclose(out["teacher_prob"], want, rtol=1e-5, atol=1e-9)
    np.testing.assert_array_equal(out["teacher_weight"], batch["valid"].astype(np.float32))


# ---------------------------------------------------------------------------
# end-to-end: the student learns the teacher's ranking
# ---------------------------------------------------------------------------


def test_offline_distillation_learns_teacher_ranking():
    teacher = get_model("imagebert_b", overrides=TINY)
    student_spec = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 1})
    pt = teacher.init_params(jax.random.key(7))
    batches = _batches(48, "imagebert_b", 16, seed=11)
    assert all(b["valid"].all() for b in batches)

    lt = LiveTeacher(teacher, pt, precision=Precision.f32())
    batches = [lt.attach(b) for b in batches]

    tc = TrainConfig(
        learning_rate=3e-4,
        num_warmup_steps=0,
        optimizer="bert_adamw",
        clip="global_norm",
        distill_weight=1.0,
        hard_loss_weight=0.0,
        distill_temperature=2.0,
    )
    trainer = Trainer(student_spec, tc, precision=Precision.f32())
    state = trainer.init_state(jax.random.key(1))

    def agreement(params):
        qs, ss, ts_ = [], [], []
        for b in batches:
            mb = model_batch_of(b)
            out = student_spec.apply(params, mb, student_spec.config, Precision.f32())
            qs.append(b["query_id"])
            ss.append(np.asarray(out["score"]))
            ts_.append(b["teacher_prob"])
        return _tau(np.concatenate(qs), np.concatenate(ss), np.concatenate(ts_))

    tau0 = agreement(jax.device_get(state.params))
    first_loss = last_loss = None
    steps = 60
    rngs = jax.random.split(jax.random.key(2), steps)
    for i in range(steps):
        state, metrics = trainer.train_step(state, batches[i % len(batches)], rngs[i])
        if first_loss is None:
            first_loss = float(metrics["distill_loss"])
        last_loss = float(metrics["distill_loss"])
    tau1 = agreement(jax.device_get(state.params))
    assert last_loss < first_loss, (first_loss, last_loss)
    assert tau1 > max(tau0, 0.5), (tau0, tau1)


def test_distill_step_runs_on_8_device_mesh():
    """The distill loss shards like any train step: batch (with teacher
    columns) over the data axis, grads all-reduced by XLA."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    student_spec = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 1})
    tc = TrainConfig(
        learning_rate=1e-4,
        num_warmup_steps=0,
        optimizer="bert_adamw",
        distill_weight=1.0,
        hard_loss_weight=0.0,
        distill_temperature=2.0,
    )
    trainer = Trainer(student_spec, tc, mesh=mesh, precision=Precision.f32())
    state = trainer.init_state(jax.random.key(0))
    (batch,) = _batches(16, "imagebert_b", 16)
    rng = np.random.default_rng(0)
    batch["teacher_prob"] = rng.uniform(0.05, 0.95, 16).astype(np.float32)
    batch["teacher_weight"] = np.ones(16, np.float32)
    losses = []
    for i in range(2):
        state, metrics = trainer.train_step(state, batch, jax.random.key(i))
        assert np.isfinite(float(metrics["distill_loss"]))
        losses.append(float(metrics["loss"]))
    assert losses[1] < losses[0]
    assert int(state.step) == 2


# ---------------------------------------------------------------------------
# CLI round-trip
# ---------------------------------------------------------------------------


def test_export_student_artifact(tmp_path):
    """A distilled student exports like any scorer: export.py picks the
    shape up from student_config.json and the artifact reproduces the live
    student's scores."""
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
        save_pytree,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.batchspec import (
        example_batch,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.serving import load_scorer

    student = get_model("imagebert_b", overrides={**TINY, "num_hidden_layers": 1})
    params = jax.device_get(student.init_params(jax.random.key(4)))
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    save_pytree(run_dir / "student_final", params)
    (run_dir / "student_config.json").write_text(
        json.dumps({"model": "imagebert_b", "overrides": {"num_hidden_layers": 1}})
    )

    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "KMR_CONFIG_OVERRIDES": json.dumps(TINY),
    }
    out = tmp_path / "artifact"
    r = subprocess.run(
        [
            sys.executable, "scripts/export.py",
            "--model", "imagebert_b",
            "--checkpoint", str(run_dir / "student_final"),
            "--batch-size", "4", "--precision", "f32",
            "--out", str(out),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "student_config.json" in r.stderr
    meta = json.loads((out / "meta.json").read_text())
    assert meta["config_overrides"] == {"num_hidden_layers": 1}

    scorer = load_scorer(out)
    batch = example_batch("imagebert_b", student.config, 4, np.random.default_rng(5))
    got = scorer(batch)
    want = np.asarray(
        student.apply(params, batch, student.config, Precision.f32())["score"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_distill_cli_and_score_roundtrip(tmp_path):
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "KMR_CONFIG_OVERRIDES": json.dumps(TINY),
    }
    tsv = tmp_path / "pairs.tsv"
    tsv.write_text("\n".join(make_tsv(12, seed=5, n_queries=4)) + "\n")
    labels = tmp_path / "labels.txt"
    labels.write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )

    def run(args, timeout=480):
        return subprocess.run(
            [sys.executable, *args], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=timeout,
        )

    # teacher scores for those pairs (random-init teacher: fine for smoke)
    t_scores = tmp_path / "teacher.txt"
    r = run([
        "scripts/score.py", "--model", "imagebert_b",
        "--tsv", str(tsv), "--labels", str(labels),
        "--out", str(t_scores), "--batch-size", "8",
    ])
    assert r.returncode == 0, r.stderr[-2000:]

    answers = {}
    for line in (tmp_path / "pairs.tsv").read_text().splitlines():
        cols = line.split("\t")
        if cols[0] == "product_id":
            continue
        answers.setdefault(cols[-1], []).append(int(cols[0]))
    answers_path = tmp_path / "valid_answer.json"
    answers_path.write_text(json.dumps(answers))

    out_dir = tmp_path / "student"
    r = run([
        "scripts/distill.py", "--model", "imagebert_b",
        "--student-layers", "1",
        "--tsv", str(tsv), "--labels", str(labels),
        "--teacher-scores", str(t_scores),
        "--steps", "4", "--batch-size", "8",
        "--checkpoint-every", "4", "--out", str(out_dir),
        "--valid-tsv", str(tsv), "--answers", str(answers_path),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "student_config.json").is_file()
    assert "Kendall tau" in r.stdout
    # the valid loop selected a best student checkpoint
    assert "best valid nDCG@5" in r.stdout
    assert (out_dir / "best_metadata.json").is_file()

    # score.py reloads the student, picking its shape up automatically
    s_scores = tmp_path / "student_scores.txt"
    r = run([
        "scripts/score.py", "--model", "imagebert_b",
        "--tsv", str(tsv), "--labels", str(labels),
        "--checkpoint", str(out_dir / "student_final"),
        "--out", str(s_scores), "--batch-size", "8",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "student_config.json" in r.stderr
    assert len(s_scores.read_text().strip().splitlines()) == 12


def test_distill_cli_offline_scores_with_teacher_init(tmp_path):
    """Offline scores as the distill signal + --teacher-checkpoint for
    --init-from-teacher weight init (the queue-G flow: scores are cheap to
    precompute once, init still wants the trained teacher's layers)."""
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        "KMR_CONFIG_OVERRIDES": json.dumps(TINY),
    }
    tsv = tmp_path / "pairs.tsv"
    tsv.write_text("\n".join(make_tsv(12, seed=5, n_queries=4)) + "\n")
    labels = tmp_path / "labels.txt"
    labels.write_text(
        "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n"
    )
    # a (random-init) full-depth teacher checkpoint in the repo's own format
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
        save_pytree,
    )

    teacher = get_model("imagebert_b", overrides=TINY)
    save_pytree(tmp_path / "teacher", teacher.init_params(jax.random.key(3)))
    t_scores = tmp_path / "teacher.txt"

    def run(args, timeout=480):
        return subprocess.run(
            [sys.executable, *args], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=timeout,
        )

    r = run([
        "scripts/score.py", "--model", "imagebert_b",
        "--tsv", str(tsv), "--labels", str(labels),
        "--checkpoint", str(tmp_path / "teacher"),
        "--out", str(t_scores), "--batch-size", "8",
    ])
    assert r.returncode == 0, r.stderr[-2000:]

    common = [
        "scripts/distill.py", "--model", "imagebert_b",
        "--student-layers", "1",
        "--tsv", str(tsv), "--labels", str(labels),
        "--teacher-scores", str(t_scores),
        "--teacher-checkpoint", str(tmp_path / "teacher"),
        "--steps", "2", "--batch-size", "8",
        "--checkpoint-every", "2", "--out", str(tmp_path / "student"),
    ]
    # without --init-from-teacher the combination is ambiguous -> argparse error
    r = run(common)
    assert r.returncode == 2
    assert "only" in r.stderr and "init-from-teacher" in r.stderr

    r = run(common + ["--init-from-teacher"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "offline teacher" in r.stdout
    assert "initialised from evenly-spaced teacher layers" in r.stdout
    assert (tmp_path / "student" / "student_final").exists()
