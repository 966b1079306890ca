#!/usr/bin/env python
"""Distil the ensemble (or one scorer) into a shallower serving student.

No reference counterpart: the reference serves four 12-layer scorers and
fuses them (``code/main.py``); this trains ONE L-layer student of a family
whose serving throughput scales ~12/L on TPU (docs/BENCH.md ladder).

  # offline: student of the full 4-model ensemble on already-scored pairs
  # (--teacher-ensemble fuses with code/main.py's exact semantics incl.
  # the LXMERT backfill; --teacher-scores is the strict-coverage
  # weighted-average alternative for arbitrary file sets)
  python scripts/distill.py --model imagebert_b --student-layers 4 \
      --tsv valid.tsv --labels multimodal_labels.txt \
      --teacher-ensemble B.txt C.txt A.txt L.csv \
      --steps 2000 --batch-size 256 --out runs/student

  # live: single-teacher distillation with layer-init from the teacher
  python scripts/distill.py --model imagebert_b --student-layers 4 \
      --tsv train0.tsv --labels multimodal_labels.txt \
      --teacher-checkpoint b.npz --init-from-teacher \
      --steps 2000 --out runs/student

Score the result with ``scripts/score.py --checkpoint runs/student/best``
-- score.py picks up the saved ``student_config.json`` automatically.
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))  # sibling score.py


def rank_agreement(qids, student, teacher) -> float:
    """Mean per-query Kendall tau between student and teacher scores."""
    import numpy as np

    qids = np.asarray(qids)
    taus = []
    for q in np.unique(qids):
        m = qids == q
        a, b = np.asarray(student)[m], np.asarray(teacher)[m]
        if len(a) < 2:
            continue
        ii, jj = np.triu_indices(len(a), k=1)
        taus.append(float(np.mean(np.sign(a[ii] - a[jj]) * np.sign(b[ii] - b[jj]))))
    return float(np.mean(taus)) if taus else float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["imagebert_a", "imagebert_b", "imagebert_c", "lxmert"],
                    help="student family (layout + head follow the family)")
    ap.add_argument("--student-layers", type=int, default=None,
                    help="student encoder depth (teacher keeps the config's)")
    ap.add_argument("--student-overrides", default=None,
                    help='JSON config overrides for the student, e.g. '
                         '\'{"num_hidden_layers": 4}\' or LXMERT stack depths '
                         '\'{"l_layers": 3, "x_layers": 2, "r_layers": 2}\'')
    ap.add_argument("--tsv", required=True, nargs="+",
                    help="pair rows to distil on (featurized with the "
                         "family's serving layout, fed label = 1)")
    ap.add_argument("--labels", required=True, help="multimodal_labels.txt")
    ap.add_argument("--teacher-scores", nargs="+", default=None,
                    help="offline teacher: reference-format score file(s) "
                         "covering the --tsv pairs; several files fuse by "
                         "--teacher-weights (ensemble distillation)")
    ap.add_argument("--teacher-weights", nargs="+", type=float, default=None)
    ap.add_argument("--teacher-ensemble", nargs=4, default=None,
                    metavar=("B", "C", "A", "LXMERT"),
                    help="offline teacher = the full reference ensemble: "
                         "four score files in code/main.py order, fused "
                         "with its exact semantics (LXMERT pair universe, "
                         "backfill, 0.2/0.2/0.3/0.3 or --teacher-weights)")
    ap.add_argument("--teacher-checkpoint", default=None,
                    help="live teacher: full-depth checkpoint of the same "
                         "family, scored per batch in serving mode")
    ap.add_argument("--init-from-teacher", action="store_true",
                    help="initialise the student from evenly-spaced teacher "
                         "layers (requires --teacher-checkpoint)")
    ap.add_argument("--temperature", type=float, default=2.0)
    ap.add_argument("--distill-weight", type=float, default=1.0)
    # NB: no hard-label blend here -- TSV rows carry no relevance labels
    # (the featurizers feed the serving constant), so a hard loss would
    # optimise a constant target. Blending hard negatives with a live
    # teacher is a library-level flow (TrainConfig.hard_loss_weight +
    # HardNegativeSampler + LiveTeacher.attach).
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--warmup-steps", type=int, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--valid-tsv", nargs="+", default=None,
                    help="valid.tsv shards: nDCG@5 loop + best-checkpoint "
                         "selection for the student (same flow as train.py)")
    ap.add_argument("--answers", default=None,
                    help="valid_answer.json for the valid loop")
    ap.add_argument("--valid-every", type=int, default=0,
                    help="steps between valid evals (0 = only at the end)")
    args = ap.parse_args()
    if bool(args.valid_tsv) != bool(args.answers):
        ap.error("--valid-tsv and --answers must be given together")

    # Teacher-source rules: the distill SIGNAL comes from exactly one of
    # offline scores / fused ensemble / live checkpoint.  A checkpoint may
    # additionally ride along with an offline teacher when
    # --init-from-teacher needs it for weight init only (scores stay the
    # signal -- no per-batch teacher forward).
    if args.teacher_scores and args.teacher_ensemble:
        ap.error("--teacher-scores and --teacher-ensemble are exclusive")
    offline = bool(args.teacher_scores or args.teacher_ensemble)
    if not offline and not args.teacher_checkpoint:
        ap.error("one of --teacher-scores / --teacher-ensemble / "
                 "--teacher-checkpoint is required")
    if offline and args.teacher_checkpoint and not args.init_from_teacher:
        ap.error("--teacher-checkpoint alongside an offline teacher is only "
                 "meaningful with --init-from-teacher (otherwise two signals)")
    if args.init_from_teacher and not args.teacher_checkpoint:
        ap.error("--init-from-teacher requires --teacher-checkpoint")
    if bool(args.student_layers) == bool(args.student_overrides):
        ap.error("exactly one of --student-layers / --student-overrides")
    if args.model == "lxmert" and args.student_layers:
        # LXMERT depth lives in the three stack fields, not
        # num_hidden_layers -- a bare layer count would silently build a
        # full-depth 9/5/5 "student"
        ap.error('lxmert students need --student-overrides with the stack '
                 'depths, e.g. \'{"l_layers": 3, "x_layers": 2, "r_layers": 2}\'')

    import dataclasses

    import jax
    import numpy as np

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.utils import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import save_pytree
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        load_multimodal_labels,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.pipeline import (
        iter_batches,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import (
        LiveTeacher,
        TeacherScores,
        Trainer,
        init_student_from_teacher,
        recipe_for,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train.distill import (
        model_batch_of,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train.ema import ema_init
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.utils import log_metrics

    overrides = (
        json.loads(args.student_overrides)
        if args.student_overrides
        else {"num_hidden_layers": args.student_layers}
    )
    student = get_model(args.model, overrides=overrides)

    tok = (
        FullTokenizer.hf_style(VOCAB_PATH)
        if args.model == "lxmert"
        else FullTokenizer.google_style(VOCAB_PATH)
    )
    featurizer = Featurizer(
        tok, load_multimodal_labels(args.labels), sen2forest=student.sen2forest
    )

    teacher_params = None
    if args.teacher_ensemble:
        weights = tuple(args.teacher_weights) if args.teacher_weights else None
        table = TeacherScores.from_ensemble_files(*args.teacher_ensemble,
                                                  weights=weights)
        print(f"ensemble teacher: {len(table)} fused pairs")
        attach = table.attach
    elif args.teacher_scores:
        table = TeacherScores.from_files(args.teacher_scores, args.teacher_weights)
        print(f"offline teacher: {len(table)} scored pairs "
              f"from {len(args.teacher_scores)} file(s)")
        attach = table.attach
    if args.teacher_checkpoint:
        from score import load_params  # sibling script, same checkpoint formats

        teacher_spec = get_model(args.model)
        teacher_params = load_params(args.model, args.teacher_checkpoint, teacher_spec)
        if not (args.teacher_scores or args.teacher_ensemble):
            attach = LiveTeacher(teacher_spec, teacher_params).attach

    tc = dataclasses.replace(
        recipe_for(student.name),
        distill_weight=args.distill_weight,
        distill_temperature=args.temperature,
        hard_loss_weight=0.0,  # pure-soft: TSV rows carry no labels
        **({"learning_rate": args.lr} if args.lr is not None else {}),
        **(
            {"num_warmup_steps": args.warmup_steps}
            if args.warmup_steps is not None
            else {}
        ),
    )
    trainer = Trainer(student, tc)
    state = trainer.init_state(jax.random.key(args.seed))
    if args.init_from_teacher:
        params = init_student_from_teacher(
            jax.device_get(state.params), teacher_params
        )
        params = jax.device_put(params, trainer._replicated)
        ema = ema_init(params) if tc.ema_decay else None
        state = state._replace(params=params, ema=ema)
        print("student initialised from evenly-spaced teacher layers")

    def _lines():
        for path in args.tsv:
            with open(path, "r", encoding="utf-8") as f:
                yield from f

    def batches():
        while True:  # epochs
            n = 0
            for b in iter_batches(
                _lines(), featurizer.for_model(args.model), args.batch_size
            ):
                n += 1
                yield attach(b)
            if n == 0:
                raise SystemExit(f"no rows parsed from {args.tsv}")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    # score.py reads this to rebuild the student spec on reload
    (out_dir / "student_config.json").write_text(
        json.dumps({"model": args.model, "overrides": overrides})
    )
    metrics_file = open(out_dir / "metrics.jsonl", "a")

    # --- student valid loop (same flow as scripts/train.py) -----------------
    engine = None
    best_ndcg = -1.0

    def run_valid(step: int) -> None:
        nonlocal engine, best_ndcg
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
            evaluate_scores,
            load_answers,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
            ScoringEngine,
        )

        params = jax.device_get(trainer.eval_params(state))
        if engine is None:
            engine = ScoringEngine(
                student, params, mesh=trainer.mesh, precision=trainer.precision,
                donate_batch=False,
            )
        else:
            engine.update_params(params)
        result = engine.score_files(args.valid_tsv, featurizer, args.batch_size)
        ndcg = evaluate_scores(result, load_answers(args.answers))
        log_metrics(step, {"valid_ndcg5": ndcg}, metrics_file)
        log_metrics(step, {"valid_ndcg5": ndcg})
        if ndcg > best_ndcg:
            best_ndcg = ndcg
            save_pytree(out_dir / "best", params)
            (out_dir / "best_metadata.json").write_text(
                json.dumps({"step": step, "valid_ndcg5": ndcg})
            )

    rngs = jax.random.split(jax.random.key(args.seed + 1), args.steps)
    for step, batch in enumerate(itertools.islice(batches(), args.steps)):
        state, metrics = trainer.train_step(state, batch, rngs[step])
        if step % 20 == 0:
            log_metrics(step, metrics, metrics_file)
            log_metrics(step, metrics)
        if (
            args.checkpoint_every and (step + 1) % args.checkpoint_every == 0
        ) or step + 1 == args.steps:
            save_pytree(out_dir / f"step_{step + 1}", trainer.eval_params(state))
            save_pytree(out_dir / f"state_{step + 1}", state)
        if args.valid_tsv and (
            (args.valid_every and (step + 1) % args.valid_every == 0)
            or step + 1 == args.steps
        ):
            run_valid(step + 1)
    if args.valid_tsv:
        print(f"best valid nDCG@5 {best_ndcg:.4f} (checkpoint in {out_dir / 'best'})")

    # one agreement pass: student vs teacher ranking on the distill pairs
    eval_params = jax.device_put(trainer.eval_params(state), trainer._replicated)
    score_fn = jax.jit(
        lambda p, b: student.apply(p, b, student.config, trainer.precision)["score"]
    )
    qids, s_scores, t_scores = [], [], []
    for b in iter_batches(_lines(), featurizer.for_model(args.model), args.batch_size):
        b = attach(b)
        s = np.asarray(jax.device_get(score_fn(eval_params, model_batch_of(b))))
        keep = np.asarray(b["teacher_weight"]) > 0
        qids.append(np.asarray(b["query_id"])[keep])
        s_scores.append(s[keep])
        t_scores.append(np.asarray(b["teacher_prob"])[keep])
    qids = np.concatenate(qids)
    s_scores, t_scores = np.concatenate(s_scores), np.concatenate(t_scores)
    tau = rank_agreement(qids, s_scores, t_scores)
    mae = float(np.mean(np.abs(s_scores - t_scores)))
    print(f"student-teacher agreement over {len(qids)} pairs: "
          f"mean per-query Kendall tau {tau:.4f}, score MAE {mae:.4f}")
    log_metrics(args.steps, {"distill_tau": tau, "distill_mae": mae}, metrics_file)
    save_pytree(out_dir / "student_final", jax.device_get(eval_params))
    print(f"student saved to {out_dir / 'student_final'}")


if __name__ == "__main__":
    main()
