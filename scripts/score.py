#!/usr/bin/env python
"""Score query-product TSV pairs with one model of the ensemble.

TPU-native replacement for the reference scorer scripts
(``run_pretraining_predict_score.py``, ``evaluate_normal.py[_sen2fs]``,
``lxmert/src/tasks/kdd.py``): one compiled program, fixed batch shape,
prefetching host pipeline, output in the reference score-file format.

Example:
  python scripts/score.py --model imagebert_a --tsv data/testB/testB.tsv \
      --labels data/multimodal_labels.txt --checkpoint models/a.npz \
      --out prediction_result/testBscore_imagebert.txt
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_student_overrides(checkpoint: str | None) -> dict | None:
    """Model-config overrides a distilled student saved next to its weights
    (scripts/distill.py writes student_config.json in the run dir; the
    checkpoint itself lives in a subdirectory like best/ or student_final/)."""
    if not checkpoint:
        return None
    for probe in (
        Path(checkpoint) / "student_config.json",
        Path(checkpoint).parent / "student_config.json",
    ):
        if probe.is_file():
            overrides = json.loads(probe.read_text()).get("overrides")
            print(f"[student] config overrides from {probe}: {overrides}",
                  file=sys.stderr)
            return overrides
    return None


def load_params(model_name: str, path: str | None, spec):
    import jax

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
        imagebert_a_from_tf,
        imagebert_b_from_tf,
        load_npz,
        lxmert_from_torch,
        read_tf_checkpoint,
        read_torch_state_dict,
    )

    if path is None:
        print("WARNING: no checkpoint given; using random init", file=sys.stderr)
        return spec.init_params(jax.random.key(0))
    p = Path(path)
    if p.is_dir():
        # native orbax param tree (scripts/train.py step_N / best,
        # scripts/distill.py student_final)
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
            restore_pytree,
        )

        return restore_pytree(p)
    if p.suffix == ".npz":
        flat_or_tree = load_npz(p)
        # npz may hold either a ready param tree or a flat TF var dict
        if "bert" in flat_or_tree:
            return flat_or_tree
        flat = {k: v for k, v in flat_or_tree.items()}
    elif p.suffix in (".pth", ".pt", ".bin"):
        sd = read_torch_state_dict(p)
        return lxmert_from_torch(sd, spec.config)
    else:
        flat = read_tf_checkpoint(str(p))
    if model_name == "imagebert_a":
        return imagebert_a_from_tf(flat, spec.config)
    if model_name in ("imagebert_b", "imagebert_c"):
        return imagebert_b_from_tf(flat, spec.config, ema=True)
    return lxmert_from_torch(flat, spec.config)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["imagebert_a", "imagebert_b", "imagebert_c", "lxmert"])
    ap.add_argument("--tsv", required=True, nargs="+")
    ap.add_argument("--labels", required=True, help="multimodal_labels.txt")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--config-overrides", default=None,
                    help='JSON model-config overrides, e.g. a distilled '
                         'student\'s shape \'{"num_hidden_layers": 4}\' '
                         '(auto-read from student_config.json next to '
                         '--checkpoint when present)')
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--precision", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--answers", default=None,
                    help="valid_answer.json: report nDCG@5 of this scorer "
                         "(the reference's run_pretraining_evaluate flow)")
    ap.add_argument("--expect-pairs", type=int, default=None,
                    help="fail unless exactly N pairs were scored -- the "
                         "reference's count asserts (29005 valid / 28830 "
                         "testB / 14720 per valid tower: "
                         "run_pretraining_evaluate.py:580-583, "
                         "run_pretraining_predict.py:578)")
    ap.add_argument("--delta-from", default=None,
                    help="C-as-delta: path to the ImageBERT-B score file "
                         "produced from the SAME tsv with the SAME "
                         "checkpoint. imagebert_c is imagebert_b plus a "
                         "data-layer query rewrite that only fires on rows "
                         "containing 'sen department of' "
                         "(imagebert_zk/load_data_v4.py:153-154); every "
                         "other pair's score is bit-identical to B's by "
                         "construction, so only rewritten rows are scored "
                         "and the rest are copied from this file. Only "
                         "valid with --model imagebert_c.")
    ap.add_argument("--workers", type=int, default=0,
                    help="host loader worker PROCESSES (0 = in-process "
                         "prefetch thread). The reference's num_workers "
                         "GeneratorEnqueuer knob (evaluate_normal.py:214-"
                         "216); one core parses ~4k rows/s vs ~25k "
                         "pairs/s/chip device rate, so real hosts want ~6")
    args = ap.parse_args()

    if args.delta_from is not None and args.model != "imagebert_c":
        ap.error("--delta-from is only meaningful for --model imagebert_c "
                 "(C == B + sen2forest rewrite)")

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        load_multimodal_labels,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.utils import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        Precision,
        get_model,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
        ScoringEngine,
        ScoringStats,
        write_scores_csv,
        write_scores_tsv,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )

    stats = ScoringStats()
    tsv_paths = list(args.tsv)
    delta_base = None
    delta_tmp = None
    if args.delta_from is not None:
        import tempfile

        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.tsv import (
            SEN2FOREST_SRC,
            is_header,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble.fusion import (
            load_tsv_scores,
        )

        delta_base = load_tsv_scores(args.delta_from)
        base_pairs = sum(len(r) for r in delta_base.values())
        # the rewrite trigger contains spaces, which cannot appear in the
        # base64 feature columns, so a raw-line substring test is exact
        matched = 0
        tsv_rows = 0
        with tempfile.NamedTemporaryFile(
            "w", suffix=".tsv", delete=False, encoding="utf-8"
        ) as tmp:
            delta_tmp = tmp.name
            for path in tsv_paths:
                with open(path, "r", encoding="utf-8") as f:
                    for line in f:
                        if is_header(line) or not line.strip():
                            continue
                        tsv_rows += 1
                        if SEN2FOREST_SRC in line:
                            tmp.write(line if line.endswith("\n") else line + "\n")
                            matched += 1
        if base_pairs != tsv_rows:
            # one-directional membership checks would silently merge a B
            # file scored from a DIFFERENT (superset) tsv; refuse up front
            print(
                f"ERROR: --delta-from file has {base_pairs} pairs but the "
                f"tsv has {tsv_rows} rows; the B score file must come from "
                f"the SAME tsv",
                file=sys.stderr,
            )
            raise SystemExit(4)
        print(
            f"[delta] {matched} rewritten rows to rescore; "
            f"{base_pairs} pairs copied from B",
            file=sys.stderr,
        )
        tsv_paths = [delta_tmp]

    result: dict[str, dict[str, float]]
    try:
        if delta_base is not None and matched == 0:
            # no query contains the trigger: C's score file IS B's score file
            # (bit-identical by construction) -- skip params, compile, device
            result = delta_base
        else:
            overrides = (
                json.loads(args.config_overrides)
                if args.config_overrides
                else load_student_overrides(args.checkpoint)
            )
            spec = get_model(args.model, overrides=overrides)
            tok = (
                FullTokenizer.hf_style(VOCAB_PATH)
                if args.model == "lxmert"
                else FullTokenizer.google_style(VOCAB_PATH)
            )
            featurizer = Featurizer(
                tok, load_multimodal_labels(args.labels), sen2forest=spec.sen2forest
            )
            params = load_params(args.model, args.checkpoint, spec)
            prec = Precision.f32() if args.precision == "f32" else Precision.bf16()
            engine = ScoringEngine(spec, params, precision=prec)
            result = engine.score_files(
                tsv_paths, featurizer, args.batch_size, stats=stats,
                num_workers=args.workers,
            )
            if delta_base is not None:
                for qid, row in result.items():
                    for pid, s in row.items():
                        if qid not in delta_base or pid not in delta_base[qid]:
                            print(
                                f"ERROR: rewritten pair ({qid}, {pid}) absent from "
                                f"--delta-from file; the B score file must come "
                                f"from the SAME tsv",
                                file=sys.stderr,
                            )
                            raise SystemExit(4)
                        delta_base[qid][pid] = s
                result = delta_base

    finally:
        if delta_tmp is not None:
            Path(delta_tmp).unlink(missing_ok=True)

    total_pairs = (
        sum(len(r) for r in result.values()) if delta_base is not None else stats.pairs
    )
    if args.expect_pairs is not None and total_pairs != args.expect_pairs:
        print(
            f"ERROR: scored {total_pairs} pairs, expected {args.expect_pairs} "
            f"({stats.pipeline.errors} parse errors) -- refusing to write a "
            f"short score file",
            file=sys.stderr,
        )
        raise SystemExit(3)
    writer = write_scores_csv if args.model == "lxmert" else write_scores_tsv
    writer(result, args.out)
    if args.answers:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval import (
            evaluate_scores,
            load_answers,
        )

        ndcg = evaluate_scores(result, load_answers(args.answers))
        print(json.dumps({"ndcg_at_5": round(ndcg, 6)}))
    report = {
        "pairs": total_pairs,
        "pairs_per_second": round(stats.pairs_per_second, 1),
        "parse_errors": stats.pipeline.errors,
        "out": args.out,
    }
    if delta_base is not None:
        report["scored_pairs"] = stats.pairs  # rows actually run on device
    print(json.dumps(report))


if __name__ == "__main__":
    main()
