#!/usr/bin/env python
"""Fuse four score files into the top-5 submission (reference ``code/main.py``).

  python scripts/submission.py \
      --scores-b prediction_result/testB_result_match_keyword_valid_finetune_251.txt \
      --scores-c prediction_result/testB_result_match_keyword_valid_finetune_251_sen_to_forest.txt \
      --scores-a prediction_result/testBscore_imagebert.txt \
      --scores-lxmert prediction_result/testB_score_lxmert.csv \
      --out prediction_result/submission.csv

Single-scorer mode (the testA direct-submission flow,
``run_pretraining_predict.py:585-598``: top-5 straight from one score file,
no fusion / dedup filter):

  python scripts/submission.py --single testAscore_imagebert.txt --out sub.csv
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", default=None, metavar="SCORES",
                    help="one score file (.csv header format or qid\\tpid\\t"
                         "score tsv) -> direct top-5 submission, no fusion")
    ap.add_argument("--scores-b")
    ap.add_argument("--scores-c")
    ap.add_argument("--scores-a")
    ap.add_argument("--scores-lxmert")
    ap.add_argument("--out", required=True)
    ap.add_argument("--answers", default=None,
                    help="optional valid_answer.json to report nDCG@5")
    args = ap.parse_args()

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble import (
        build_submission,
    )

    if args.single:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble.fusion import (
            load_csv_scores,
            load_tsv_scores,
            single_model_top5,
            write_submission,
        )

        load = (
            load_csv_scores if args.single.endswith(".csv") else load_tsv_scores
        )
        rows = single_model_top5(load(args.single))
        write_submission(rows, args.out)
    else:
        missing = [
            n for n in ("scores_b", "scores_c", "scores_a", "scores_lxmert")
            if getattr(args, n) is None
        ]
        if missing:
            ap.error(
                "either --single or all four --scores-* files are required "
                f"(missing: {', '.join(missing)})"
            )
        rows = build_submission(
            args.scores_b, args.scores_c, args.scores_a, args.scores_lxmert,
            out_path=args.out,
        )
    print(f"wrote {len(rows)} queries -> {args.out}")

    if args.answers:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval import (
            evaluate_submission,
            load_answers,
        )

        score = evaluate_submission(rows, load_answers(args.answers))
        print(f"nDCG@5 = {score:.4f}")


if __name__ == "__main__":
    main()
