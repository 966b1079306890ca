#!/usr/bin/env python
"""Fuse four score files into the top-5 submission (reference ``code/main.py``).

  python scripts/submission.py \
      --scores-b prediction_result/testB_result_match_keyword_valid_finetune_251.txt \
      --scores-c prediction_result/testB_result_match_keyword_valid_finetune_251_sen_to_forest.txt \
      --scores-a prediction_result/testBscore_imagebert.txt \
      --scores-lxmert prediction_result/testB_score_lxmert.csv \
      --out prediction_result/submission.csv
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scores-b", required=True)
    ap.add_argument("--scores-c", required=True)
    ap.add_argument("--scores-a", required=True)
    ap.add_argument("--scores-lxmert", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--answers", default=None,
                    help="optional valid_answer.json to report nDCG@5")
    args = ap.parse_args()

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble import (
        build_submission,
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
