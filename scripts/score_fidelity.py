#!/usr/bin/env python
"""Rank fidelity of one score file vs a reference score file.

The product of this pipeline is a *ranking* (top-5 per query,
``/root/reference/code/main.py:67-101``), so any serving substitution —
a distilled student for its teacher, an int8 export for the f32 scorer —
is judged by rank agreement, not score deltas.  This tool compares two
score files over their shared queries and prints ONE JSON line:

  python scripts/score_fidelity.py --reference teacher.txt --candidate student.txt

Metrics (k = --k, default 5):
  kendall_tau_mean/min   per-query pairwise order agreement in [-1, 1]
  topk_overlap_mean/min  |top-k(ref) ∩ top-k(cand)| / k
  ndcg_delta             1 - nDCG@k(candidate, truth=reference's top-k)
  ndcg_ref/ndcg_cand     (only with --answers) nDCG@k of each file vs
                         ground truth — the end-metric cost of swapping

Accepts both score formats (``qid\tpid\tscore`` TSV and the LXMERT
``query-id,product-id,score`` CSV), like the fusion stage.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ensemble.fusion import (
    load_csv_scores,
    load_tsv_scores,
)
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
    evaluate_scores,
)


def _load(path: str):
    return load_csv_scores(path) if path.endswith(".csv") else load_tsv_scores(path)


def compare(ref, cand, k: int = 5) -> dict:
    """Rank-fidelity metrics of ``cand`` vs ``ref`` over shared queries.

    Both args are ScoreTables (``dict[qid][pid] = score``).  Queries absent
    from either table, and pids absent from ``cand`` within a shared query,
    are counted (``missing_*``) and excluded from the rank metrics — a
    coverage hole is a data bug, not a fidelity signal.
    """
    shared = sorted(set(ref) & set(cand))
    taus, overlaps = [], []
    answers = {}
    cand_shared = {}  # same pid universe as tau/overlap: shared pids only
    n_pairs = 0
    missing_pairs = 0
    for qid in shared:
        pids = sorted(set(ref[qid]) & set(cand[qid]))
        missing_pairs += len(ref[qid]) - len(pids)
        if len(pids) < 2:
            continue
        a = np.array([ref[qid][p] for p in pids])
        b = np.array([cand[qid][p] for p in pids])
        cand_shared[qid] = {p: cand[qid][p] for p in pids}
        n_pairs += len(pids)
        ii, jj = np.triu_indices(len(pids), 1)
        taus.append(float(np.mean(np.sign(a[ii] - a[jj]) * np.sign(b[ii] - b[jj]))))
        top_a = np.argsort(-a, kind="stable")[:k]
        top_b = np.argsort(-b, kind="stable")[:k]
        overlaps.append(len(set(top_a) & set(top_b)) / min(k, len(pids)))
        answers[qid] = [pids[i] for i in top_a]
    out = {
        "n_queries": len(shared),
        "n_pairs": n_pairs,
        "missing_queries": len(set(ref) - set(cand)),
        "missing_pairs": missing_pairs,
        "k": k,
    }
    if taus:
        out.update(
            kendall_tau_mean=round(float(np.mean(taus)), 4),
            kendall_tau_min=round(float(np.min(taus)), 4),
            topk_overlap_mean=round(float(np.mean(overlaps)), 4),
            topk_overlap_min=round(float(np.min(overlaps)), 4),
            ndcg_delta=round(1.0 - evaluate_scores(cand_shared, answers, k), 4),
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True,
                    help="reference score file (teacher / f32 scorer)")
    ap.add_argument("--candidate", required=True,
                    help="candidate score file (student / quantised export)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--answers", default=None,
                    help="optional valid_answer.json: also report each "
                         "file's nDCG@k vs ground truth")
    args = ap.parse_args()

    ref, cand = _load(args.reference), _load(args.candidate)
    out = compare(ref, cand, args.k)
    if args.answers:
        answers = json.loads(Path(args.answers).read_text())
        out["ndcg_ref"] = round(evaluate_scores(ref, answers, args.k), 4)
        out["ndcg_cand"] = round(evaluate_scores(cand, answers, args.k), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
