"""Ensemble score fusion + product-dedup rerank -> top-5 submission.

Exact reimplementation of ``code/main.py:11-104``:

1. Load four per-pair score tables (B, C, A as TSV ``qid\\tpid\\tscore``;
   LXMERT as CSV with header).
2. Pair universe = the LXMERT table's pairs per query (``main.py:49``);
   missing pairs in B/C/A are backfilled with the LXMERT score
   (``main.py:50-58``).
3. merge = 0.2*B + 0.2*C + 0.3*A + 0.3*LXMERT (``main.py:59``).
4. Product-dedup filter (``main.py:74-86``): a product seen under >=2
   queries whose top-1 vs top-2 merge-score gap is < 0.92 is dropped
   everywhere; otherwise it survives only for its argmax query
   (|score - product_max| < 1e-5).
5. Top-5 per query from survivors; queries left with < 5 products fall back
   to the unfiltered merge ranking (``main.py:91-104``).

Output rows use ``\\r\\n`` line endings like the reference's py2 csv writer.
Row order differs (py2 dict hash order vs insertion order); the golden test
compares the query->top5 mapping, which is the semantic content.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Iterable, Mapping

ScoreTable = dict[str, dict[str, float]]

DEFAULT_WEIGHTS = (0.2, 0.2, 0.3, 0.3)  # B, C, A, LXMERT (main.py:59)
GAP_THRESHOLD = 0.92
ARGMAX_TOL = 1e-5


def load_tsv_scores(path) -> ScoreTable:
    out: ScoreTable = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            arr = line.strip().split("\t")
            if len(arr) < 3:
                continue
            out.setdefault(arr[0], {})[arr[1]] = float(arr[2])
    return out


def load_csv_scores(path) -> ScoreTable:
    out: ScoreTable = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if "query" in line:
                continue
            arr = line.strip().split(",")
            if len(arr) < 3:
                continue
            out.setdefault(arr[0], {})[arr[1]] = float(arr[2])
    return out


@dataclass
class FusionResult:
    merge: ScoreTable  # query -> product -> fused score
    product_max: dict[str, float]  # product -> best fused score anywhere
    product_scores: dict[str, list[float]]  # product -> all fused scores


def fuse(
    scores_b: ScoreTable,
    scores_c: ScoreTable,
    scores_a: ScoreTable,
    scores_lxmert: ScoreTable,
    weights: tuple[float, float, float, float] = DEFAULT_WEIGHTS,
) -> FusionResult:
    wb, wc, wa, wl = weights
    merge: ScoreTable = {}
    product_max: dict[str, float] = {}
    product_scores: dict[str, list[float]] = defaultdict(list)
    for query_id in scores_b:
        rb = scores_b[query_id]
        rc = scores_c[query_id]
        ra = scores_a[query_id]
        rl = scores_lxmert[query_id]
        row: dict[str, float] = {}
        for product_id, l_score in rl.items():
            s = (
                wb * rb.get(product_id, l_score)
                + wc * rc.get(product_id, l_score)
                + wa * ra.get(product_id, l_score)
                + wl * l_score
            )
            row[product_id] = s
            if product_id not in product_max or s > product_max[product_id]:
                product_max[product_id] = s
            product_scores[product_id].append(s)
        merge[query_id] = row
    return FusionResult(merge, product_max, dict(product_scores))


def single_model_fusion(scores: ScoreTable) -> FusionResult:
    """One scorer's table wrapped as a FusionResult (merge == the raw
    scores), so the ``dedup_filter`` rerank applies to a single model --
    the report's valid-set postprocessing experiment (kdd-report p.3
    section 3: ImageBERT-A alone, 0.7098 raw -> 0.7486 product-argmax ->
    0.8352 with the gap filter at 0.9)."""
    product_max: dict[str, float] = {}
    product_scores: dict[str, list[float]] = defaultdict(list)
    for row in scores.values():
        for product_id, s in row.items():
            if product_id not in product_max or s > product_max[product_id]:
                product_max[product_id] = s
            product_scores[product_id].append(s)
    return FusionResult(
        {q: dict(r) for q, r in scores.items()}, product_max, dict(product_scores)
    )


def dedup_filter(
    fusion: FusionResult,
    gap: float = GAP_THRESHOLD,
    tol: float = ARGMAX_TOL,
) -> ScoreTable:
    """main.py:74-86: keep each product only at its argmax query, and drop
    products whose two best scores are closer than ``gap``."""
    top1: ScoreTable = {}
    sorted_scores = {
        p: sorted(v, reverse=True) for p, v in fusion.product_scores.items()
    }
    for query_id, row in fusion.merge.items():
        for product_id, s in row.items():
            a = sorted_scores[product_id]
            if len(a) >= 2 and a[0] - a[1] < gap:
                continue
            if abs(s - fusion.product_max[product_id]) < tol:
                top1.setdefault(query_id, {})[product_id] = s
    return top1


def top5_rows(
    top1: ScoreTable, merge: ScoreTable, k: int = 5
) -> dict[str, list[str]]:
    """-> query -> [product1..product5]; <k survivors fall back to merge."""
    rows: dict[str, list[str]] = {}
    fallback: list[str] = []
    for query_id, row in top1.items():
        ranked = sorted(row.items(), key=lambda kv: kv[1], reverse=True)
        if len(ranked) < k:
            fallback.append(query_id)
            continue
        rows[query_id] = [pid for pid, _ in ranked[:k]]
    for query_id in fallback:
        ranked = sorted(merge[query_id].items(), key=lambda kv: kv[1], reverse=True)
        rows[query_id] = [pid for pid, _ in ranked[:k]]
    return rows


def single_model_top5(scores: ScoreTable, k: int = 5) -> dict[str, list[str]]:
    """Direct top-k submission from one scorer's table (the testA flow,
    ``run_pretraining_predict.py:520-598``: no fusion, no dedup filter)."""
    return {
        qid: [pid for pid, _ in sorted(row.items(), key=lambda kv: kv[1], reverse=True)[:k]]
        for qid, row in scores.items()
    }


def write_submission(rows: Mapping[str, Iterable[str]], path) -> None:
    with open(path, "w", encoding="utf-8", newline="") as f:
        f.write("query-id,product1,product2,product3,product4,product5\r\n")
        for query_id, products in rows.items():
            f.write(",".join([str(query_id), *products]) + "\r\n")


def read_submission(path) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if line.startswith("query-id"):
                continue
            arr = line.strip().split(",")
            if len(arr) >= 6:
                out[arr[0]] = arr[1:6]
    return out


def build_submission(
    path_b, path_c, path_a, path_lxmert, out_path=None
) -> dict[str, list[str]]:
    """End-to-end: four score files -> query->top5 (and optionally a CSV)."""
    fusion = fuse(
        load_tsv_scores(path_b),
        load_tsv_scores(path_c),
        load_tsv_scores(path_a),
        load_csv_scores(path_lxmert),
    )
    rows = top5_rows(dedup_filter(fusion), fusion.merge)
    if out_path is not None:
        write_submission(rows, out_path)
    return rows
