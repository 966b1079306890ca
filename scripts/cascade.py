#!/usr/bin/env python
"""Recall -> cross-encoder cascade: the two-stage retrieval pipeline.

The reference scores every (query, product) pair with a full cross-encoder
(it was handed a candidate file); this adds the retrieval stage in front:

  1. embed every catalog product with the two-tower product tower,
  2. embed each distinct query with the query tower,
  3. exact top-K MIPS recall on-device (models/two_tower.py),
  4. re-score the K candidates per query with one of the ensemble
     cross-encoders (ScoringEngine), emit top-5 per query.

With --answers it also reports recall@K of stage 1 and nDCG@5 of the
cascade output, so the K/quality trade-off is measurable.

  python scripts/cascade.py --queries valid.tsv --catalog catalog.tsv \
      --labels multimodal_labels.txt --tower-checkpoint tower/best \
      --cross-model imagebert_b --cross-checkpoint b.npz \
      --k-recall 50 --out cascade.csv --answers valid_answer.json

With TSV catalogs this CLI holds product features in RAM for the rerank
stage (~85 KB/row), which is fine to ~100k products. At the full 3M-product
scale pass a packed catalog directory instead (built once with
``scripts/recall.py build --packed --store-features``): ``--catalog dir/``
skips the re-embed entirely, runs the exact recall one memmapped chunk at a
time (``data/catalog.py:recall_chunked``), and gathers only the recalled
candidates' rerank features from the memmap (``CatalogDataset.rows`` +
``rerank_batch``) -- RSS stays bounded by one chunk + one rerank batch
(``scripts/bench_recall_3m.py`` demonstrates the 3M recall regime; numbers
in docs/BENCH.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True, nargs="+",
                    help="TSV(s) whose rows provide the query set (deduped "
                         "by query_id) and, with --answers, the eval pairs")
    ap.add_argument("--catalog", required=True, nargs="+",
                    help="TSV(s) whose rows provide the product catalog "
                         "(deduped by product_id), OR one packed-catalog "
                         "directory from `recall.py build --packed "
                         "--store-features` (memmapped; no re-embed)")
    ap.add_argument("--chunk-rows", type=int, default=262_144,
                    help="recall chunk size for packed catalogs")
    ap.add_argument("--labels", required=True)
    ap.add_argument("--tower-checkpoint", default=None)
    ap.add_argument("--cross-model", default="imagebert_b",
                    choices=["imagebert_a", "imagebert_b", "imagebert_c", "lxmert"])
    ap.add_argument("--cross-checkpoint", default=None,
                    help="npz pytree for the cross-encoder (random init if "
                         "omitted -- useful only for smoke tests)")
    ap.add_argument("--k-recall", type=int, default=50)
    ap.add_argument("--k-out", type=int, default=5)
    ap.add_argument("--out", required=True)
    ap.add_argument("--answers", default=None,
                    help="valid_answer.json: report recall@K and cascade nDCG@5")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--precision", choices=["f32", "bf16"], default="f32",
                    help="cross-encoder rerank precision; f32 matches "
                         "scripts/score.py's default so the cascade's scores "
                         "agree with the scorer CLI for the same checkpoint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
        load_npz,
        restore_pytree,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        load_multimodal_labels,
        pad_batch,
        stack_examples,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.pipeline import (
        iter_examples,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        embed_product,
        embed_query,
        top_k_products,
        two_tower_config,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import ScoringEngine
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )

    def _load_params(path):
        """npz file or orbax directory (scripts/train.py writes the latter)."""
        p = Path(path)
        return restore_pytree(p) if p.is_dir() else load_npz(p)

    def _examples(paths):
        for path in paths:
            with open(path, "r", encoding="utf-8") as f:
                yield from iter_examples(f)

    packed_dir = None
    if len(args.catalog) == 1 and Path(args.catalog[0]).is_dir():
        packed_dir = Path(args.catalog[0])

    tcfg = two_tower_config()
    if args.tower_checkpoint:
        tower_params = _load_params(args.tower_checkpoint)
    else:
        print("WARNING: random tower init (smoke-test mode)", file=sys.stderr)
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
            init_params,
        )

        tower_params = init_params(jax.random.key(0), tcfg)

    cross_spec = get_model(args.cross_model)
    tok = (
        FullTokenizer.hf_style(VOCAB_PATH)
        if args.cross_model == "lxmert"
        else FullTokenizer.google_style(VOCAB_PATH)
    )
    labels = load_multimodal_labels(args.labels)
    fz = Featurizer(tok, labels, sen2forest=cross_spec.sen2forest)
    tower_fz = Featurizer(FullTokenizer.google_style(VOCAB_PATH), labels)

    # ---- stage 1a: catalog embeddings (product tower) ----------------------
    # pad the ragged tail chunk: a second traced shape costs 1-3 min of
    # remote compile on the bench rig for zero benefit
    def _embed_chunks(embed_fn, params, exs):
        out = []
        for i in range(0, len(exs), args.batch_size):
            chunk = [tower_fz.imagebert_b(ex) for ex in exs[i : i + args.batch_size]]
            b = pad_batch(stack_examples(chunk), args.batch_size)
            out.append(np.asarray(embed_fn(params, b))[: len(chunk)])
        return np.concatenate(out, axis=0)

    if packed_dir is not None:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
            CatalogDataset,
            recall_chunked,
            rerank_batch,
        )

        ds = CatalogDataset(packed_dir)
        if "features" not in ds.fields:
            raise SystemExit(
                f"{packed_dir} has no rerank features; rebuild with "
                "`recall.py build --packed --store-features`"
            )
        want_lineage = "hf" if args.cross_model == "lxmert" else "google"
        have_lineage = ds.manifest.get("label_tokenizer", "google")
        if have_lineage != want_lineage:
            # stored label_ids were tokenized with the other WordPiece
            # lineage; the two differ on never-split literals ('[UNK]' etc.)
            # in label text and on >100-char words, so rerank scores can
            # drift from the TSV featurization path for such labels
            print(
                f"WARNING: catalog label_ids use the {have_lineage!r} "
                f"tokenizer lineage but {args.cross_model} featurizes with "
                f"{want_lineage!r}; scores may differ from the TSV path for "
                "labels containing never-split tokens or >100-char words",
                file=sys.stderr,
            )
        product_ids = ds.product_ids()
        print(f"catalog: {len(ds)} products (memmapped)", file=sys.stderr)
    else:
        products: dict[int, object] = {}
        for ex in _examples(args.catalog):
            products.setdefault(ex.product_id, ex)
        product_exs = list(products.values())
        product_ids = np.array([ex.product_id for ex in product_exs])
        embed_p = jax.jit(lambda p, b: embed_product(p, b, tcfg))
        catalog = jnp.asarray(
            _embed_chunks(embed_p, tower_params, product_exs), jnp.bfloat16
        )
        print(f"catalog: {catalog.shape[0]} products", file=sys.stderr)

    # ---- stage 1b: query embeddings + recall --------------------------------
    queries: dict[int, object] = {}
    for ex in _examples(args.queries):
        queries.setdefault(ex.query_id, ex)
    query_exs = list(queries.values())
    query_ids = np.array([ex.query_id for ex in query_exs])
    embed_q = jax.jit(lambda p, b: embed_query(p, b, tcfg))
    q_emb = _embed_chunks(embed_q, tower_params, query_exs)
    if packed_dir is not None:
        k = min(args.k_recall, len(ds))
        _, top_idx = recall_chunked(
            np.asarray(q_emb, np.float32), ds, k=k, chunk_rows=args.chunk_rows
        )
    else:
        k = min(args.k_recall, catalog.shape[0])
        _, top_idx = top_k_products(jnp.asarray(q_emb), catalog, k=k)
    top_idx = np.asarray(top_idx)
    print(f"recalled top-{k} for {len(query_exs)} queries", file=sys.stderr)

    # ---- stage 2: cross-encoder rerank --------------------------------------
    if args.cross_checkpoint:
        cross_params = _load_params(args.cross_checkpoint)
    else:
        print("WARNING: random cross-encoder init (smoke-test mode)", file=sys.stderr)
        cross_params = cross_spec.init_params(jax.random.key(1))
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import Precision

    prec = Precision.f32() if args.precision == "f32" else Precision.bf16()
    engine = ScoringEngine(
        cross_spec, cross_params, precision=prec, donate_batch=False
    )
    featurize = fz.for_model(args.cross_model)

    scores: dict[str, dict[str, float]] = {}
    if packed_dir is not None:
        # memmap path: gather only the recalled candidates' features
        # (CatalogDataset.rows) and rebuild the layout in bulk numpy.
        # one pass over the recall grid yields both halves of the pairing
        pair_qrows, pair_cols = np.nonzero(top_idx >= 0)
        pair_idx = top_idx[pair_qrows, pair_cols]
        q_ids_cache = {
            int(r): fz.query_token_ids(query_exs[int(r)])
            for r in np.unique(pair_qrows)
        }
        for i in range(0, len(pair_idx), args.batch_size):
            qrows = pair_qrows[i : i + args.batch_size]
            rows = ds.rows(pair_idx[i : i + args.batch_size])
            batch = rerank_batch(
                args.cross_model,
                [q_ids_cache[r] for r in qrows],
                query_ids[qrows],
                rows,
            )
            batch = pad_batch(batch, args.batch_size)
            s = np.asarray(engine.score_batch(batch))[: len(qrows)]
            for j, sc in enumerate(s):
                qid, pid = query_ids[qrows[j]], rows["product_id"][j]
                scores.setdefault(str(qid), {})[str(int(pid))] = float(sc)
    else:
        pair_exs, pair_qids, pair_pids = [], [], []
        for row, qex in enumerate(query_exs):
            for idx in top_idx[row]:
                if idx < 0:
                    continue
                pex = product_exs[int(idx)]
                pair_exs.append(
                    dataclasses.replace(pex, query=qex.query, query_id=qex.query_id)
                )
                pair_qids.append(qex.query_id)
                pair_pids.append(pex.product_id)

        for i in range(0, len(pair_exs), args.batch_size):
            chunk = pair_exs[i : i + args.batch_size]
            batch = pad_batch(
                stack_examples([featurize(ex) for ex in chunk]), args.batch_size
            )
            s = np.asarray(engine.score_batch(batch))[: len(chunk)]
            for j, sc in enumerate(s):
                qid, pid = pair_qids[i + j], pair_pids[i + j]
                scores.setdefault(str(qid), {})[str(pid)] = float(sc)

    # ---- emit top-k-out + metrics -------------------------------------------
    with open(args.out, "w", encoding="utf-8") as f:
        f.write("query-id,product1,product2,product3,product4,product5\n")
        for qid in map(str, query_ids):
            row = sorted(scores.get(qid, {}).items(), key=lambda kv: -kv[1])
            tops = [pid for pid, _ in row[: args.k_out]]
            # always exactly k_out product columns (empty-padded), so the
            # header's productN schema holds even when recall returned <k_out
            tops += [""] * (args.k_out - len(tops))
            f.write(f"{qid},{','.join(tops)}\n")
    print(f"wrote {args.out}", file=sys.stderr)

    if args.answers:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
            evaluate_scores,
            load_answers,
        )

        answers = load_answers(args.answers)
        hits = total = 0
        for row, qid in enumerate(query_ids):
            truth = {str(p) for p in answers.get(str(qid), [])}
            if not truth:
                continue
            got = {str(product_ids[i]) for i in top_idx[row] if i >= 0}
            hits += len(truth & got)
            total += len(truth)
        recall_at_k = hits / max(total, 1)
        ndcg = evaluate_scores(scores, answers)
        print(json.dumps(
            {"recall_at_k": round(recall_at_k, 4), "k": k,
             "cascade_ndcg5": round(ndcg, 4)}
        ))


if __name__ == "__main__":
    main()
