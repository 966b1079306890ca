#!/usr/bin/env python
"""Two-tower retrieval: build a product catalog and run exact top-k recall.

The retrieval stage the reference lacks (BASELINE config 5): embed every
product of a TSV into the catalog, embed queries, and brute-force exact MIPS
on-device (sharded over the mesh).

  # build the catalog (small: one .npz)
  python scripts/recall.py build --tsv catalog.tsv --labels labels.txt \
      --checkpoint tower.npz --out catalog.npz
  # build at 3M-product scale: streaming -> memmapped packed shards, RSS
  # bounded by one shard (add --store-features to keep the rerank features
  # alongside the embeddings for a memmap-backed cascade)
  python scripts/recall.py build --tsv catalog.tsv --labels labels.txt \
      --checkpoint tower.npz --out catalog_dir/ --packed
  # retrieve top-5 products per query (--catalog accepts .npz or packed dir;
  # packed catalogs stream chunk-by-chunk through the device)
  python scripts/recall.py query --tsv queries.tsv --labels labels.txt \
      --checkpoint tower.npz --catalog catalog.npz --out recall.tsv
  # recall@K-vs-K curve against ground truth
  python scripts/recall.py curve --tsv queries.tsv --labels labels.txt \
      --checkpoint tower.npz --catalog catalog_dir/ \
      --answers valid_answer.json --ks 5,20,100,500
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _setup(args):
    import jax

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
        load_npz,
        restore_pytree,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        load_multimodal_labels,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        init_params,
        two_tower_config,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )

    # two_tower_config (not TwoTowerConfig()) so KMR_TOWER_CONFIG_OVERRIDES
    # applies -- a checkpoint trained at an overridden size must load here
    tcfg = two_tower_config()
    if args.checkpoint:
        # npz file or orbax directory (scripts/train.py writes the latter)
        p = Path(args.checkpoint)
        params = restore_pytree(p) if p.is_dir() else load_npz(p)
    else:
        print("WARNING: no checkpoint; random init", file=sys.stderr)
        params = init_params(jax.random.key(0), tcfg)
    tok = FullTokenizer.google_style(VOCAB_PATH)
    fz = Featurizer(tok, load_multimodal_labels(args.labels))
    return tcfg, params, fz


def _batches(args, fz, batch_size=512):
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import batches_from_files

    return batches_from_files([args.tsv], fz.imagebert_b, batch_size)


def cmd_build(args) -> None:
    import jax

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        embed_product,
    )

    tcfg, params, fz = _setup(args)
    fn = jax.jit(lambda p, b: embed_product(p, b, tcfg))

    def entries():
        seen = 0
        for batch in _batches(args, fz):
            feats = {
                k: v for k, v in batch.items()
                if k not in ("product_id", "query_id", "valid")
            }
            e = np.asarray(fn(params, feats))
            for row in range(int(batch["valid"].sum())):
                entry = {
                    "product_id": np.int64(batch["product_id"][row]),
                    "embedding": e[row],
                }
                if args.store_features:
                    # everything the cross-encoder rerank stage needs
                    # (data/catalog.py:rerank_batch reconstructs all three
                    # model layouts from these + the query tokens)
                    for f in ("boxes", "features", "label_ids", "label_lens",
                              "num_boxes"):
                        entry[f] = feats[f][row]
                yield entry
                seen += 1
                if seen % 100_000 == 0:
                    print(f"  {seen} products embedded", file=sys.stderr)

    if args.packed:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
            build_catalog,
        )

        manifest = build_catalog(entries(), args.out, shard_size=args.shard_size)
        print(f"wrote {args.out}: {manifest['num_instances']} products (packed)")
    else:
        embs, pids = [], []
        for entry in entries():
            embs.append(entry["embedding"])
            pids.append(entry["product_id"])
        catalog = np.stack(embs, axis=0).astype(np.float16)
        product_ids = np.asarray(pids)
        np.savez(args.out, catalog=catalog, product_ids=product_ids)
        print(f"wrote {args.out}: {catalog.shape[0]} products x {catalog.shape[1]} dims")


def _query_embeddings(args, tcfg, params, fz):
    import jax

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        embed_query,
    )

    fn = jax.jit(lambda p, b: embed_query(p, b, tcfg))
    qids, qembs = [], []
    for batch in _batches(args, fz):
        feats = {
            k: v for k, v in batch.items()
            if k not in ("product_id", "query_id", "valid")
        }
        q = np.asarray(fn(params, feats))
        n = int(batch["valid"].sum())
        qembs.append(q[:n])
        qids.extend(batch["query_id"][:n])
    return np.asarray(qids), np.concatenate(qembs, axis=0)


def _retrieve(args, q_emb, k):
    """-> (scores, rows into product_ids, product_ids array)."""
    from pathlib import Path as _P

    import jax.numpy as jnp

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        CatalogDataset,
        recall_chunked,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        top_k_products,
    )

    if _P(args.catalog).is_dir():
        ds = CatalogDataset(args.catalog)
        scores, idx = recall_chunked(
            q_emb, ds, k=k, chunk_rows=args.chunk_rows
        )
        return scores, idx, ds.product_ids()
    with np.load(args.catalog) as data:
        catalog = jnp.asarray(data["catalog"], jnp.bfloat16)
        product_ids = data["product_ids"]
    s, i = top_k_products(jnp.asarray(q_emb), catalog, k=k)
    return np.asarray(s), np.asarray(i), product_ids


def cmd_query(args) -> None:
    tcfg, params, fz = _setup(args)
    qids, q_emb = _query_embeddings(args, tcfg, params, fz)
    _, idx, product_ids = _retrieve(args, q_emb, args.k)
    with open(args.out, "w", encoding="utf-8") as out:
        for row, qid in enumerate(qids):
            tops = ",".join(str(product_ids[i]) for i in idx[row] if i >= 0)
            out.write(f"{qid}\t{tops}\n")
    print(f"wrote {args.out}")


def cmd_curve(args) -> None:
    import json

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import recall_at_k
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
        load_answers,
    )

    tcfg, params, fz = _setup(args)
    qids, q_emb = _query_embeddings(args, tcfg, params, fz)
    ks = sorted(int(k) for k in args.ks.split(","))
    _, idx, product_ids = _retrieve(args, q_emb, max(ks))
    retrieved = np.where(idx >= 0, product_ids[np.maximum(idx, 0)], -1)
    answers = load_answers(args.answers)
    truth = {
        row: [int(p) for p in answers.get(str(qid), [])]
        for row, qid in enumerate(qids)
    }
    curve = recall_at_k(retrieved, truth, ks)
    print(json.dumps({"recall_at_k": {str(k): round(v, 4) for k, v in curve.items()}}))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("build", cmd_build), ("query", cmd_query), ("curve", cmd_curve)):
        sp = sub.add_parser(name)
        sp.add_argument("--tsv", required=True)
        sp.add_argument("--labels", required=True)
        sp.add_argument("--checkpoint", default=None)
        sp.set_defaults(fn=fn)
        if name == "build":
            sp.add_argument("--out", required=True)
            sp.add_argument("--packed", action="store_true",
                            help="write memmapped packed shards (streaming, "
                                 "bounded RSS) instead of one .npz")
            sp.add_argument("--store-features", action="store_true",
                            help="also store boxes/features/label_ids/"
                                 "num_boxes per product (rerank stage)")
            sp.add_argument("--shard-size", type=int, default=262_144)
        else:
            sp.add_argument("--catalog", required=True,
                            help=".npz file or packed-shard directory")
            sp.add_argument("--chunk-rows", type=int, default=262_144)
            if name == "query":
                sp.add_argument("--out", required=True)
                sp.add_argument("--k", type=int, default=5)
            else:
                sp.add_argument("--answers", required=True)
                sp.add_argument("--ks", default="5,10,50,100")
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
