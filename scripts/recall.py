#!/usr/bin/env python
"""Two-tower retrieval: build a product catalog and run exact top-k recall.

The retrieval stage the reference lacks (BASELINE config 5): embed every
product of a TSV into the catalog, embed queries, and brute-force exact MIPS
on-device (sharded over the mesh).

  # build the catalog
  python scripts/recall.py build --tsv catalog.tsv --labels labels.txt \
      --checkpoint tower.npz --out catalog.npz
  # retrieve top-5 products per query
  python scripts/recall.py query --tsv queries.tsv --labels labels.txt \
      --checkpoint tower.npz --catalog catalog.npz --out recall.tsv
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
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import load_npz
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        load_multimodal_labels,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        TwoTowerConfig,
        init_params,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )

    tcfg = TwoTowerConfig()
    if args.checkpoint:
        params = load_npz(args.checkpoint)
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
    embs, pids = [], []
    for batch in _batches(args, fz):
        feats = {k: v for k, v in batch.items() if k not in ("product_id", "query_id", "valid")}
        e = np.asarray(fn(params, feats))[batch["valid"]]
        embs.append(e)
        pids.append(batch["product_id"][batch["valid"]])
    catalog = np.concatenate(embs, axis=0).astype(np.float16)
    product_ids = np.concatenate(pids, axis=0)
    np.savez(args.out, catalog=catalog, product_ids=product_ids)
    print(f"wrote {args.out}: {catalog.shape[0]} products x {catalog.shape[1]} dims")


def cmd_query(args) -> None:
    import jax
    import jax.numpy as jnp

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
        embed_query,
        top_k_products,
    )

    tcfg, params, fz = _setup(args)
    with np.load(args.catalog) as data:
        catalog = jnp.asarray(data["catalog"], jnp.bfloat16)
        product_ids = data["product_ids"]
    fn = jax.jit(lambda p, b: embed_query(p, b, tcfg))
    with open(args.out, "w", encoding="utf-8") as out:
        for batch in _batches(args, fz):
            feats = {k: v for k, v in batch.items() if k not in ("product_id", "query_id", "valid")}
            q = fn(params, feats)
            scores, idx = top_k_products(q, catalog, k=args.k)
            scores, idx = np.asarray(scores), np.asarray(idx)
            for row in range(int(batch["valid"].sum())):
                qid = batch["query_id"][row]
                tops = ",".join(str(product_ids[i]) for i in idx[row] if i >= 0)
                out.write(f"{qid}\t{tops}\n")
    print(f"wrote {args.out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name, fn in (("build", cmd_build), ("query", cmd_query)):
        sp = sub.add_parser(name)
        sp.add_argument("--tsv", required=True)
        sp.add_argument("--labels", required=True)
        sp.add_argument("--checkpoint", default=None)
        sp.set_defaults(fn=fn)
        if name == "build":
            sp.add_argument("--out", required=True)
        else:
            sp.add_argument("--catalog", required=True)
            sp.add_argument("--out", required=True)
            sp.add_argument("--k", type=int, default=5)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
