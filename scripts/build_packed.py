#!/usr/bin/env python
"""Materialize training instances into packed memmap shards.

TPU-native replacement for the reference's TFRecord pretraining-data
generator (``imagebert_zk/generate_data.py:90-362,668-699``): runs the
hard-negative sampler ONCE over the train TSVs and writes per-field .npy
shards that ``scripts/train.py --packed-dir`` memory-maps for cheap
multi-epoch passes (no re-tokenization / re-mining / re-b64-decode).

  python scripts/build_packed.py --model imagebert_b \
      --train-tsv data/train/*.tsv --labels multimodal_labels.txt \
      --query-labels query_labels.txt --out packed/b --shard-size 65536
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["imagebert_a", "imagebert_b", "imagebert_c"])
    ap.add_argument("--train-tsv", required=True, nargs="+")
    ap.add_argument("--labels", required=True)
    ap.add_argument("--query-labels", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard-size", type=int, default=65536)
    ap.add_argument("--max-instances", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--feature-dtype", default="float16",
                    choices=["float16", "float32"],
                    help="on-disk dtype of the 2048-dim RoI features "
                         "(float16 halves the dominant field; cast back to "
                         "float32 at batch assembly)")
    args = ap.parse_args()

    import numpy as np

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        HardNegativeSampler,
        QueryLabelIndex,
        SamplerConfig,
        load_multimodal_labels,
        write_packed_shards,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )

    spec = get_model(args.model)
    tok = FullTokenizer.google_style(VOCAB_PATH)
    featurizer = Featurizer(
        tok, load_multimodal_labels(args.labels), sen2forest=spec.sen2forest
    )
    qindex = QueryLabelIndex.load(args.query_labels)
    sampler_cfg = (
        SamplerConfig.imagebert_b(args.seed)
        if args.model in ("imagebert_b", "imagebert_c")
        else SamplerConfig.imagebert_a(args.seed)
    )
    sampler = HardNegativeSampler(featurizer, qindex, sampler_cfg)

    def lines():
        for path in args.train_tsv:
            with open(path, "r", encoding="utf-8") as f:
                yield from f

    manifest = write_packed_shards(
        sampler.examples(lines()),
        args.out,
        shard_size=args.shard_size,
        feature_dtype=np.dtype(args.feature_dtype),
        max_instances=args.max_instances,
    )
    print(json.dumps({
        "out": args.out,
        "num_instances": manifest["num_instances"],
        "shards": len(manifest["shard_sizes"]),
        "fields": sorted(manifest["fields"]),
    }))


if __name__ == "__main__":
    main()
