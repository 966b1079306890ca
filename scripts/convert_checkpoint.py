#!/usr/bin/env python
"""Convert a reference checkpoint (TF1 bundle or PyTorch .pth) to an npz
parameter tree loadable by scripts/score.py and the engines.

  python scripts/convert_checkpoint.py --model imagebert_a \
      --checkpoint models/ImageBertKDD.ckpt-85002 --out a.npz
  python scripts/convert_checkpoint.py --model imagebert_b \
      --checkpoint models/model_attention_kdd_am_word_match_finetune_valid.ckpt-251 \
      --out b.npz   # restores EMA shadow weights like evaluate_normal.py
  python scripts/convert_checkpoint.py --model lxmert \
      --checkpoint models/BEST.pth --out lxmert.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["imagebert_a", "imagebert_b", "imagebert_c", "lxmert"])
    ap.add_argument("--checkpoint", required=True,
                    help="TF bundle prefix (no .index suffix) or .pth path")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--no-ema", action="store_true",
                    help="for B/C: load raw variables instead of EMA shadows")
    args = ap.parse_args()

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
        imagebert_a_from_tf,
        imagebert_b_from_tf,
        lxmert_from_torch,
        read_tf_checkpoint,
        read_torch_state_dict,
        save_npz,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model

    spec = get_model(args.model)
    if args.model == "lxmert":
        sd = read_torch_state_dict(args.checkpoint)
        params = lxmert_from_torch(sd, spec.config)
    else:
        flat = read_tf_checkpoint(args.checkpoint)
        if args.model == "imagebert_a":
            params = imagebert_a_from_tf(flat, spec.config)
        else:
            params = imagebert_b_from_tf(flat, spec.config, ema=not args.no_ema)
    save_npz(args.out, params)
    import numpy as np

    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"wrote {args.out}: {n:,} parameters")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
