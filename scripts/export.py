#!/usr/bin/env python
"""Export a model + checkpoint as an AOT serving artifact (jax.export).

The TPU-native analogue of freezing a TF graph per checkpoint: the scoring
computation is lowered once to versioned StableHLO with the weights baked
in, then served anywhere a compatible jax runtime exists -- no model
python, no checkpoint plumbing (the reference instead re-declared the whole
model inside every predict script, e.g.
``imagebert_lds/src/run_pretraining_predict_score.py:522-593``).

Example:
  python scripts/export.py --model imagebert_a --checkpoint models/a.npz \
      --batch-size 8192 --platforms tpu --out artifacts/a_tpu/
  # later, to score with it:
  #   from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.serving import load_scorer
  #   scorer = load_scorer("artifacts/a_tpu"); scores = scorer(feats)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from score import load_params, load_student_overrides  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["imagebert_a", "imagebert_b", "imagebert_c",
                             "lxmert", "two_tower"])
    ap.add_argument("--side", choices=["query", "product"], default=None,
                    help="two_tower only: which embedder to export")
    ap.add_argument("--checkpoint", default=None,
                    help="npz / TF ckpt / torch state_dict (random init if absent)")
    ap.add_argument("--batch-size", type=int, default=8192,
                    help="0 = batch-polymorphic artifact (symbolic leading "
                    "dim; any batch size, XLA specializes at run time)")
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="e.g. 'tpu' or 'tpu cpu' (default: current backend)")
    ap.add_argument("--precision", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--backend", choices=["xla", "pallas_packed"], default="xla",
                    help="xla = portable StableHLO; pallas_packed pins the "
                    "artifact to the exporting compiler version")
    ap.add_argument("--config-overrides", default=None,
                    help='JSON model-config overrides (a distilled student\'s '
                         'shape; auto-read from student_config.json next to '
                         '--checkpoint when present)')
    ap.add_argument("--quantize", choices=["int8", "int8-ffn"], default=None,
                    help="bake int8 per-channel weights (4x smaller "
                    "artifact; dynamic activation quant at run time; the "
                    "scoring heads stay full precision -- AM margins are "
                    "boundary-sensitive)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import (
        Precision,
        get_model,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.utils import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.serving import (
        export_scorer,
        save_scorer,
    )

    prec = Precision.f32() if args.precision == "f32" else Precision.bf16()
    bf16 = lambda p: jax.tree.map(  # noqa: E731
        lambda x: x.astype("bfloat16") if str(x.dtype) == "float32" else x, p
    )
    bsz = None if args.batch_size == 0 else args.batch_size
    platforms = tuple(args.platforms) if args.platforms else None

    if args.model == "two_tower":
        if args.side is None:
            ap.error("--side query|product is required for two_tower")
        if args.quantize:
            ap.error("--quantize is not supported for two_tower embedders")
        if args.backend != "xla":
            ap.error("two_tower embedders export with the xla backend only")
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
            load_npz,
            restore_pytree,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models.two_tower import (
            init_params,
            two_tower_config,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.serving import (
            export_tower,
        )

        tcfg = two_tower_config()
        if args.checkpoint:
            p = Path(args.checkpoint)
            params = restore_pytree(p) if p.is_dir() else load_npz(p)
        else:
            print("WARNING: no checkpoint; random init", file=sys.stderr)
            params = init_params(jax.random.key(0), tcfg)
        if args.precision == "bf16":
            params = bf16(params)
        exported = export_tower(
            params, tcfg, args.side, bsz, precision=prec, platforms=platforms
        )
        meta = save_scorer(
            args.out, exported, f"two_tower_{args.side}", bsz, "xla"
        )
    else:
        overrides = (
            json.loads(args.config_overrides)
            if args.config_overrides
            else load_student_overrides(args.checkpoint)
        )
        spec = get_model(args.model, overrides=overrides)
        params = load_params(args.model, args.checkpoint, spec)
        if args.quantize in ("int8", "int8-ffn"):
            from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.ops.quant import (
                cast_residual_bf16,
                quantize_dense_tree,
            )

            # int8-ffn: quantise only the >=2048-wide FFN matmuls where the
            # MXU int8 rate actually wins (shape-gated, docs/BENCH.md);
            # attention projections stay bf16
            only = ("ffn",) if args.quantize == "int8-ffn" else None
            params = quantize_dense_tree(
                params, skip_paths=("cls",), only_paths=only
            )
            if args.precision == "bf16":
                # same skip paths: the margin-sensitive heads stay f32,
                # not merely unquantised
                params = cast_residual_bf16(params, skip_paths=("cls",))
        elif args.precision == "bf16":
            params = bf16(params)
        exported = export_scorer(
            spec, params, bsz, precision=prec,
            platforms=platforms, backend=args.backend,
        )
        extra = {}
        if args.quantize:
            extra["quantize"] = args.quantize
        if overrides:
            extra["config_overrides"] = overrides
        meta = save_scorer(
            args.out, exported, spec, bsz, args.backend,
            extra=extra or None,
        )
    print(json.dumps({**meta, "out": args.out}))


if __name__ == "__main__":
    main()
