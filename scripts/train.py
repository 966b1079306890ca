#!/usr/bin/env python
"""Train one model of the ensemble with hard-negative sampling.

TPU-native replacement for the reference training drivers
(``run_pretraining_predict.py`` train branch, zk ``train_normal.py``):
pjit data-parallel step over the device mesh, per-model optimizer recipes,
EMA for B/C, periodic Orbax checkpoints and JSONL metrics.

  python scripts/train.py --model imagebert_b --train-tsv data/train/*.tsv \
      --labels data/multimodal_labels.txt --query-labels user_data/query_labels.txt \
      --steps 1000 --batch-size 256 --out runs/b
"""

from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    choices=["imagebert_a", "imagebert_b", "imagebert_c", "lxmert",
                             "two_tower"])
    ap.add_argument("--train-tsv", nargs="+", default=None)
    ap.add_argument("--packed-dir", default=None,
                    help="packed-shard directory from scripts/build_packed.py "
                         "(memmapped multi-epoch passes; alternative to the "
                         "online --train-tsv sampler)")
    ap.add_argument("--labels", required=True)
    ap.add_argument("--query-labels", default=None,
                    help="query_labels.txt for hard-negative mining (required "
                         "for the cross-encoders; unused by two_tower, which "
                         "trains on in-batch negatives)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the recipe learning rate")
    ap.add_argument("--warmup-steps", type=int, default=None,
                    help="override the recipe warmup length")
    ap.add_argument("--optimizer", default=None,
                    choices=["bert_adamw", "adam_staircase"],
                    help="override the recipe optimizer (B/C default to the "
                         "reference's warmup-free staircase Adam, which "
                         "assumes a pretrained init; from-scratch runs want "
                         "bert_adamw's warmup)")
    ap.add_argument("--total-steps", type=int, default=None,
                    help="override the decay horizon of the bert_adamw "
                         "polynomial schedule (defaults to the recipe's "
                         "100k; short from-scratch runs should set it to "
                         "--steps)")
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host pod run: jax.distributed.initialize "
                         "(auto-detected on Cloud TPU or via JAX_COORDINATOR_"
                         "ADDRESS), per-host input shards, --batch-size is "
                         "the GLOBAL batch")
    ap.add_argument("--mlm-weight", type=float, default=0.0,
                    help="auxiliary MLM loss weight (ImageBERT-A pretraining)")
    ap.add_argument("--ms-weight", type=float, default=0.0,
                    help="Multi-Similarity loss weight (A's MS-loss fine-tune)")
    ap.add_argument("--resume", default=None,
                    help="orbax state directory (state_<N>) to resume from")
    ap.add_argument("--init-from", default=None,
                    help="params checkpoint of the same family at ANY depth "
                         "to initialise from: shallower checkpoints grow by "
                         "progressive stacking (each layer duplicated into a "
                         "contiguous run), deeper ones compress to evenly-"
                         "spaced layers; optimizer state starts fresh")
    ap.add_argument("--layers", type=int, default=None,
                    help="override the encoder depth (num_hidden_layers) -- "
                         "trains a shallow stage of a progressive-stacking "
                         "schedule or a depth-reduced variant directly; the "
                         "shape is recorded in <out>/student_config.json so "
                         "score.py can reload the checkpoint")
    ap.add_argument("--distill-from", default=None,
                    help="teacher checkpoint (any depth of the same family): "
                         "ONLINE distillation -- the teacher scores every "
                         "sampled batch on device and the student blends the "
                         "soft cross-entropy with the regular hard loss, so "
                         "the hard-negative sampler keeps mining fresh pair "
                         "structure for the student (the offline alternative, "
                         "scripts/distill.py --teacher-scores, sees only a "
                         "static transfer set)")
    ap.add_argument("--distill-weight", type=float, default=1.0,
                    help="soft-loss weight when --distill-from is set")
    ap.add_argument("--distill-temperature", type=float, default=2.0)
    ap.add_argument("--hard-loss-weight", type=float, default=0.5,
                    help="hard (family) loss weight when --distill-from is "
                         "set; 0 = pure-soft distillation")
    ap.add_argument("--am-loss", action="store_true",
                    help="LXMERT: train the cosine logit_W head (--taskAMSloss)")
    ap.add_argument("--grad-summaries", action="store_true",
                    help="log per-layer-group pre/post-clip grad norms "
                         "(the reference's clip_by_global_norm_summary, "
                         "run_pretraining_predict_score.py:234-258)")
    ap.add_argument("--word-match-weight", type=float, default=0.0,
                    help="B word-match aux loss weight (reference default: off)")
    ap.add_argument("--valid-tsv", nargs="+", default=None,
                    help="valid.tsv shards: enables the training-time nDCG@5 "
                         "loop + best-checkpoint selection (the reference's "
                         "finetune_valid workflow, train_normal.py:210-213)")
    ap.add_argument("--answers", default=None,
                    help="valid_answer.json for the valid loop")
    ap.add_argument("--valid-every", type=int, default=0,
                    help="steps between valid evals (0 = only at the end)")
    ap.add_argument("--valid-batch-size", type=int, default=None)
    args = ap.parse_args()
    if bool(args.valid_tsv) != bool(args.answers):
        ap.error("--valid-tsv and --answers must be given together")
    if args.resume and args.init_from:
        ap.error("--resume and --init-from are mutually exclusive: resume "
                 "restores the full optimizer state, init-from depth-maps "
                 "params only")
    if args.layers is not None and args.model == "lxmert":
        ap.error("--layers targets single-stream depth; lxmert's three "
                 "stack depths need scripts/distill.py --student-overrides")
    if bool(args.train_tsv) == bool(args.packed_dir):
        ap.error("exactly one of --train-tsv / --packed-dir is required")
    if args.distill_from and args.model == "two_tower":
        ap.error("--distill-from targets the cross-encoder scorers (the "
                 "two_tower embedders have no teacher probability to match)")
    if args.model == "two_tower" and args.packed_dir:
        ap.error("--packed-dir shards are pos/neg cross-encoder instances; "
                 "the label-blind in-batch InfoNCE would train hard negatives "
                 "as positives -- two_tower trains on positive rows from "
                 "--train-tsv")

    if args.distributed:
        # must run before backend init so jax sees the pod; force=True makes
        # the explicit flag initialize even without coordinator env vars
        # (Cloud TPU auto-detection) instead of silently staying single-host
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
            maybe_initialize,
        )

        maybe_initialize(force=True)

    import jax
    import numpy as np

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.utils import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu import VOCAB_PATH
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import save_pytree
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
        Featurizer,
        HardNegativeSampler,
        QueryLabelIndex,
        SamplerConfig,
        load_multimodal_labels,
        pad_batch,
        stack_examples,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.models import get_model
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.tokenization import (
        FullTokenizer,
    )
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import Trainer
    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.utils import log_metrics

    spec = get_model(
        args.model,
        overrides={"num_hidden_layers": args.layers} if args.layers else None,
    )
    tok = (
        FullTokenizer.hf_style(VOCAB_PATH)
        if args.model == "lxmert"
        else FullTokenizer.google_style(VOCAB_PATH)
    )
    featurizer = Featurizer(
        tok, load_multimodal_labels(args.labels), sen2forest=spec.sen2forest
    )
    if args.model == "two_tower" or args.packed_dir:
        # two_tower trains on aligned positive rows with in-batch negatives;
        # packed shards were mined/masked at build_packed time
        sampler = None
    else:
        if not args.query_labels:
            ap.error("--query-labels is required for cross-encoder training")
        qindex = QueryLabelIndex.load(args.query_labels)
        sampler_cfg = (
            SamplerConfig.imagebert_b(args.seed)
            if args.model in ("imagebert_b", "imagebert_c")
            else SamplerConfig.imagebert_a(args.seed)
        )
        sampler = HardNegativeSampler(featurizer, qindex, sampler_cfg)

    from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import recipe_for
    import dataclasses

    overrides = dict(
        mlm_loss_weight=args.mlm_weight,
        ms_loss_weight=args.ms_weight,
        am_loss=args.am_loss,
        word_match_loss_weight=args.word_match_weight,
        grad_summaries=args.grad_summaries,
    )
    if args.distill_from:
        overrides.update(
            distill_weight=args.distill_weight,
            distill_temperature=args.distill_temperature,
            hard_loss_weight=args.hard_loss_weight,
        )
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.warmup_steps is not None:
        overrides["num_warmup_steps"] = args.warmup_steps
    if args.optimizer is not None:
        overrides["optimizer"] = args.optimizer
    if args.total_steps is not None:
        overrides["num_train_steps"] = args.total_steps
    tc = dataclasses.replace(recipe_for(spec.name), **overrides)
    trainer = Trainer(spec, tc)
    state = trainer.init_state(jax.random.key(args.seed))
    if args.resume:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
            restore_pytree,
        )

        state = restore_pytree(args.resume, like=state)
        state = jax.device_put(state, trainer._replicated)  # re-shard onto the mesh
        print(f"resumed from {args.resume} at step {int(jax.device_get(state.step))}")
    elif args.init_from:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.checkpoint import (
            restore_pytree,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import (
            init_student_from_teacher,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train.ema import (
            ema_init,
        )

        # raw restore (no template): the checkpoint may be any depth of the
        # family; the depth mapping happens leaf-wise on the [L] axis
        loaded = restore_pytree(args.init_from)
        params = init_student_from_teacher(jax.device_get(state.params), loaded)
        params = jax.device_put(params, trainer._replicated)
        ema = ema_init(params) if tc.ema_decay else None
        state = state._replace(params=params, ema=ema)
        print(f"initialised from {args.init_from} (depth-mapped)")

    live_teacher = None
    if args.distill_from:
        from score import load_params  # sibling script, same checkpoint formats

        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.train import (
            LiveTeacher,
        )

        teacher_spec = get_model(args.model)
        live_teacher = LiveTeacher(
            teacher_spec,
            load_params(args.model, args.distill_from, teacher_spec),
            precision=trainer.precision,
        )
        print(f"online distillation from {args.distill_from} "
              f"(soft {args.distill_weight} / hard {args.hard_loss_weight}, "
              f"T={args.distill_temperature})")

    # multi-host: --batch-size is global; this process reads its slice of
    # the shard list (or a disjoint line stride when files < processes) and
    # contributes batch/process_count rows per step
    local_bs = args.batch_size
    train_files = args.train_tsv
    line_stride = False
    if jax.process_count() > 1:
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
            local_rows,
            process_shard,
        )

        local_bs = local_rows(args.batch_size)
        if train_files:
            train_files, line_stride = process_shard(train_files)

    def lines():
        raw = _file_lines(train_files)
        if line_stride:
            from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel.distributed import (
                stride_lines,
            )

            return stride_lines(raw)
        return raw

    def _file_lines(paths):
        for path in paths:
            with open(path, "r", encoding="utf-8") as f:
                yield from f

    def batches():
        if args.packed_dir:
            from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data import (
                PackedDataset,
            )

            ds = PackedDataset(args.packed_dir)
            print(f"packed dataset: {len(ds)} instances")
            yield from ds.batches(
                local_bs, epochs=None, seed=args.seed,
                process_id=jax.process_index(),
                process_count=jax.process_count(),
            )
            return
        while True:  # epochs
            n_yielded = 0
            if sampler is None:
                from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.pipeline import (
                    iter_batches,
                )

                for b in iter_batches(lines(), featurizer.imagebert_b, local_bs):
                    if b["valid"].all():  # drop the ragged tail: in-batch
                        n_yielded += 1  # negatives need full batches
                        # duplicate-query rows must not be trained as
                        # false negatives (contrastive_loss group mask)
                        b["query_group"] = b["query_id"].astype("int32")
                        yield b
            else:
                buf = []
                for example in sampler.examples(lines()):
                    buf.append(example)
                    if len(buf) == local_bs:
                        n_yielded += 1
                        yield pad_batch(stack_examples(buf), local_bs)
                        buf = []
            if n_yielded == 0:
                # otherwise the epoch loop would silently spin forever
                raise SystemExit(
                    f"no full {local_bs}-row batch from one pass over "
                    f"{train_files}: fewer usable rows than --batch-size"
                )

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.layers is not None:
        # same sidecar distill.py writes: score.py/export.py read it to
        # rebuild the non-default-depth spec on checkpoint reload
        import json

        (out_dir / "student_config.json").write_text(
            json.dumps({"model": args.model,
                        "overrides": {"num_hidden_layers": args.layers}})
        )
    metrics_file = open(out_dir / "metrics.jsonl", "a")

    # --- training-time valid loop (the reference steered its B fine-tune by
    # valid nDCG: the shipped checkpoint is finetune_valid.ckpt-251) ---------
    engine = None
    best_ndcg = -1.0

    def run_valid(step: int) -> None:
        nonlocal engine, best_ndcg
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.eval.ndcg import (
            evaluate_scores,
            load_answers,
        )
        from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.parallel import (
            ScoringEngine,
        )

        params = jax.device_get(trainer.eval_params(state))
        if engine is None:
            engine = ScoringEngine(
                spec, params, mesh=trainer.mesh, precision=trainer.precision,
                donate_batch=False,
            )
        else:
            engine.update_params(params)
        result = engine.score_files(
            args.valid_tsv, featurizer,
            batch_size=args.valid_batch_size or args.batch_size,
        )
        ndcg = evaluate_scores(result, load_answers(args.answers))
        log_metrics(step, {"valid_ndcg5": ndcg}, metrics_file)
        log_metrics(step, {"valid_ndcg5": ndcg})
        if ndcg > best_ndcg:
            best_ndcg = ndcg
            save_pytree(out_dir / "best", params)
            (out_dir / "best_metadata.json").write_text(
                __import__("json").dumps({"step": step, "valid_ndcg5": ndcg})
            )

    rngs = jax.random.split(jax.random.key(args.seed + 1), args.steps)
    for step, batch in enumerate(itertools.islice(batches(), args.steps)):
        # word-match fields feed the aux head only when enabled; masked_lm
        # fields feed the MLM loss when --mlm-weight is set
        if not args.word_match_weight:
            batch = {k: v for k, v in batch.items() if not k.startswith("word_match")}
        if not args.mlm_weight:
            batch = {k: v for k, v in batch.items() if not k.startswith("masked_lm")}
        if live_teacher is not None:
            batch = live_teacher.attach(batch)
        state, metrics = trainer.train_step(state, batch, rngs[step])
        if step % 20 == 0:
            log_metrics(step, metrics, metrics_file)
            log_metrics(step, metrics)
        if (step + 1) % args.checkpoint_every == 0 or step + 1 == args.steps:
            # eval weights (EMA shadows when enabled) + full resumable state
            save_pytree(out_dir / f"step_{step + 1}", trainer.eval_params(state))
            save_pytree(out_dir / f"state_{step + 1}", state)
        if args.valid_tsv and (
            (args.valid_every and (step + 1) % args.valid_every == 0)
            or step + 1 == args.steps
        ):
            run_valid(step + 1)
    if args.valid_tsv:
        print(f"best valid nDCG@5 {best_ndcg:.4f} (checkpoint in {out_dir / 'best'})")
    stats = sampler.stats if sampler is not None else "in-batch negatives"
    print(f"trained {args.steps} steps; sampler stats: {stats}")


if __name__ == "__main__":
    main()
