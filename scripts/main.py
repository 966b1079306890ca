#!/usr/bin/env python
"""One-shot submission build: the reference ``code/main.py`` equivalent.

The reference's top-level entry runs the ImageBERT-A scorer as a subprocess
and fuses four (partly pre-committed) score files into
``prediction_result/submission.csv`` (``code/main.py:6-9,11-104``). Here the
same single command runs ALL FOUR scorers over the given TSV and fuses:

  python scripts/main.py --tsv testB.tsv --labels multimodal_labels.txt \
      --checkpoint-a a.npz --checkpoint-b b.npz --checkpoint-lxmert l.pth.npz \
      --workdir prediction_result --out prediction_result/submission.csv

ImageBERT-C is ImageBERT-B's checkpoint with the sen2forest query rewrite
(``evaluate_normal_sen2fs.py``), so it shares --checkpoint-b. Any checkpoint
may be omitted (random init -- smoke-test mode, matching the scorers'
behaviour). Scorers run as subprocesses (one compiled program each, like the
reference), with count integrity enforced via --expect-pairs when given.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCORERS = (
    ("imagebert_b", "testB_score_b.txt", "checkpoint_b"),
    ("imagebert_c", "testB_score_c.txt", "checkpoint_b"),
    ("imagebert_a", "testB_score_a.txt", "checkpoint_a"),
    ("lxmert", "testB_score_lxmert.csv", "checkpoint_lxmert"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", required=True, nargs="+")
    ap.add_argument("--labels", required=True)
    ap.add_argument("--checkpoint-a", default=None)
    ap.add_argument("--checkpoint-b", default=None)
    ap.add_argument("--checkpoint-lxmert", default=None)
    ap.add_argument("--workdir", default="prediction_result")
    ap.add_argument("--out", default=None,
                    help="submission csv (default <workdir>/submission.csv)")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--precision", choices=["f32", "bf16"], default="f32")
    ap.add_argument("--expect-pairs", type=int, default=None,
                    help="assert each scorer emitted exactly N pairs "
                         "(reference: 29,005 for testB)")
    ap.add_argument("--full-c", action="store_true",
                    help="score the full TSV for imagebert_c instead of the "
                         "delta pass (C == B except on rows containing 'sen "
                         "department of', load_data_v4.py:153-154; the delta "
                         "pass rescores only those rows and copies B's "
                         "scores for the rest -- bit-identical output, ~25%% "
                         "less device time)")
    ap.add_argument("--workers", type=int, default=0,
                    help="loader worker processes per scorer (passed through "
                         "to score.py; 0 = inline single-thread pipeline)")
    ap.add_argument("--answers", default=None,
                    help="valid_answer.json: also report ensemble nDCG@5")
    args = ap.parse_args()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    out = Path(args.out) if args.out else workdir / "submission.csv"

    import time

    t_start = time.perf_counter()
    breakdown = {}
    score_files = {}
    for model, fname, ckpt_attr in SCORERS:
        dest = workdir / fname
        cmd = [
            sys.executable, str(REPO / "scripts" / "score.py"),
            "--model", model,
            "--tsv", *args.tsv,
            "--labels", args.labels,
            "--out", str(dest),
            "--batch-size", str(args.batch_size),
            "--precision", args.precision,
        ]
        if args.workers:
            cmd += ["--workers", str(args.workers)]
        ckpt = getattr(args, ckpt_attr)
        if ckpt:
            cmd += ["--checkpoint", ckpt]
        if model == "imagebert_c" and not args.full_c:
            # C shares B's checkpoint and differs only via the sen2forest
            # rewrite -- rescore only rewritten rows, copy the rest from B
            cmd += ["--delta-from", str(score_files["imagebert_b"])]
        if args.expect_pairs is not None:
            cmd += ["--expect-pairs", str(args.expect_pairs)]
        print(f"[main] scoring {model} -> {dest}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        r = subprocess.run(cmd, text=True, capture_output=True)
        wall = time.perf_counter() - t0
        if r.returncode != 0:
            print(r.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"scorer {model} failed (rc={r.returncode})")
        report_line = r.stdout.strip().splitlines()[-1]
        print(report_line, flush=True)
        try:
            rep = json.loads(report_line)
        except ValueError:
            rep = {}
        # engine seconds = the overlapped host-pipeline + device window
        # inside score_files; wall - engine ~= process start + checkpoint
        # load + first compile. The rate is over pairs actually RUN on
        # device (the delta-C pass copies most of B's scores host-side)
        scored = rep.get("scored_pairs", rep.get("pairs"))
        engine_s = (
            scored / rep["pairs_per_second"]
            if rep.get("pairs_per_second")
            else None
        )
        breakdown[model] = {
            "wall_s": round(wall, 2),
            "engine_s": round(engine_s, 2) if engine_s else None,
            "pairs_per_second": rep.get("pairs_per_second"),
            "scored_pairs": scored,
        }
        score_files[model] = dest

    fuse = [
        sys.executable, str(REPO / "scripts" / "submission.py"),
        "--scores-b", str(score_files["imagebert_b"]),
        "--scores-c", str(score_files["imagebert_c"]),
        "--scores-a", str(score_files["imagebert_a"]),
        "--scores-lxmert", str(score_files["lxmert"]),
        "--out", str(out),
    ]
    if args.answers:
        fuse += ["--answers", args.answers]
    t0 = time.perf_counter()
    r = subprocess.run(fuse, text=True, capture_output=True)
    breakdown["fusion"] = {"wall_s": round(time.perf_counter() - t0, 2)}
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"fusion failed (rc={r.returncode})")
    if r.stdout.strip():
        print(r.stdout.strip(), flush=True)
    print(json.dumps({"submission": str(out),
                      "queries": sum(1 for _ in open(out)) - 1,
                      "total_wall_s": round(time.perf_counter() - t_start, 2),
                      "breakdown": breakdown}), flush=True)


if __name__ == "__main__":
    main()
