#!/bin/bash
# Round-5 TPU queue: closes the four VERDICT-r4 items that need the real
# chip, in priority order:
#   A. queue G finish -- trained-teacher model-scale distillation fidelity
#      (delegates to tpu_campaign_r4g.sh: 12L imagebert_b teacher trained
#      on planted-signal rows, 4L student distilled from its offline
#      scores, fidelity = tau/topk/nDCG vs planted truth)
#   B. progressive-stacking basin escape at 12x768: from-scratch control
#      under the reference B staircase recipe (pins at the 0.693 basin)
#      vs 6-layer stage grown 6->12 with --init-from under the SAME
#      staircase recipe (loss + planted-eval nDCG@5 traces in metrics.jsonl)
#   C. end-to-end submission build on-chip: scripts/main.py over a
#      29,005-row synthetic testB (all four scorers, delta-C default,
#      fusion) with the wall-clock breakdown JSON
#   D. student AOT artifact: export the queue-A student, reload, bench
#      (perf_lab.py artifact) -- does >=50k survive the jax.export path?
#   E. B-train headpack re-measure: loop/mixed/packed x2 SEPARATED rounds
#      (the r4 adjacent-run basis the verdict flagged)
# Discipline per ROADMAP "Known quirks": setsid-detached, probe-gated,
# per-step timeout, wall-clock deadline so the driver's end-of-round
# bench.py never meets a concurrent TPU claimer.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r5.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
FID=${KMR_FID_WORK:-/tmp/r5_fidelity}
STACK=${KMR_STACK_WORK:-/tmp/r5_stack}
E2E=${KMR_E2E_WORK:-/tmp/r5_e2e}
exec >>"$LOG" 2>&1

say() { echo "[r5] $(date +%T) $*"; }

probe() {
  timeout -k 30 150 python -c \
    "import numpy as np, jax; x=jax.device_put(np.arange(8.)); print('probe-ok', float(x.sum()))" \
    2>/dev/null | grep -q probe-ok
}

past_deadline() {
  [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]
}

wait_for_tunnel() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    say "tunnel wedged (attempt $tries); sleeping 300s"
    if [ "$tries" -ge 40 ] || past_deadline; then
      say "giving up (tries=$tries)"; exit 1
    fi
    sleep 300
  done
  say "tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  if past_deadline; then say "SKIP $name (deadline)"; return 1; fi
  wait_for_tunnel
  say "START $name: $*"
  timeout -k 60 "$tmo" "$@"
  local rc=$?
  say "END $name rc=$rc"
  return $rc
}

# --------------------------------------------------------------- A: queue G
say "=== A: trained-teacher distillation fidelity (queue G) ==="
KMR_QUEUE_LOG="$LOG" KMR_QUEUE_DEADLINE="$DEADLINE" KMR_WORK="$FID" \
  bash scripts/tpu_campaign_r4g.sh

# ------------------------------------------------- B: progressive stacking
say "=== B: progressive-stacking basin escape at 12x768 ==="
mkdir -p "$STACK"
# same planted data as queue A (already generated there); reuse it
for f in train.tsv eval.tsv answers.json labels.txt query_labels.txt; do
  [ -f "$FID/$f" ] || { say "missing $FID/$f -- queue A data prep failed"; }
done

# control: 12x768 from scratch under B's default staircase recipe
# (reference train_normal.py:133-137 semantics) -- expected pinned at the
# trivial ln(2)=0.693 basin, valid nDCG ~= chance
step stack_control 3600 python scripts/train.py --model imagebert_b \
  --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
  --query-labels "$FID/query_labels.txt" \
  --steps 400 --batch-size 256 \
  --valid-tsv "$FID/eval.tsv" --answers "$FID/answers.json" \
  --valid-every 200 --checkpoint-every 400 --out "$STACK/control12"

# stage 1: 6-layer trains from scratch (bert_adamw warmup recipe -- any
# working shallow checkpoint serves as the stacking seed)
step stack_shallow 3600 python scripts/train.py --model imagebert_b \
  --layers 6 \
  --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
  --query-labels "$FID/query_labels.txt" \
  --optimizer bert_adamw --total-steps 600 --steps 600 --batch-size 256 \
  --lr 1e-4 --warmup-steps 60 --checkpoint-every 600 \
  --valid-tsv "$FID/eval.tsv" --answers "$FID/answers.json" \
  --valid-every 300 --out "$STACK/shallow6"

# stage 2: grow 6->12 by progressive stacking, then train under the SAME
# staircase recipe that pins from scratch -- the escape being demonstrated
step stack_grow 3600 python scripts/train.py --model imagebert_b \
  --init-from "$STACK/shallow6/step_600" \
  --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
  --query-labels "$FID/query_labels.txt" \
  --steps 400 --batch-size 256 \
  --valid-tsv "$FID/eval.tsv" --answers "$FID/answers.json" \
  --valid-every 100 --checkpoint-every 400 --out "$STACK/grown12"

say "stacking traces:"
for run in control12 shallow6 grown12; do
  say "--- $STACK/$run/metrics.jsonl"
  [ -f "$STACK/$run/metrics.jsonl" ] && tail -40 "$STACK/$run/metrics.jsonl"
done

# ------------------------------------------------------- C: end-to-end run
say "=== C: end-to-end submission build (29,005-row synthetic testB) ==="
mkdir -p "$E2E"
if [ ! -f "$E2E/testB.tsv" ]; then
  say "generating 29,005-row synthetic testB (host only)"
  PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu timeout -k 60 3600 python - <<EOF
import sys
sys.path.insert(0, "/root/repo")
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS, make_tsv,
)
lines = make_tsv(29005, seed=5, n_queries=500, planted=6.0)
open("$E2E/testB.tsv", "w").write("\n".join(lines) + "\n")
open("$E2E/labels.txt", "w").write(
    "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n")
print("testB ok:", len(lines) - 1, "rows")
EOF
fi
# B/C run the trained teacher checkpoint from queue A; A and LXMERT run
# random-init (smoke mode -- no trained ckpts exist for those families on
# synthetic data; the timing is checkpoint-independent)
step e2e_main 7200 python scripts/main.py \
  --tsv "$E2E/testB.tsv" --labels "$E2E/labels.txt" \
  --checkpoint-b "$FID/teacher/best" \
  --workdir "$E2E/prediction_result" --batch-size 4096 --precision bf16 \
  --expect-pairs 29005

# --------------------------------------------- D: student AOT artifact bench
say "=== D: student AOT export + reload bench ==="
if [ -d "$FID/student/best" ]; then
  step export_student 2400 python scripts/export.py --model imagebert_b \
    --checkpoint "$FID/student/best" --batch-size 8192 --precision bf16 \
    --out "$FID/student_artifact"
  step artifact_bench_1 2400 python scripts/perf_lab.py artifact "$FID/student_artifact"
else
  say "SKIP export (no $FID/student/best)"
fi

# ------------------------------------------ E: headpack re-measure, round 1
say "=== E: B-train headpack variants, round 1 ==="
step hp_loop_1 3600 env KMR_TRAIN_HEADPACK=0 python scripts/perf_lab.py train imagebert_b 1024
step hp_mixed_1 3600 env KMR_TRAIN_HEADPACK=mixed python scripts/perf_lab.py train imagebert_b 1024
step hp_packed_1 3600 python scripts/perf_lab.py train imagebert_b 1024

# separated second rounds (different order, after unrelated device work)
say "=== D2/E2: separated second measurements ==="
if [ -d "$FID/student_artifact" ]; then
  step artifact_bench_2 1200 python scripts/perf_lab.py artifact "$FID/student_artifact"
fi
step hp_packed_2 3600 python scripts/perf_lab.py train imagebert_b 1024
step hp_loop_2 3600 env KMR_TRAIN_HEADPACK=0 python scripts/perf_lab.py train imagebert_b 1024
step hp_mixed_2 3600 env KMR_TRAIN_HEADPACK=mixed python scripts/perf_lab.py train imagebert_b 1024

say "ALL DONE r5"
