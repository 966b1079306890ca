#!/bin/bash
# Round-5 queue E: re-run of the fidelity chain after a VM restart wiped
# /tmp (teacher checkpoint + planted data from queue A were lost before
# the chained r5d online-distillation queue could run). One queue, start
# to finish:
#   1. regenerate planted data (same seeds as queue A -> same dataset)
#   2. retrain the 12L imagebert_b teacher (same recipe; queue A measured
#      planted-eval nDCG@5 0.90 with these seeds)
#   3. teacher scores the held-out eval set
#   4. v3 ONLINE distillation: scripts/train.py --distill-from -- the
#      live teacher scores every freshly mined hard-negative sampler
#      batch on device; soft CE blended with the hard loss (the fix for
#      the committed v1/v2 offline failure: no fresh pair structure)
#   5. student scores eval; score_fidelity vs teacher + planted truth
#   6. export the student as a pallas_packed artifact; artifact bench
# Discipline per ROADMAP "Known quirks": setsid-detached, probe-gated,
# per-step timeout, wall-clock deadline so the driver's end-of-round
# bench.py never meets a concurrent TPU claimer.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r5e.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
FID=${KMR_FID_WORK:-/tmp/r5_fidelity}
exec >>"$LOG" 2>&1

say() { echo "[r5e] $(date +%T) $*"; }

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
      say "giving up (tries=$tries)"; return 1
    fi
    sleep 300
  done
  say "tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  if past_deadline; then say "SKIP $name (deadline)"; return 1; fi
  wait_for_tunnel || return 1
  say "START $name: $*"
  timeout -k 60 "$tmo" "$@"
  local rc=$?
  say "END $name rc=$rc"
  return $rc
}

mkdir -p "$FID"
say "preparing planted data in $FID (cpu backend only; queue-A seeds)"
PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python - <<EOF
import json, sys
sys.path.insert(0, "/root/repo")
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS, SYNTHETIC_QUERIES, make_eval_tsv, make_tsv,
)
open("$FID/train.tsv", "w").write(
    "\n".join(make_tsv(4096, seed=31, n_queries=10, planted=6.0)) + "\n")
lines, answers = make_eval_tsv(2048, seed=47, planted=6.0, mismatch_rate=0.5)
open("$FID/eval.tsv", "w").write("\n".join(lines) + "\n")
json.dump(answers, open("$FID/answers.json", "w"))
open("$FID/labels.txt", "w").write(
    "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n")
open("$FID/query_labels.txt", "w").write(
    "\n".join(f"{300000+i}\t{q}\tdress,others"
              for i, q in enumerate(SYNTHETIC_QUERIES)) + "\n")
print("data ok:", len(lines) - 1, "eval rows,",
      sum(len(v) for v in answers.values()), "matching pairs")
EOF

step teacher_train 5400 python scripts/train.py --model imagebert_b \
  --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
  --query-labels "$FID/query_labels.txt" \
  --optimizer bert_adamw --total-steps 1500 \
  --steps 1500 --batch-size 256 --lr 1e-4 --warmup-steps 150 \
  --checkpoint-every 1500 --valid-every 500 --valid-tsv "$FID/eval.tsv" \
  --answers "$FID/answers.json" --out "$FID/teacher"

step teacher_score_eval 2400 python scripts/score.py --model imagebert_b \
  --tsv "$FID/eval.tsv" --labels "$FID/labels.txt" \
  --checkpoint "$FID/teacher/best" --answers "$FID/answers.json" \
  --out "$FID/teacher_eval.txt" --batch-size 1024 --precision bf16

step distill_online 7200 python scripts/train.py --model imagebert_b \
  --layers 4 --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
  --query-labels "$FID/query_labels.txt" \
  --init-from "$FID/teacher/best" --distill-from "$FID/teacher/best" \
  --optimizer bert_adamw --total-steps 1500 --steps 1500 \
  --batch-size 256 --lr 1e-4 --warmup-steps 60 --checkpoint-every 1500 \
  --valid-tsv "$FID/eval.tsv" --answers "$FID/answers.json" \
  --valid-every 300 --out "$FID/student3"

step student3_score_eval 2400 python scripts/score.py --model imagebert_b \
  --tsv "$FID/eval.tsv" --labels "$FID/labels.txt" \
  --checkpoint "$FID/student3/best" --answers "$FID/answers.json" \
  --out "$FID/student3_eval.txt" --batch-size 1024 --precision bf16

say "fidelity (cpu): student3 vs teacher on held-out planted eval"
PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu timeout -k 60 1200 \
  python scripts/score_fidelity.py \
  --reference "$FID/teacher_eval.txt" --candidate "$FID/student3_eval.txt" \
  --answers "$FID/answers.json"

step export_student3_packed 2400 python scripts/export.py --model imagebert_b \
  --checkpoint "$FID/student3/best" --batch-size 8192 --precision bf16 \
  --backend pallas_packed --out "$FID/student3_artifact_packed"

step artifact3_packed_bench 2400 \
  python scripts/perf_lab.py artifact "$FID/student3_artifact_packed"

say "ALL DONE r5e"
