#!/bin/bash
# Round-5 queue F: time-boxed re-run of the r5e fidelity chain for a
# late-round tunnel-wedge window. Same stages as tpu_campaign_r5e.sh
# (planted data -> 12L teacher -> teacher eval scores -> v3 ONLINE
# distillation -> student eval scores -> score_fidelity), with three
# changes for a tight wall-clock budget:
#   * probes retry every 60s (not 300s) so recovery is caught fast
#   * stages are individually skippable: a finished teacher checkpoint
#     (best_metadata.json present) is reused instead of retrained, and
#     KMR_SKIP_EXPORT=1 drops the artifact export+bench tail (the v2
#     packed-artifact bench is already committed in docs/BENCH.md)
#   * the chain aborts early if a required upstream output is missing,
#     instead of cascading doomed steps against the tunnel
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r5f.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
FID=${KMR_FID_WORK:-/tmp/r5_fidelity}
SKIP_EXPORT=${KMR_SKIP_EXPORT:-0}
# ROADMAP "Known quirks": probes fail for ~5-10 min after every TPU job
# teardown, and a probe killed at its timeout is itself a teardown -- an
# aggressive cadence can re-arm the wedge window forever. Default to the
# 300s spacing that has recovered reliably across rounds.
PROBE_SLEEP=${KMR_PROBE_SLEEP:-300}
exec >>"$LOG" 2>&1

say() { echo "[r5f] $(date +%T) $*"; }

probe() {
  timeout -k 30 120 python -c \
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
    say "tunnel wedged (attempt $tries); sleeping ${PROBE_SLEEP}s"
    if [ "$tries" -ge 60 ] || past_deadline; then
      say "giving up (tries=$tries)"; return 1
    fi
    sleep "$PROBE_SLEEP"
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

need() {  # abort the chain when an upstream artifact is missing
  if [ ! -e "$1" ]; then say "ABORT: missing $1 (upstream failed)"; exit 1; fi
}

mkdir -p "$FID"
if [ ! -s "$FID/train.tsv" ] || [ ! -s "$FID/eval.tsv" ]; then
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
else
  say "reusing planted data in $FID"
fi

if [ -s "$FID/teacher/best_metadata.json" ]; then
  say "reusing finished teacher checkpoint $FID/teacher/best"
else
  rm -rf "$FID/teacher"
  step teacher_train 4500 python scripts/train.py --model imagebert_b \
    --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
    --query-labels "$FID/query_labels.txt" \
    --optimizer bert_adamw --total-steps 1500 \
    --steps 1500 --batch-size 256 --lr 1e-4 --warmup-steps 150 \
    --checkpoint-every 1500 --valid-every 500 --valid-tsv "$FID/eval.tsv" \
    --answers "$FID/answers.json" --out "$FID/teacher"
fi
need "$FID/teacher/best_metadata.json"

if [ ! -s "$FID/teacher_eval.txt" ]; then
  step teacher_score_eval 1800 python scripts/score.py --model imagebert_b \
    --tsv "$FID/eval.tsv" --labels "$FID/labels.txt" \
    --checkpoint "$FID/teacher/best" --answers "$FID/answers.json" \
    --out "$FID/teacher_eval.txt" --batch-size 1024 --precision bf16
fi
need "$FID/teacher_eval.txt"

if [ ! -s "$FID/student3/best_metadata.json" ]; then
  step distill_online 5400 python scripts/train.py --model imagebert_b \
    --layers 4 --train-tsv "$FID/train.tsv" --labels "$FID/labels.txt" \
    --query-labels "$FID/query_labels.txt" \
    --init-from "$FID/teacher/best" --distill-from "$FID/teacher/best" \
    --optimizer bert_adamw --total-steps 1500 --steps 1500 \
    --batch-size 256 --lr 1e-4 --warmup-steps 60 --checkpoint-every 1500 \
    --valid-tsv "$FID/eval.tsv" --answers "$FID/answers.json" \
    --valid-every 300 --out "$FID/student3"
fi
need "$FID/student3/best_metadata.json"

step student3_score_eval 1800 python scripts/score.py --model imagebert_b \
  --tsv "$FID/eval.tsv" --labels "$FID/labels.txt" \
  --checkpoint "$FID/student3/best" --answers "$FID/answers.json" \
  --out "$FID/student3_eval.txt" --batch-size 1024 --precision bf16
need "$FID/student3_eval.txt"

say "fidelity (cpu): student3 vs teacher on held-out planted eval"
PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu timeout -k 60 1200 \
  python scripts/score_fidelity.py \
  --reference "$FID/teacher_eval.txt" --candidate "$FID/student3_eval.txt" \
  --answers "$FID/answers.json"

if [ "$SKIP_EXPORT" != "1" ]; then
  step export_student3_packed 2400 python scripts/export.py \
    --model imagebert_b \
    --checkpoint "$FID/student3/best" --batch-size 8192 --precision bf16 \
    --backend pallas_packed --out "$FID/student3_artifact_packed"

  step artifact3_packed_bench 2400 \
    python scripts/perf_lab.py artifact "$FID/student3_artifact_packed"
else
  say "SKIP export/artifact bench (KMR_SKIP_EXPORT=1)"
fi

say "ALL DONE r5f"
