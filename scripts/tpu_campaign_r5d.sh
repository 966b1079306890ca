#!/bin/bash
# Round-5 queue D: ONLINE distillation fidelity (v3 of queue G).
#
# v1 (600 steps, 4k-row transfer set) converged on the transfer set but
# reached only 0.38 planted-eval nDCG@5 vs the teacher's 0.90; v2 (8x
# transfer set, 4x steps) improves slowly (0.30 @ step 600) -- the
# offline flow fundamentally lacks the hard-negative sampler's fresh
# pair structure. v3 uses the NEW scripts/train.py --distill-from flow:
# the live teacher scores every freshly mined sampler batch on device
# and the 4-layer student blends the softened CE with the regular hard
# loss -- the same data regime the teacher itself trained under.
#
# Chained after the r5b/r5c watcher exits (monoclient: one TPU claimer).
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r5d.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
FID=${KMR_FID_WORK:-/tmp/r5_fidelity}
exec >>"$LOG" 2>&1

say() { echo "[r5d] $(date +%T) $*"; }

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

for f in teacher/best teacher_eval.txt train.tsv eval.tsv answers.json \
         labels.txt query_labels.txt; do
  [ -e "$FID/$f" ] || { say "missing $FID/$f -- queue A artifacts gone; abort"; exit 1; }
done

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

say "idle-host loader bench (post-shm transfer; no TPU claimer contention)"
PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu timeout -k 60 2400 \
  python scripts/perf_lab.py host > /tmp/host_bench_r5_shm.log 2>&1
say "host bench rc=$?"

say "ALL DONE r5d"
