#!/bin/bash
# Round-5 headpack re-measure queue (VERDICT r4 item 7): the B-train
# headpack variant decision (loop vs mixed vs packed) was committed on
# same-session adjacent runs in round 4; this queue re-measures each
# variant in up to two separated rounds (different order, after unrelated
# device work: the r5/r5b queues that ran before it) so the decision is
# backed by the >=2-separated-runs discipline (ROADMAP "Known quirks").
# Runs AFTER tpu_campaign_r5b.sh via scripts/tpu_watcher_r5b.sh -- same
# monoclient discipline, never two TPU claimers at once.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r5c.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
exec >>"$LOG" 2>&1

say() { echo "[r5c] $(date +%T) $*"; }

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

# VERDICT r4 item 8 follow-up: the r5/r5b artifact benches exported with
# the default portable XLA backend and measured ~26.4k pairs/s -- the
# fused-kernel 53.4k number needs the pallas_packed backend baked into
# the artifact (scripts/export.py --backend pallas_packed, a same-fleet
# deployment mode; serving/export.py module docstring). Export + bench
# the packed artifact so the "north star survives AOT" claim is measured
# with the right backend.
FID=${KMR_FID_WORK:-/tmp/r5_fidelity}
STUDENT="$FID/student2/best"
[ -d "$STUDENT" ] || STUDENT="$FID/student/best"
if [ -d "$STUDENT" ]; then
  say "=== packed student artifact (checkpoint: $STUDENT) ==="
  step export_student_packed 2400 python scripts/export.py \
    --model imagebert_b --checkpoint "$STUDENT" --batch-size 8192 \
    --precision bf16 --backend pallas_packed \
    --out "$FID/student_artifact_packed"
  step artifact_packed_bench 2400 \
    python scripts/perf_lab.py artifact "$FID/student_artifact_packed"
else
  say "no student checkpoint found; skipping packed artifact steps"
fi

say "=== headpack round 1 ==="
step hp_loop_1 3600 env KMR_TRAIN_HEADPACK=0 python scripts/perf_lab.py train imagebert_b 1024
step hp_mixed_1 3600 env KMR_TRAIN_HEADPACK=mixed python scripts/perf_lab.py train imagebert_b 1024
step hp_packed_1 3600 python scripts/perf_lab.py train imagebert_b 1024

say "=== headpack round 2 (reversed order) ==="
step hp_packed_2 3600 python scripts/perf_lab.py train imagebert_b 1024
step hp_mixed_2 3600 env KMR_TRAIN_HEADPACK=mixed python scripts/perf_lab.py train imagebert_b 1024
step hp_loop_2 3600 env KMR_TRAIN_HEADPACK=0 python scripts/perf_lab.py train imagebert_b 1024

say "ALL DONE r5c"
