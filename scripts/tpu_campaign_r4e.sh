#!/bin/bash
# Round-4 queue E: everything still unmeasured after the VM reboot + session
# kill ate queue C mid-step (tpu_resume.log ends at train_a_blk4w; the two
# resume-run train numbers it did take were polluted by a concurrent pytest
# and are discarded).  Order = value under a deadline:
#   1. distilled-student serving ladder (the measured route past the 50k
#      north star; BENCH.md's int8 section points at it)
#   2. queue D's model-scale distillation demo (teacher -> student -> score)
#   3. lxmert train-block confirm (blk16 default decision) + per-kind split
#   4. imagebert_a warm train re-measures
# Launch detached (setsid) so a session restart cannot kill a TPU job
# mid-run and wedge the tunnel again.  DEADLINE: no step starts after
# KMR_QUEUE_DEADLINE (epoch s; default 05:45 UTC today) so the driver's
# end-of-round bench.py never meets a concurrent claimer.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r4e.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
exec >>"$LOG" 2>&1

say() { echo "[r4e] $(date +%T) $*"; }

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
      say "giving up (tries=$tries, deadline hit=$(past_deadline && echo yes || echo no))"
      exit 1
    fi
    sleep 300
  done
  say "tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  if past_deadline; then say "SKIP $name (deadline)"; return; fi
  wait_for_tunnel
  say "START $name: $*"
  timeout -k 60 "$tmo" "$@"
  say "END $name rc=$?"
}

# hold until the CPU test suite finishes (train numbers are host-sensitive);
# bounded in case the marker is orphaned by a session kill
waits=0
while [ -f /tmp/pytest_r4.running ] && [ "$waits" -lt 40 ]; do
  waits=$((waits + 1))
  say "waiting for pytest to finish ($waits)"
  sleep 60
done

S2='{"num_hidden_layers":2}'
S4='{"num_hidden_layers":4}'
S6='{"num_hidden_layers":6}'

# --- 1. distilled-student serving ladder -----------------------------------
step student_b_l4   2400 env KMR_CONFIG_OVERRIDES="$S4" python scripts/perf_lab.py model imagebert_b 8192
step student_b_l2   2400 env KMR_CONFIG_OVERRIDES="$S2" python scripts/perf_lab.py model imagebert_b 8192
step student_b_l6   2400 env KMR_CONFIG_OVERRIDES="$S6" python scripts/perf_lab.py model imagebert_b 8192
step student_a_l4   2400 env KMR_CONFIG_OVERRIDES="$S4" python scripts/perf_lab.py model imagebert_a 8192

# --- 2. model-scale distillation demo (queue D) ----------------------------
WORK=/tmp/distill_model_scale
mkdir -p "$WORK"
say "preparing synthetic data in $WORK (cpu backend only)"
PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python - <<EOF
import sys
sys.path.insert(0, "/root/repo")
from kddcup_2020_multimodalitiesrecall_2nd_place_tpu.data.synthetic import (
    SYNTHETIC_LABELS, make_tsv,
)
open("$WORK/pairs.tsv", "w").write("\n".join(make_tsv(2048, seed=17, n_queries=256)) + "\n")
open("$WORK/labels.txt", "w").write(
    "\n".join(f"{k}\t{v}" for k, v in SYNTHETIC_LABELS.items()) + "\n")
print("data ok")
EOF

step teacher_score 2400 python scripts/score.py --model imagebert_b \
  --tsv "$WORK/pairs.tsv" --labels "$WORK/labels.txt" \
  --out "$WORK/teacher.txt" --batch-size 1024 --precision bf16
step distill 3000 python scripts/distill.py --model imagebert_b \
  --student-layers 4 --tsv "$WORK/pairs.tsv" --labels "$WORK/labels.txt" \
  --teacher-scores "$WORK/teacher.txt" --steps 120 --batch-size 256 \
  --lr 3e-4 --warmup-steps 0 --checkpoint-every 0 --out "$WORK/student"
step student_score 2400 python scripts/score.py --model imagebert_b \
  --tsv "$WORK/pairs.tsv" --labels "$WORK/labels.txt" \
  --checkpoint "$WORK/student/student_final" \
  --out "$WORK/student.txt" --batch-size 1024 --precision bf16
step student_train 2400 env KMR_CONFIG_OVERRIDES="$S4" \
  python scripts/perf_lab.py train imagebert_b 1024

# --- 3. lxmert train-block decision ----------------------------------------
step train_l_warm   2400 python scripts/perf_lab.py train lxmert 1024
step train_l_blk16w 2400 env KMR_TRAIN_BLOCK=16 python scripts/perf_lab.py train lxmert 1024
step train_l_attn16 2400 env KMR_TRAIN_BLOCK_ATTN=16 python scripts/perf_lab.py train lxmert 1024
step train_l_ffn16  2400 env KMR_TRAIN_BLOCK_FFN=16 python scripts/perf_lab.py train lxmert 1024

# --- 4. imagebert_a warm re-measures ---------------------------------------
step train_a_warm   2400 python scripts/perf_lab.py train imagebert_a 1024
step train_a_blk4w  2400 env KMR_TRAIN_BLOCK=4 python scripts/perf_lab.py train imagebert_a 1024
step train_a_attn16 2400 env KMR_TRAIN_BLOCK_ATTN=16 python scripts/perf_lab.py train imagebert_a 1024

say "ALL DONE"
