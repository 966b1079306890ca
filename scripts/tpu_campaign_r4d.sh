#!/bin/bash
# Round-4 follow-up queue D: the distillation path exercised at MODEL
# SCALE on the real chip (scripts/score.py -> scripts/distill.py ->
# scripts/score.py on the student), plus student TRAIN throughput.
# Run AFTER tpu_campaign_r4c.sh exits (one tunnel claimer).
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout -k 30 150 python -c \
    "import numpy as np, jax; x=jax.device_put(np.arange(8.)); print('probe-ok', float(x.sum()))" \
    2>/dev/null | grep -q probe-ok
}

wait_for_tunnel() {
  local tries=0
  until probe; do
    tries=$((tries + 1))
    echo "[campaign-d] $(date +%T) tunnel wedged (attempt $tries); sleeping 300s"
    if [ "$tries" -ge 36 ]; then
      echo "[campaign-d] giving up after $tries probes"
      exit 1
    fi
    sleep 300
  done
  echo "[campaign-d] $(date +%T) tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_for_tunnel
  echo "[campaign-d] $(date +%T) START $name: $*"
  timeout -k 60 "$tmo" "$@"
  local rc=$?
  echo "[campaign-d] $(date +%T) END $name rc=$rc"
}

S4='{"num_hidden_layers":4}'
WORK=/tmp/distill_model_scale
mkdir -p "$WORK"

# data prep is CPU-only; force the cpu backend so it never claims the tunnel
echo "[campaign-d] $(date +%T) preparing synthetic data in $WORK"
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

# 1. full-depth B teacher (random init -- the ranking-transfer mechanics
#    don't care) scores the pairs on the chip
step teacher_score 2400 python scripts/score.py --model imagebert_b \
  --tsv "$WORK/pairs.tsv" --labels "$WORK/labels.txt" \
  --out "$WORK/teacher.txt" --batch-size 1024 --precision bf16

# 2. distil a 4-layer student against those scores, on the chip
step distill 3000 python scripts/distill.py --model imagebert_b \
  --student-layers 4 --tsv "$WORK/pairs.tsv" --labels "$WORK/labels.txt" \
  --teacher-scores "$WORK/teacher.txt" --steps 120 --batch-size 256 \
  --lr 3e-4 --warmup-steps 0 --checkpoint-every 0 --out "$WORK/student"

# 3. the student scores the same pairs through the standard CLI
#    (student_config.json auto-pickup at full scale)
step student_score 2400 python scripts/score.py --model imagebert_b \
  --tsv "$WORK/pairs.tsv" --labels "$WORK/labels.txt" \
  --checkpoint "$WORK/student/student_final" \
  --out "$WORK/student.txt" --batch-size 1024 --precision bf16

# 4. student TRAIN throughput at depth 4 (the distillation run rate)
step student_train 2400 env KMR_CONFIG_OVERRIDES="$S4" \
  python scripts/perf_lab.py train imagebert_b 1024
echo "[campaign-d] $(date +%T) ALL DONE"
