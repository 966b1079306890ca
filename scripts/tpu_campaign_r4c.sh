#!/bin/bash
# Round-4 follow-up queue C. Two goals:
#  1. Warm-cache re-measures of the train-block sweep (campaign A's first
#     run per program paid the cold remote compile inside the wall-clock
#     budget) + per-kind isolation of the lxmert blk16 win
#     (KMR_TRAIN_BLOCK_ATTN vs _FFN, ops/pallas_train.py:_env_block).
#  2. The distilled-student serving ladder: scoring throughput at student
#     depths (scripts/distill.py), the measured route past the 50k
#     pairs/s/chip north star.
# Run AFTER tpu_campaign_r4b.sh exits (one tunnel claimer).
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
    echo "[campaign-c] $(date +%T) tunnel wedged (attempt $tries); sleeping 300s"
    if [ "$tries" -ge 36 ]; then
      echo "[campaign-c] giving up after $tries probes"
      exit 1
    fi
    sleep 300
  done
  echo "[campaign-c] $(date +%T) tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_for_tunnel
  echo "[campaign-c] $(date +%T) START $name: $*"
  timeout -k 60 "$tmo" "$@"
  local rc=$?
  echo "[campaign-c] $(date +%T) END $name rc=$rc"
}

S4='{"num_hidden_layers":4}'
S2='{"num_hidden_layers":2}'
S6='{"num_hidden_layers":6}'

# --- warm train-block re-measures -----------------------------------------
step train_a_warm     2400 python scripts/perf_lab.py train imagebert_a 1024
step train_a_blk4w    2400 env KMR_TRAIN_BLOCK=4 python scripts/perf_lab.py train imagebert_a 1024
step train_a_attn16   2400 env KMR_TRAIN_BLOCK_ATTN=16 python scripts/perf_lab.py train imagebert_a 1024
step train_l_warm     2400 python scripts/perf_lab.py train lxmert 1024
step train_l_attn16   2400 env KMR_TRAIN_BLOCK_ATTN=16 python scripts/perf_lab.py train lxmert 1024
step train_l_ffn16    2400 env KMR_TRAIN_BLOCK_FFN=16 python scripts/perf_lab.py train lxmert 1024
step train_l_blk16w   2400 env KMR_TRAIN_BLOCK=16 python scripts/perf_lab.py train lxmert 1024

# --- distilled-student serving ladder --------------------------------------
step student_b_l4     1800 env KMR_CONFIG_OVERRIDES="$S4" python scripts/perf_lab.py model imagebert_b 8192
step student_b_l2     1800 env KMR_CONFIG_OVERRIDES="$S2" python scripts/perf_lab.py model imagebert_b 8192
step student_b_l6     1800 env KMR_CONFIG_OVERRIDES="$S6" python scripts/perf_lab.py model imagebert_b 8192
step student_a_l4     1800 env KMR_CONFIG_OVERRIDES="$S4" python scripts/perf_lab.py model imagebert_a 8192
echo "[campaign-c] $(date +%T) ALL DONE"
