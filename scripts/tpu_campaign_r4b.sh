#!/bin/bash
# Round-4 follow-up queue: whole-model int8 serving throughput (FFN-only
# and full modes) vs the bf16 baseline, plus B at its sublane-aligned
# batch. Run AFTER tpu_campaign_r4.sh finishes (one tunnel claimer).
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
    echo "[campaign-b] $(date +%T) tunnel wedged (attempt $tries); sleeping 300s"
    if [ "$tries" -ge 36 ]; then
      echo "[campaign-b] giving up after $tries probes"
      exit 1
    fi
    sleep 300
  done
  echo "[campaign-b] $(date +%T) tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_for_tunnel
  echo "[campaign-b] $(date +%T) START $name: $*"
  timeout -k 60 "$tmo" "$@"
  local rc=$?
  echo "[campaign-b] $(date +%T) END $name rc=$rc"
}

step model_bf16_a   1800 python scripts/perf_lab.py model imagebert_a 8192
step model_q8ffn_a  1800 python scripts/perf_lab.py model_q8 imagebert_a 8192 ffn
step model_q8full_a 1800 python scripts/perf_lab.py model_q8 imagebert_a 8192 full
step model_bf16_b   1800 python scripts/perf_lab.py model imagebert_b 8192
step model_q8ffn_b  1800 python scripts/perf_lab.py model_q8 imagebert_b 8192 ffn
echo "[campaign-b] $(date +%T) ALL DONE"
