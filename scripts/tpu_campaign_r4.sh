#!/bin/bash
# Round-4 TPU measurement campaign. ONE tunnel claimer: probes until the
# axon tunnel recovers, then runs the queue sequentially with per-step
# timeouts, re-probing between steps (a timed-out step usually re-wedges
# the tunnel; see ROADMAP.md "Known quirks").
#
#   nohup bash scripts/tpu_campaign_r4.sh > /tmp/tpu_campaign.log 2>&1 &
#   echo $! > /tmp/tpu_campaign.pid
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
    echo "[campaign] $(date +%T) tunnel wedged (attempt $tries); sleeping 300s"
    if [ "$tries" -ge 72 ]; then  # ~6h: give up, leave evidence
      echo "[campaign] giving up after $tries probes"
      exit 1
    fi
    sleep 300
  done
  echo "[campaign] $(date +%T) tunnel UP"
}

step() {
  local name="$1" tmo="$2"; shift 2
  wait_for_tunnel
  echo "[campaign] $(date +%T) START $name: $*"
  timeout -k 60 "$tmo" "$@"
  local rc=$?  # capture BEFORE any command substitution resets $?
  echo "[campaign] $(date +%T) END $name rc=$rc"
}

# BENCH_MAX_ATTEMPTS=1: the campaign's own probe loop does the retrying;
# bench.py's full 10-attempt budget would outlive the step timeout and be
# SIGTERMed before it could print its error JSON
step bench          1800 env BENCH_MAX_ATTEMPTS=1 python bench.py
step int8_ffn_up    1500 python scripts/perf_lab.py int8 8192 768 3072
step int8_ffn_down  1500 python scripts/perf_lab.py int8 8192 3072 768
step ensemble       2400 env BENCH_BATCH=8192 python scripts/bench_all.py --ensemble
step train_a_base   2400 python scripts/perf_lab.py train imagebert_a 1024
for blk in 4 8 16; do
  step "train_a_blk$blk" 2400 env KMR_TRAIN_BLOCK=$blk python scripts/perf_lab.py train imagebert_a 1024
done
step train_l_base   2400 python scripts/perf_lab.py train lxmert 1024
for blk in 4 8 16; do
  step "train_l_blk$blk" 2400 env KMR_TRAIN_BLOCK=$blk python scripts/perf_lab.py train lxmert 1024
done
echo "[campaign] $(date +%T) ALL DONE"
