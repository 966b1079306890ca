#!/bin/bash
# Round-4 queue F: finish the train-block decision data that queue E's
# deadline cut off, and re-measure two anomalous queue-E readings:
#   * lxmert warm default measured 512.9 pairs/s (r3 default: 1,683; the
#     round-4 headpack re-measure: 2,051) while BLOCK=16 in the SAME
#     session gave a sane 1,930 -- re-measure default twice back-to-back.
#   * the 4-layer student trained at 1,699.5 pairs/s, SLOWER than the
#     12-layer teacher's 3,766 -- impossible if healthy; re-measure twice
#     plus a 12-layer warm sanity point from the same session.
# Then the deadline-skipped steps: lxmert attn/ffn isolation (the 16/16
# default decision) and imagebert_a warm re-measures.
# Same discipline as r4e: setsid-detached, probe-gated, per-step timeout,
# hard wall-clock deadline so the driver's end-of-round bench.py never
# meets a concurrent claimer.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r4f.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
exec >>"$LOG" 2>&1

say() { echo "[r4f] $(date +%T) $*"; }

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

# hold until any CPU test suite finishes (train numbers are host-sensitive)
waits=0
while [ -f /tmp/pytest_r4.running ] && [ "$waits" -lt 40 ]; do
  waits=$((waits + 1))
  say "waiting for pytest to finish ($waits)"
  sleep 60
done

S4='{"num_hidden_layers":4}'

# --- 1. anomaly re-measures --------------------------------------------------
step train_l_warm1  2400 python scripts/perf_lab.py train lxmert 1024
step train_l_warm2  2400 python scripts/perf_lab.py train lxmert 1024
step train_b_warm   2400 python scripts/perf_lab.py train imagebert_b 1024
step student_tr4a   2400 env KMR_CONFIG_OVERRIDES="$S4" python scripts/perf_lab.py train imagebert_b 1024
step student_tr4b   2400 env KMR_CONFIG_OVERRIDES="$S4" python scripts/perf_lab.py train imagebert_b 1024

# --- 2. lxmert train-block isolation (16/16 default decision) ---------------
step train_l_blk16  2400 env KMR_TRAIN_BLOCK=16 python scripts/perf_lab.py train lxmert 1024
step train_l_attn16 2400 env KMR_TRAIN_BLOCK_ATTN=16 python scripts/perf_lab.py train lxmert 1024
step train_l_ffn16  2400 env KMR_TRAIN_BLOCK_FFN=16 python scripts/perf_lab.py train lxmert 1024

# --- 3. imagebert_a warm re-measures -----------------------------------------
step train_a_warm   2400 python scripts/perf_lab.py train imagebert_a 1024
step train_a_blk4   2400 env KMR_TRAIN_BLOCK=4 python scripts/perf_lab.py train imagebert_a 1024
step train_a_attn16 2400 env KMR_TRAIN_BLOCK_ATTN=16 python scripts/perf_lab.py train imagebert_a 1024

say "ALL DONE"
