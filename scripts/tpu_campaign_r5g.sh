#!/bin/bash
# Round-5 queue G2: the B-train headpack variant re-measure lost to the
# VM restart (queue r5c's tail never ran; its /tmp log was wiped). The
# round-4 decision table (docs/BENCH.md "B's headpack variants") rests on
# same-session ADJACENT runs; ROADMAP's own discipline demands >=2
# SEPARATED runs per cell because this tunnel sporadically returns
# 2-4x-slow train readings. Two rounds, reversed order, each cell
# separated from its sibling by the other variants' device work.
# Launch ONLY after the r5f fidelity chain is done (monoclient).
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_QUEUE_LOG:-/tmp/tpu_r5g2.log}
DEADLINE=${KMR_QUEUE_DEADLINE:-0}
PROBE_SLEEP=${KMR_PROBE_SLEEP:-300}
exec >>"$LOG" 2>&1

say() { echo "[r5g2] $(date +%T) $*"; }

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
    if [ "$tries" -ge 40 ] || past_deadline; then
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

say "=== headpack round 1 (loop -> mixed -> packed) ==="
step hp_loop_1 3600 env KMR_TRAIN_HEADPACK=0 python scripts/perf_lab.py train imagebert_b 1024
step hp_mixed_1 3600 env KMR_TRAIN_HEADPACK=mixed python scripts/perf_lab.py train imagebert_b 1024
step hp_packed_1 3600 python scripts/perf_lab.py train imagebert_b 1024

say "=== headpack round 2 (packed -> mixed -> loop) ==="
step hp_packed_2 3600 python scripts/perf_lab.py train imagebert_b 1024
step hp_mixed_2 3600 env KMR_TRAIN_HEADPACK=mixed python scripts/perf_lab.py train imagebert_b 1024
step hp_loop_2 3600 env KMR_TRAIN_HEADPACK=0 python scripts/perf_lab.py train imagebert_b 1024

say "ALL DONE r5g2"
