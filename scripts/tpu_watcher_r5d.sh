#!/bin/bash
# Chain queue r5d (online-distillation fidelity v3) after the r5b/r5c
# watcher finishes. Monoclient discipline: wait for the PREVIOUS watcher
# process (passed by pid) to exit -- it owns the tunnel until then -- and
# only launch r5d once no other TPU claimer exists. Never kill anything:
# this watcher only waits.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_WATCH_LOG:-/tmp/watcher_r5d.log}
PREV_PID=${KMR_PREV_WATCHER_PID:?pass the r5b watcher pid}
DEADLINE=${KMR_QUEUE_DEADLINE:?pass the queue deadline epoch}
exec >>"$LOG" 2>&1

say() { echo "[watch-d] $(date +%T) $*"; }

say "waiting for watcher pid $PREV_PID to exit"
while kill -0 "$PREV_PID" 2>/dev/null; do
  sleep 60
done
say "previous watcher gone; launching r5d (deadline $(date -d @"$DEADLINE" +%T))"

KMR_QUEUE_LOG=/tmp/tpu_r5d.log KMR_QUEUE_DEADLINE="$DEADLINE" \
  bash scripts/tpu_campaign_r5d.sh
say "r5d rc=$?"
say "watcher done"
