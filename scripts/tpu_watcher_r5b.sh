#!/bin/bash
# Hand-over watcher for the round-5 TPU queues (monoclient discipline:
# exactly one TPU claimer at any time, never kill by pattern -- the live
# r5 queue's process-group id is passed in explicitly).
#
# The live tpu_campaign_r5.sh queue delivers everything the round still
# needs from it by the end of stage D (student AOT export + artifact
# bench); its remaining E/E2 headpack re-measures rank below the r5b
# follow-up distillation (VERDICT r4 item 1). So: wait for the r5 log to
# reach the "=== E:" marker (or the group to exit), kill the r5 group by
# pgid, take ONE clean idle-host input-pipeline measurement while no TPU
# claimer or probe can contend for the single core, then run r5b, then
# the r5c headpack queue with whatever deadline budget remains.
set -u
cd "$(dirname "$0")/.."
LOG=${KMR_WATCH_LOG:-/tmp/watcher_r5b.log}
R5_PGID=${KMR_R5_PGID:?pass the r5 queue pgid}
R5_LOG=${KMR_R5_LOG:-/tmp/tpu_r5.log}
DEADLINE=${KMR_QUEUE_DEADLINE:?pass the queue deadline epoch}
exec >>"$LOG" 2>&1

say() { echo "[watch] $(date +%T) $*"; }

say "watching pgid=$R5_PGID for '=== E:' marker or group exit"
while :; do
  grep -q '=== E:' "$R5_LOG" && { say "marker seen"; break; }
  grep -q 'ALL DONE r5' "$R5_LOG" && { say "r5 done"; break; }
  kill -0 -- -"$R5_PGID" 2>/dev/null || { say "r5 group gone"; break; }
  sleep 60
done

if kill -0 -- -"$R5_PGID" 2>/dev/null; then
  say "terminating r5 group $R5_PGID"
  kill -TERM -- -"$R5_PGID" 2>/dev/null
  sleep 20
  kill -KILL -- -"$R5_PGID" 2>/dev/null
  sleep 10
fi

say "idle-host input-pipeline bench (no TPU claimer running)"
PYTHONPATH= JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu timeout -k 60 2400 \
  python scripts/perf_lab.py host > /tmp/host_bench_r5_idle.log 2>&1
say "host bench rc=$?"

say "launching r5b (deadline $(date -d @"$DEADLINE" +%T))"
KMR_QUEUE_LOG=/tmp/tpu_r5b.log KMR_QUEUE_DEADLINE="$DEADLINE" \
  bash scripts/tpu_campaign_r5b.sh
say "r5b rc=$?"

if [ "$(date +%s)" -lt "$DEADLINE" ]; then
  say "launching r5c headpack queue"
  KMR_QUEUE_LOG=/tmp/tpu_r5c.log KMR_QUEUE_DEADLINE="$DEADLINE" \
    bash scripts/tpu_campaign_r5c.sh
  say "r5c rc=$?"
else
  say "no budget left for r5c"
fi

say "watcher done"
