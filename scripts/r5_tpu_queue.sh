#!/bin/bash
# Round-5 TPU queue (successor to r3_tpu_queue.sh / r4_followup_queue.sh).
# Opening move each session:
#   nohup bash scripts/relay_watchdog.sh <epoch ~1 h before round end> \
#       >> /tmp/relay_watch.log 2>&1 &
# pointing the watchdog (or a manual launch) here:
#   QUEUE_HARD_DEADLINE=<epoch> bash scripts/r5_tpu_queue.sh [start-step]
#
# Steps (numbers match the logged [N] indices and [start-step];
# pip self-heal always runs first, unnumbered):
#   0  full bench — pre-warms every champion in the persistent compile
#      cache for the driver's capture AND verifies the headline live
#   1  consumer probe — confirm the relayout-aware candidate scoring
#      (d53e67c) recovers the 0.23x end-to-end ratio on hardware
#   2  reevaluate (proto3 re-time + retire) — tccg_02's stale 9124 GOp/s
#      pre-proto3 rows still lead its table (honest 5429 = 59.5%)
#   then: opportunistic small-ndof rotation until the deadline
#      (div10 FIRST — it measured 55.5% through its honest 4323 row on
#      2026-08-19 18:23, a 28% run-to-run drift; re-time it solo)
#
# ONE TPU process at a time; every step is its own process so a wedge
# loses one step.  fp64 work stays OFF this queue: dd is relay-rejected
# (CLAUDE.md r4 s4) and the chunked-XLA facts for all four bench classes
# are already archived.
set -u
cd /root/repo
LOG=/tmp/r5_queue.log
DEADLINE=${QUEUE_HARD_DEADLINE:?set QUEUE_HARD_DEADLINE (epoch secs)}
START=${1:-0}

if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "r5_queue: deadline already passed; refusing" | tee -a $LOG
    exit 2
fi

python -c "import feinsum_tpu" 2>/dev/null || \
    pip install -e . --no-deps --no-build-isolation >> $LOG 2>&1

wait_up() {
    local tries=0
    while true; do
        if [ "$(date +%s)" -ge $((DEADLINE - 300)) ]; then
            return 1
        fi
        if timeout 240 python -c "import jax; jax.devices()" \
                >/dev/null 2>&1; then
            return 0
        fi
        tries=$((tries+1))
        echo "    relay down (probe $tries); sleeping 420 s" | tee -a $LOG
        sleep 420
    done
}

STEP=-1
run() {
    STEP=$((STEP+1))
    local budget=$1; shift
    [ "$STEP" -lt "$START" ] && { echo "=== [$STEP] SKIP (start) $*"; return; }
    wait_up || { echo "=== [$STEP] SKIPPED (relay/deadline) $*" | tee -a $LOG;
                 return; }
    local remain=$((DEADLINE - $(date +%s)))
    if [ "$budget" -gt "$remain" ]; then
        echo "=== [$STEP] SKIPPED (deadline: need ${budget}s, have" \
            "${remain}s) $*" | tee -a $LOG
        return
    fi
    echo "=== [$STEP] $(date '+%T') $*" | tee -a $LOG
    timeout "$budget" "$@" >> $LOG 2>&1
    echo "=== [$STEP] rc=$? $(date '+%T')" | tee -a $LOG
}

# [0] bench (live line + champion pre-warm for the driver's capture)
run 3000 python bench.py

# [1] consumer probe (relayout-scoring confirmation, VERDICT r3 #7 close)
run 1500 python scripts/tpu_consumer_probe.py

# [2] proto3 reevaluate + retire (self-limits via QUEUE_DEADLINE)
QUEUE_DEADLINE=$DEADLINE run 6000 bash scripts/r3_reevaluate.sh

# leftover window: weakest headline rows (div10 first)
while [ $(($(date +%s) + 1600)) -lt "$DEADLINE" ]; do
    for cls in div10 div4 grad4 grad10 matvec face mass; do
        [ $(($(date +%s) + 1600)) -lt "$DEADLINE" ] || break
        if ! timeout 240 python -c "import jax; jax.devices()" \
                >/dev/null 2>&1; then
            echo "=== [opportunistic] relay down; stopping" | tee -a $LOG
            break 2
        fi
        echo "=== [opportunistic] $(date '+%T') $cls" | tee -a $LOG
        timeout 1400 python scripts/tune_small_ndof.py "$cls" 700 \
            >> $LOG 2>&1
        echo "=== [opportunistic] rc=$? $(date '+%T')" | tee -a $LOG
    done
done
echo "=== R5 QUEUE DONE $(date '+%T')" | tee -a $LOG
