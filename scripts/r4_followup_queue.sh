#!/bin/bash
# Round-4 follow-up TPU queue: runs AFTER the main r3_tpu_queue exits
# (relay-down break or deadline), picking up work unlocked mid-round:
#   * tc_pallas_v0 on tccg_02/05 — the kernel_lowering K-promotion gives
#     these classes their first buildable points (tccg_02 re-timed at
#     59.5% under proto3, the weakest TCCG row);
#   * the FIXED consumer probe (f64 host oracle, VERDICT r3 #7);
#   * leftover window: opportunistic small-ndof rotation (same as the
#     main queue's tail).
# ONE TPU process at a time: refuses to start while QUEUE_PID is alive.
# Usage: QUEUE_PID=<pid> QUEUE_HARD_DEADLINE=<epoch> \
#            bash scripts/r4_followup_queue.sh
set -u
cd /root/repo
LOG=/tmp/r4_followup.log
DEADLINE=${QUEUE_HARD_DEADLINE:?set QUEUE_HARD_DEADLINE (epoch secs)}
QUEUE_PID=${QUEUE_PID:-0}

if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "r4_followup: deadline already passed; refusing" | tee -a $LOG
    exit 2
fi

# 1. wait (quietly) for the main queue to exit — NEVER attach to the TPU
#    while it runs (backend init alone can wedge the compile helpers:
#    observed again 2026-08-19 15:31, a concurrent tune_dd attach froze
#    the tuner's compiles for 20+ min)
while [ "$QUEUE_PID" -gt 0 ] && kill -0 "$QUEUE_PID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "r4_followup: deadline while waiting for queue" | tee -a $LOG
        exit 0
    fi
    sleep 60
done
# the queue's last timeout-wrapped child can outlive the bash driver
sleep 30
while pgrep -f "scripts/(tune_|r3_)" >/dev/null 2>&1; do
    echo "r4_followup: queue child still running; waiting" | tee -a $LOG
    sleep 60
done

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

run() {
    local budget=$1; shift
    wait_up || { echo "=== SKIPPED (relay/deadline) $*" | tee -a $LOG;
                 return; }
    local remain=$((DEADLINE - $(date +%s)))
    if [ "$budget" -gt "$remain" ]; then
        echo "=== SKIPPED (deadline: need ${budget}s, have ${remain}s) $*" \
            | tee -a $LOG
        return
    fi
    echo "=== $(date '+%T') $*" | tee -a $LOG
    timeout "$budget" "$@" >> $LOG 2>&1
    echo "=== rc=$? $(date '+%T')" | tee -a $LOG
}

# Budgets are sized to fit the ~27 min window left when the main queue
# runs to its natural end (opportunistic loop exits at deadline-1600):
# each step self-limits internally; the outer timeout is a never-on-a-
# healthy-run backstop.

# 2. tc_pallas on the K-promotion-unlocked classes (budget self-limits;
#    tccg_02 first — it re-timed at 59.5%, the weakest TCCG row)
run 1100 python scripts/tune_tc_pallas.py 700 2 5

# 3. consumer probe (fixed f64 oracle)
run 900 python scripts/tpu_consumer_probe.py

# 4. fp64 facts for the classes bench still can't show (face64) — MUST be
#    the last fresh-compile step before opportunistic cycles: the f64
#    compile sickens the helper pool for several minutes
run 1100 python scripts/r4_fp64_facts.py "$DEADLINE"

# 5. leftover window: keep tuning the weakest headline rows
while [ $(($(date +%s) + 1600)) -lt "$DEADLINE" ]; do
    for cls in div4 grad4 div10 grad10 matvec face mass; do
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
echo "=== FOLLOWUP DONE $(date '+%T')" | tee -a $LOG
