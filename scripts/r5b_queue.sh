#!/bin/bash
# Round-5 follow-up queue: launched by hand AFTER the main r5 queue's
# numbered steps (bench / consumer probe / reevaluate) — kill the r5 queue
# bash BY PID between steps (in-flight children finish as orphans), wait
# for the orphans to exit, then:
#   QUEUE_HARD_DEADLINE=<epoch> bash scripts/r5b_queue.sh [start-step]
#
# Steps:
#   0  tc_pallas_v1 sweep on tccg_02 (blocked grids + MXU row axis +
#      mstack, c78ac97) — forecast ~9100 GOp/s vs the honest 5429
#   1  tc_pallas_v1 sweep on tccg_05
#   2  div10 solo re-time (28% drift row; variance-aware selection needs
#      re-confirmed copies)
#   3  grad4 retune   (VERDICT next #5: furthest under the north star)
#   4  grad10 retune
#   5  small-ndof stream-only ceiling probe (VERDICT #5 evidence)
#   6  dd fp64 single-point diagnostic (VERDICT next #4) — LAST because a
#      dd 500 historically sickened the compile-helper pool; runs the
#      compile in a child it never kills, rc=3 = hang -> STOP the queue
#      (an orphan may still hold the chip)
#   then: opportunistic rotation until the deadline
set -u
cd /root/repo
LOG=/tmp/r5b_queue.log
DEADLINE=${QUEUE_HARD_DEADLINE:?set QUEUE_HARD_DEADLINE (epoch secs)}
START=${1:-0}

if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "r5b_queue: deadline already passed; refusing" | tee -a $LOG
    exit 2
fi

(cd / && python -c "import feinsum_tpu") 2>/dev/null || \
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

run 1300 python scripts/tune_tc_v1.py 2 900
run 1300 python scripts/tune_tc_v1.py 5 900
run 1300 python scripts/tune_small_ndof.py div10 700
run 1600 python scripts/tune_small_ndof.py grad4 900
run 1600 python scripts/tune_small_ndof.py grad10 900
run 1800 python scripts/tpu_smallndof_ceiling.py grad4 grad10 div4

# [5] dd diag — self-deadlining, NEVER timeout-wrapped (GNU timeout
# forwards SIGTERM to the child python: the known mid-compile wedge-maker)
STEP=$((STEP+1))
if [ "$STEP" -ge "$START" ]; then
    if wait_up && [ $(($(date +%s) + 1100)) -lt "$DEADLINE" ]; then
        echo "=== [$STEP] $(date '+%T') dd diag" | tee -a $LOG
        python scripts/tpu_dd_diag.py 900 >> $LOG 2>&1
        rc=$?
        echo "=== [$STEP] rc=$rc $(date '+%T')" | tee -a $LOG
        if [ "$rc" -eq 3 ]; then
            echo "=== dd diag HUNG; stopping (orphan may hold the chip)" \
                | tee -a $LOG
            exit 3
        fi
    else
        echo "=== [$STEP] SKIPPED (relay/deadline) dd diag" | tee -a $LOG
    fi
fi

# leftover window: weakest headline rows.  Reserve 3300 s at the tail for
# the FINAL bench (champion pre-warm: tunes above may have installed new
# champions whose compiles would otherwise hit the driver's capture cold).
while [ $(($(date +%s) + 1600 + 3300)) -lt "$DEADLINE" ]; do
    for cls in div4 matvec grad4 grad10 div10 face mass; do
        [ $(($(date +%s) + 1600 + 3300)) -lt "$DEADLINE" ] || break
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

# FINAL bench: re-warm every (possibly new) champion in the persistent
# compile cache and leave a fresh live line in the stale-cache seed.
run 3100 python bench.py
echo "=== R5B QUEUE DONE $(date '+%T')" | tee -a $LOG
